import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.walk import make_fused_walk
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.particles import Particles

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
depth = max(6, int(np.ceil(np.log2(N ** (1/3)))) + 3)
cfg = SimulationConfig(time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(0.1,)*6, max_size_timestep=0.01, periodic=False, box_size=1000.0,
    n_gravs=2, type_to_grav=(0,1,0,0,0,0), wiring='newton_yukawa')
rng = np.random.default_rng(0)
nclump = max(1, N // 2048)
centers = rng.uniform(0, 1000.0, (nclump, 3)); k = rng.integers(0, nclump, N)
pos = np.mod(centers[k] + rng.normal(0, 20.0, (N,3)), 1000.0).astype(np.float32)
ptype = rng.integers(1, 3, N).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos), np.full(N,1.0/N,np.float32),
                     np.arange(N), ptype, cfg.type_to_grav)
wiring = build_wiring(cfg)
fsoft = jnp.full((N,),0.1,jnp.float32); aold = jnp.full((N,),1e-3,jnp.float32)
tree = build_tree(p.pos,p.mass,p.grav,fsoft,aold,jnp.zeros_like(p.mass),
                  depth=depth,n_gravs=2,bucket=32)
jax.block_until_ready(tree.node_mass)
tgt = jnp.arange(N, dtype=jnp.int32)
walk = make_fused_walk(wiring, n_gravs=2, depth=depth, bucket=32,
    group_size=64, batch_blocks=128, ent_cap=2048, chunk_cap=2048,
    frontier_cap=4096, ec=512, theta=0.5, opening='bh')
f = jax.jit(lambda tr, tg: jnp.sum(walk(tr, tg).acc))
v = float(f(tree, tgt)); print('walk warm, sum', v, flush=True)
REP = 10
t0 = time.time()
for _ in range(REP):
    v = f(tree, tgt)
v = float(v)
dt = (time.time()-t0)/REP
print(f"walk: {dt*1e3:.2f} ms/pass -> {N/dt:.4g} part/s", flush=True)
# calibration: direct kernel on a 12k subset
M = 12000
fd = jax.jit(lambda: jnp.sum(direct_forces(wiring, p.pos[:M], p.mass[:M],
                                           p.grav[:M], fsoft[:M], chunk=2048)[0]))
float(fd())
t0 = time.time()
for _ in range(5): v2 = fd()
v2 = float(v2)
dtd = (time.time()-t0)/5
print(f"direct {M}: {dtd*1e3:.2f} ms -> {M*M/dtd:.3g} pairs/s", flush=True)
# dispatch floor
g = jax.jit(lambda x: x + 1.0)
x0 = jnp.zeros(())
float(g(x0))
t0 = time.time()
for _ in range(20): y = g(x0)
float(y)
print(f"dispatch floor: {(time.time()-t0)/20*1e3:.3f} ms", flush=True)

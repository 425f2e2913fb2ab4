import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
N = int(sys.argv[1]); depth = int(sys.argv[2])
print('start', N, depth, flush=True)
from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.walk import make_fused_walk
from ngravs_tpu.particles import Particles
cfg = SimulationConfig(time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(0.1,)*6, max_size_timestep=0.01, periodic=False, box_size=1000.0,
    n_gravs=2, type_to_grav=(0,1,0,0,0,0), wiring='newton_yukawa')
rng = np.random.default_rng(7)
nclump = max(1, N // 2048)
centers = rng.uniform(0,1000.0,(nclump,3)); k = rng.integers(0,nclump,N)
pos = np.mod(centers[k]+rng.normal(0,20.0,(N,3)),1000.0).astype(np.float32)
ptype = rng.integers(1,3,N).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos), np.full(N,1.0/N,np.float32), np.arange(N), ptype, cfg.type_to_grav)
wiring = build_wiring(cfg)
fsoft = jnp.full((N,),0.1,jnp.float32); aold = jnp.full((N,),1e-3,jnp.float32)
print('ic done', flush=True)
t0=time.time()
tree = build_tree(p.pos,p.mass,p.grav,fsoft,aold,jnp.zeros_like(p.mass),depth=depth,n_gravs=2,bucket=32)
jax.block_until_ready(tree.node_mass)
print('tree', time.time()-t0, flush=True)
walk = make_fused_walk(wiring, n_gravs=2, depth=depth, bucket=32, group_size=64,
    batch_blocks=128, ent_cap=2048, chunk_cap=2048, frontier_cap=4096, ec=512,
    theta=0.5, opening='bh')
tgt = jnp.arange(N, dtype=jnp.int32)
f = jax.jit(lambda tr,tg: walk(tr,tg))
t0=time.time(); lowered = f.lower(tree, tgt); print('lower', time.time()-t0, flush=True)
t0=time.time(); comp = lowered.compile(); print('compile', time.time()-t0, flush=True)
t0=time.time(); res = comp(tree, tgt); jax.block_until_ready(res.acc); print('run1', time.time()-t0, flush=True)
t0=time.time();
for _ in range(3): res = comp(tree, tgt)
jax.block_until_ready(res.acc); print('run', (time.time()-t0)/3, flush=True)
nia = float(jnp.sum(res.ninteract.astype(jnp.float64)))
print('ovf', bool(res.overflow), int(res.max_ent), int(res.max_chunk), list(np.asarray(res.max_frontier)), 'rows/t', nia/N, flush=True)

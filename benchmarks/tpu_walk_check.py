"""Accuracy check of the fused walk's Pallas path on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.walk import make_fused_walk
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.particles import Particles

N, depth = 12000, 8
cfg = SimulationConfig(time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(0.1,)*6, max_size_timestep=0.01, periodic=False, box_size=1000.0,
    n_gravs=2, type_to_grav=(0,1,0,0,0,0), wiring='newton_yukawa')
rng = np.random.default_rng(7)
centers = rng.uniform(0,1000.0,(5,3)); k = rng.integers(0,5,N)
pos = np.mod(centers[k]+rng.normal(0,20.0,(N,3)),1000.0).astype(np.float32)
ptype = rng.integers(1,3,N).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos), np.full(N,1.0/N,np.float32),
                     np.arange(N), ptype, cfg.type_to_grav)
wiring = build_wiring(cfg)
fsoft = jnp.full((N,),0.1,jnp.float32); aold = jnp.full((N,),1e-3,jnp.float32)
tree = build_tree(p.pos,p.mass,p.grav,fsoft,aold,jnp.zeros_like(p.mass),
                  depth=depth,n_gravs=2,bucket=32)
tgt = jnp.arange(N, dtype=jnp.int32)
acc_d,_ = direct_forces(wiring,p.pos,p.mass,p.grav,fsoft,chunk=2048)
acc_d = np.asarray(acc_d)
for pal in (True, False):
    walk = make_fused_walk(wiring, n_gravs=2, depth=depth, bucket=32,
        group_size=64, batch_blocks=128, ent_cap=2048, chunk_cap=2048,
        frontier_cap=4096, ec=512, theta=0.5, opening='bh', use_pallas=pal)
    res = jax.jit(lambda tr,tg: walk(tr,tg))(tree,tgt)
    acc_w = np.zeros((N,3),np.float32)
    acc_w[np.asarray(tree.order)] = np.asarray(res.acc)
    err = (np.linalg.norm(acc_w-acc_d,axis=1)
           / np.maximum(np.linalg.norm(acc_d,axis=1),1e-12))
    print(f"pallas={pal} ovf={bool(res.overflow)} "
          f"rms={float(np.sqrt((err**2).mean())):.3e} max={float(err.max()):.3e}",
          flush=True)

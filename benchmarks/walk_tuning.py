"""Sweep fused-walk (group_size, subgroups, depth) at a given N on the
real chip: pass time + rows/target.  Feeds the rows-per-target reduction
work (VERDICT r3 item 2; per-target opening is forcetree.c:1437-1473).

Usage: python benchmarks/walk_tuning.py N G S [depth] [bucket]
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.particles import Particles
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.solver import GravitySolver
from ngravs_tpu.ops.walk import make_fused_walk

N = int(sys.argv[1]); G = int(sys.argv[2]); S = int(sys.argv[3])
DEPTH = int(sys.argv[4]) if len(sys.argv) > 4 else 8
BUCKET = int(sys.argv[5]) if len(sys.argv) > 5 else 32
box = 100_000.0
soft = box / N ** (1 / 3) / 25
cfg = SimulationConfig(
    time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(soft,) * 6, max_size_timestep=0.01,
    periodic=True, box_size=box, n_gravs=3,
    type_to_grav=(0, 0, 1, 2, 0, 0), wiring="three_species",
    pmgrid=128, tree_depth=DEPTH, tree_bucket_size=BUCKET,
    walk_group_size=G, walk_chunk_cap=1024, walk_frontier_cap=2048)
rng = np.random.default_rng(7)
pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
for k in range(1, 4):
    amp = 0.02 * box / k
    ph = rng.uniform(0, 2 * np.pi, 3)
    pos += amp * np.sin(2*np.pi*k*pos[:, [2, 0, 1]]/box + ph).astype(np.float32)
pos = np.mod(pos, box).astype(np.float32)
ptype = rng.choice([1, 2, 3], N, p=[0.6, 0.3, 0.1]).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos), np.full(N, 1.0/N, np.float32),
                     np.arange(N), ptype, cfg.type_to_grav)
wiring = build_wiring(cfg)
solver = GravitySolver(cfg, wiring, np.array(cfg.softening, np.float32)*2.8,
                       np.array(cfg.softening, np.float32), 1.0)
solver.depth = DEPTH; solver.clamp_caps(N)
fsoft = jnp.asarray(np.array(cfg.softening, np.float32)*2.8)[p.ptype]
aold = jnp.full((N,), 1e-3, jnp.float32)
tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold, jnp.zeros_like(p.mass),
                  depth=DEPTH, n_gravs=3, bucket=BUCKET, box_size=box,
                  group_size=G)
tree.node_mass.block_until_ready()
solver._measure_octets(tree, N)
tgt = jnp.arange(N, dtype=jnp.int32)
for attempt in range(8):
    walk = make_fused_walk(
        wiring, n_gravs=3, depth=DEPTH, bucket=BUCKET, group_size=G,
        batch_blocks=cfg.walk_batch_blocks, chunk_cap=solver.fcaps["chunk"],
        frontier_cap=solver.fcaps["frontier"], ec=cfg.walk_ec,
        theta=cfg.err_tol_theta, opening="bh", box_size=box,
        treepm=solver.treepm, want_pot=False, subgroups=S,
        octet_caps=solver.octet_caps)
    wj = jax.jit(lambda tr, tg: walk(tr, tg))
    res = wj(tree, tgt)
    ovf, me, mc, mr = (int(x) for x in jax.device_get(
        (res.overflow, res.max_ent, res.max_chunk, res.max_rows)))
    mf = jax.device_get(res.max_frontier)
    if not ovf:
        break
    solver._measure_octets(tree, N)
    solver.grow_caps(me, mc, mr, mf)
res.acc.block_until_ready()
t0 = time.time()
for _ in range(3):
    res = wj(tree, tgt)
res.acc.block_until_ready()
dt = (time.time() - t0) / 3
nia = float(jnp.sum(res.ninteract.astype(jnp.float32)))
print(json.dumps({"n": N, "G": G, "S": S, "depth": DEPTH, "bucket": BUCKET,
                  "pass_s": round(dt, 3), "part_per_s": round(N/dt, 0),
                  "rows_per_target": round(nia/N, 1)}), flush=True)

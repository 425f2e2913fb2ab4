"""Stage-resolved throughput probe for the fused Barnes-Hut walk.

Times one force pass at a given N on the current JAX backend, optionally
limiting the walk to its first stages (traverse / +flatten / +eval) to
localize bottlenecks — the TPU analog of the reference's timings.txt
part/sec line (gravtree.c:443-444).

Usage:
    python benchmarks/walk_probe.py N [xla|pallas] [stage(1|2|3)] [treepm]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
USE_PALLAS = (sys.argv[2] != "xla") if len(sys.argv) > 2 else None
STAGE = int(sys.argv[3]) if len(sys.argv) > 3 else 3
TREEPM = len(sys.argv) > 4 and sys.argv[4] == "treepm"

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.particles import Particles
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.walk import make_fused_walk
from ngravs_tpu.ops.solver import GravitySolver

box = 1000.0
depth = max(6, int(np.ceil(np.log2(N ** (1 / 3)))) + 3)
BB = int(os.environ.get("WALK_BB", 128))
GG = int(os.environ.get("WALK_G", 64))
cfg = SimulationConfig(
    time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(box / N ** (1 / 3) / 30,) * 6, max_size_timestep=0.01,
    periodic=TREEPM, box_size=box, n_gravs=2,
    type_to_grav=(0, 1, 0, 0, 0, 0), wiring="newton_yukawa",
    pmgrid=128 if TREEPM else 0,
    walk_batch_blocks=BB, walk_group_size=GG,
    tree_depth=depth, tree_bucket_size=32)
rng = np.random.default_rng(0)
nclump = max(1, N // 2048)
centers = rng.uniform(0, box, (nclump, 3))
k = rng.integers(0, nclump, N)
pos = np.mod(centers[k] + rng.normal(0, 0.02 * box, (N, 3)),
             box).astype(np.float32)
ptype = rng.integers(1, 3, N).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos),
                     np.full(N, 1.0 / N, np.float32),
                     np.arange(N), ptype, cfg.type_to_grav)
wiring = build_wiring(cfg)
solver = GravitySolver(cfg, wiring, np.ones(6, np.float32) * 0.1,
                       np.ones(6, np.float32) * 0.1, 1.0)
solver.depth = depth
solver.clamp_caps(N)
print("caps:", solver.fcaps, "depth:", depth, flush=True)

fsoft = jnp.full((N,), 0.1, jnp.float32)
aold = jnp.full((N,), 1e-3, jnp.float32)
tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                  jnp.zeros_like(p.mass), depth=depth,
                  n_gravs=2, bucket=32,
                  box_size=box if TREEPM else 0.0)
jax.block_until_ready(tree.node_mass)
print("tree built", flush=True)

treepm = solver.treepm if TREEPM else None

tightened = False
for attempt in range(8):
    walk_raw = make_fused_walk(
        wiring, n_gravs=2, depth=depth, bucket=32,
        group_size=cfg.walk_group_size, batch_blocks=cfg.walk_batch_blocks,
        chunk_cap=solver.fcaps["chunk"],
        frontier_cap=solver.fcaps["frontier"], ec=cfg.walk_ec,
        theta=0.5, opening="bh", use_pallas=USE_PALLAS,
        box_size=box if TREEPM else 0.0, treepm=treepm,
        want_pot=bool(int(os.environ.get("WALK_POT", "0"))),
        subgroups=int(os.environ.get("WALK_S", "4")),
        stage_limit=STAGE)
    walk = jax.jit(lambda tr, tg: walk_raw(tr, tg))
    NT = int(os.environ.get("NT_LIMIT", N))
    tgt = jnp.arange(NT, dtype=jnp.int32)
    t0 = time.time()
    res = walk(tree, tgt)
    ovf, me, mc, mr = (int(x) for x in jax.device_get(
        (res.overflow, res.max_ent, res.max_chunk, res.max_rows)))
    mf = jax.device_get(res.max_frontier)
    print(f"attempt {attempt}: ovf={ovf} ent={me} chunk={mc} evchunks={mr} "
          f"frontier={list(int(x) for x in mf)} "
          f"wall={time.time()-t0:.1f}s", flush=True)
    if not ovf:
        if not tightened:
            tightened = True
            if solver.tighten_caps(me, mc, mf, mr):
                print("  tightened:", solver.fcaps, flush=True)
                continue
        break
    solver.grow_caps(me, mc, mr, mf)
    print("  regrown:", solver.fcaps, flush=True)

# NB: jax.block_until_ready is a no-op on the tunneled axon backend —
# force a host transfer to actually synchronize.
float(jnp.sum(res.acc))
t0 = time.time()
for _ in range(3):
    res = walk(tree, tgt)
float(jnp.sum(res.acc))
dt = (time.time() - t0) / 3
nia = float(jnp.sum(res.ninteract.astype(jnp.float32)))
print(f"N={N} NT={NT} pallas={USE_PALLAS} stage={STAGE} treepm={TREEPM}: "
      f"{dt*1e3:.1f} ms/pass -> {NT/dt:.3g} part/s; "
      f"rows/target={nia/max(NT,1):.0f}", flush=True)

"""Walk probe on the real GalaxyCollision.IC distribution.

The synthetic clump probe (walk_probe.py) understates list sizes: the
reference workload's galaxy disk is far denser.  This drives the fused
walk directly on the shipped IC with controllable depth/group/batch.

Usage:
    python benchmarks/galaxy_probe.py [depth] [stage] [B] [G]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 12
STAGE = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BB = int(sys.argv[3]) if len(sys.argv) > 3 else 128
GG = int(sys.argv[4]) if len(sys.argv) > 4 else 64

from ngravs_tpu import read_parameter_file, Particles
from ngravs_tpu.io.gadget_format import read_snapshot
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.solver import GravitySolver
from ngravs_tpu.constants import SOFTFAC_SPLINE
from ngravs_tpu.units import set_units

cfg = read_parameter_file("/root/reference/Configuration.reference",
                          wiring="newton")
cfg = cfg.replace(tree_depth=DEPTH, walk_batch_blocks=BB,
                  walk_group_size=GG)
snap = read_snapshot("/root/reference/GalaxyCollision.IC")
p = Particles.create(snap.pos, snap.vel, snap.mass, snap.pid, snap.ptype,
                     cfg.type_to_grav)
N = p.n
w = build_wiring(cfg)
units = set_units(cfg)
fsoft_t = np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE
solver = GravitySolver(cfg, w, fsoft_t, np.array(cfg.softening, np.float32),
                       units.G)
solver.depth = DEPTH
solver.clamp_caps(N)

fsoft = jnp.asarray(fsoft_t)[p.ptype]
aold = jnp.full((N,), 1e-3, jnp.float32)
tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                  jnp.zeros_like(p.mass), depth=DEPTH, n_gravs=cfg.n_gravs,
                  bucket=cfg.tree_bucket_size, group_size=GG)
nblk = int(tree.n_blocks)
fat = int(jnp.max(jnp.where(tree.node_terminal, tree.node_pcount, 0)))
print(f"tree built: depth={DEPTH} blocks={nblk} fat-leaf={fat}", flush=True)

from ngravs_tpu.ops.walk import make_fused_walk

tgt = jnp.arange(N, dtype=jnp.int32)
tightened = False
for attempt in range(8):
    walk_raw = make_fused_walk(
        w, n_gravs=cfg.n_gravs, depth=DEPTH, bucket=cfg.tree_bucket_size,
        group_size=GG, batch_blocks=BB,
        chunk_cap=solver.fcaps["chunk"],
        frontier_cap=solver.fcaps["frontier"], ec=cfg.walk_ec,
        theta=0.5, opening="bh", stage_limit=STAGE)
    walk = jax.jit(lambda tr, tg: walk_raw(tr, tg))
    t0 = time.time()
    res = walk(tree, tgt)
    ovf, me, mc, mr = (int(x) for x in jax.device_get(
        (res.overflow, res.max_ent, res.max_chunk, res.max_rows)))
    mf = jax.device_get(res.max_frontier)
    print(f"attempt {attempt}: ovf={ovf} leafrec={me} chunk={mc} mono={mr} "
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

float(jnp.sum(res.acc))
t0 = time.time()
for _ in range(3):
    res = walk(tree, tgt)
float(jnp.sum(res.acc))
dt = (time.time() - t0) / 3
nia = float(jnp.sum(res.ninteract.astype(jnp.float32)))
print(f"GalaxyCollision N={N} depth={DEPTH} B={BB} G={GG} stage={STAGE}: "
      f"{dt*1e3:.1f} ms/pass -> {N/dt:.3g} part/s; "
      f"rows/target={nia/N:.0f}", flush=True)

if STAGE == 0:
    # stage sweep at the SAME (tightened) caps
    for st in (1, 2, 3):
        wr = make_fused_walk(
            w, n_gravs=cfg.n_gravs, depth=DEPTH,
            bucket=cfg.tree_bucket_size,
            group_size=GG, batch_blocks=BB,
            chunk_cap=solver.fcaps["chunk"],
            frontier_cap=solver.fcaps["frontier"], ec=cfg.walk_ec,
            theta=0.5, opening="bh", stage_limit=st)
        wj = jax.jit(lambda tr, tg: wr(tr, tg))
        r = wj(tree, tgt)
        float(jnp.sum(r.acc))
        t0 = time.time()
        for _ in range(3):
            r = wj(tree, tgt)
        float(jnp.sum(r.acc))
        print(f"  stage {st}: {(time.time()-t0)/3*1e3:.1f} ms/pass",
              flush=True)

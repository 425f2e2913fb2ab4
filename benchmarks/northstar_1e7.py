"""North-star workload: 1e7-particle multi-species TreePM on one chip.

BASELINE config 5 at its own problem size (BASELINE.md): periodic box,
PMGRID>=256, N_GRAVS=3 (Newton / Yukawa / Coulomb+Yukawa diagonal with
Yukawa cross terms — wire_three_species), 10^7 particles.  Times the
production pieces on the real TPU and prints a JSON summary for
benchmarks/SCALE_r04.json:

  * octree build (forcetree.c:61 analog)
  * fused short-range TreePM walk force pass (forcetree.c:1623)
  * PM long-range pass, N_GRAVS^2 convolution rounds (pm_periodic.c:204)
  * a fused KDK step (drift + refresh + walk + kick) amortized

Usage: python benchmarks/northstar_1e7.py [N] [PMGRID] [depth]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
PMGRID = int(sys.argv[2]) if len(sys.argv) > 2 else 256
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 9

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.particles import Particles
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.tree import build_tree
from ngravs_tpu.ops.solver import GravitySolver
from ngravs_tpu.ops.walk import make_fused_walk

box = 100_000.0  # kpc/h-scale cosmological box (internal units)
soft = box / N ** (1 / 3) / 25
cfg = SimulationConfig(
    time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
    softening=(soft,) * 6, max_size_timestep=0.01,
    periodic=True, box_size=box, n_gravs=3,
    type_to_grav=(0, 0, 1, 2, 0, 0), wiring="three_species",
    pmgrid=PMGRID, tree_depth=DEPTH, tree_bucket_size=32,
    walk_chunk_cap=1024, walk_frontier_cap=2048)

rng = np.random.default_rng(7)
# mildly clustered cosmological proxy: uniform lattice-free positions
# plus a long-wavelength displacement field (a cheap Zel'dovich stand-in)
pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
for k in range(1, 4):
    amp = 0.02 * box / k
    phase = rng.uniform(0, 2 * np.pi, 3)
    pos += amp * np.sin(2 * np.pi * k * pos[:, [2, 0, 1]] / box
                        + phase).astype(np.float32)
pos = np.mod(pos, box).astype(np.float32)
ptype = rng.choice([1, 2, 3], N, p=[0.6, 0.3, 0.1]).astype(np.int32)
p = Particles.create(pos, np.zeros_like(pos),
                     np.full(N, 1.0 / N, np.float32),
                     np.arange(N), ptype, cfg.type_to_grav)
del pos

wiring = build_wiring(cfg)
solver = GravitySolver(cfg, wiring,
                       np.array(cfg.softening, np.float32) * 2.8,
                       np.array(cfg.softening, np.float32), 1.0)
solver.depth = DEPTH
solver.clamp_caps(N)
out = {"n": N, "pmgrid": PMGRID, "depth": DEPTH, "n_gravs": 3,
       "wiring": "three_species", "box": box,
       "device": str(jax.devices()[0])}

def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))

# ---- tree build ----------------------------------------------------------
fsoft = jnp.asarray(np.array(cfg.softening, np.float32) * 2.8)[p.ptype]
aold = jnp.full((N,), 1e-3, jnp.float32)

def build():
    return build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                      jnp.zeros_like(p.mass), depth=DEPTH, n_gravs=3,
                      bucket=32, box_size=box,
                      group_size=cfg.walk_group_size)

tree = build()
sync(tree.node_mass)
t0 = time.time()
tree = build()
sync(tree.node_mass)
out["tree_build_s"] = round(time.time() - t0, 3)
# measured per-level octet caps: the static bound's mono region is ~10x
# the real occupancy at this depth (GB-scale walk tables at 1e7)
solver._measure_octets(tree, N)
out["octet_caps"] = list(solver.octet_caps)
fat = int(jnp.max(jnp.where(tree.node_terminal, tree.node_pcount, 0)))
out["fat_leaf"] = fat
print("tree built:", out["tree_build_s"], "s, fat leaf:", fat, flush=True)

# ---- PM long-range pass (N_GRAVS^2 = 9 convolution rounds) ---------------
t0 = time.time()
acc_pm = solver.pm_forces(p)
sync(acc_pm)
out["pm_compile_s"] = round(time.time() - t0, 1)
t0 = time.time()
for _ in range(3):
    acc_pm = solver.pm_forces(p)
sync(acc_pm)
out["pm_pass_s"] = round((time.time() - t0) / 3, 3)
print("PM pass:", out["pm_pass_s"], "s", flush=True)

# ---- fused short-range walk ---------------------------------------------
tgt = jnp.arange(N, dtype=jnp.int32)
for attempt in range(8):
    walk = make_fused_walk(
        wiring, n_gravs=3, depth=DEPTH, bucket=32,
        group_size=cfg.walk_group_size, batch_blocks=cfg.walk_batch_blocks,
        chunk_cap=solver.fcaps["chunk"],
        frontier_cap=solver.fcaps["frontier"], ec=cfg.walk_ec,
        theta=cfg.err_tol_theta, opening="bh", box_size=box,
        treepm=solver.treepm, want_pot=False,
        octet_caps=solver.octet_caps)
    wj = jax.jit(lambda tr, tg: walk(tr, tg))
    t0 = time.time()
    res = wj(tree, tgt)
    ovf, me, mc, mr = (int(x) for x in jax.device_get(
        (res.overflow, res.max_ent, res.max_chunk, res.max_rows)))
    mf = jax.device_get(res.max_frontier)
    print(f"attempt {attempt}: ovf={ovf} rec={me} chunk={mc} mono={mr} "
          f"frontier={[int(x) for x in mf]} wall={time.time()-t0:.0f}s",
          flush=True)
    if not ovf:
        break
    solver.grow_caps(me, mc, mr, mf)
sync(res.acc)
t0 = time.time()
for _ in range(3):
    res = wj(tree, tgt)
sync(res.acc)
dt = (time.time() - t0) / 3
nia = float(jnp.sum(res.ninteract.astype(jnp.float64)
                    if jax.config.jax_enable_x64
                    else res.ninteract.astype(jnp.float32)))
out["walk_pass_s"] = round(dt, 3)
out["walk_part_per_s"] = round(N / dt, 0)
out["rows_per_target"] = round(nia / N, 1)
print(f"short-range walk: {dt:.2f} s/pass -> {N/dt:.3g} part/s, "
      f"rows/target {nia/N:.0f}", flush=True)

# ---- fused KDK step (drift + table drift + walk + kick analog) ----------
wt = walk.pack_tables(tree)

@jax.jit
def kdk_step(p, tree, wt):
    dd = jnp.float32(1e-4)
    p = p.replace(pos=jnp.mod(p.pos + p.vel * dd, box))
    from ngravs_tpu.ops.tree import drift_tree
    tree = drift_tree(tree, dd)
    wt2 = walk.drift_tables(wt, dd)
    res = wj(tree, jnp.arange(N, dtype=jnp.int32))
    sel = jnp.minimum(jnp.maximum(tree.order, 0), N - 1)
    acc = res.acc
    p = p.replace(vel=p.vel.at[tree.order].add(acc * dd, mode="drop"))
    return p, tree, wt2

p2, tree2, wt2 = kdk_step(p, tree, wt)
sync(p2.vel)
t0 = time.time()
p2, tree2, wt2 = kdk_step(p2, tree2, wt2)
sync(p2.vel)
out["kdk_full_step_s"] = round(time.time() - t0, 3)
out["part_steps_per_s_full_step"] = round(N / out["kdk_full_step_s"], 0)

# ---- memory -------------------------------------------------------------
try:
    ms = jax.local_devices()[0].memory_stats()
    out["hbm_peak_bytes"] = int(ms.get("peak_bytes_in_use", 0))
    out["hbm_peak_gb"] = round(out["hbm_peak_bytes"] / 2**30, 2)
except Exception:
    pass

print(json.dumps(out, indent=1), flush=True)

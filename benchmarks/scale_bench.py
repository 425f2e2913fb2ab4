"""Scale benchmark: tree / TreePM force throughput at 10^5-10^7 particles.

Measures the production paths end-to-end (build + walk [+ PM] + kick) and
prints one JSON line per configuration:

    python benchmarks/scale_bench.py --n 1000000 --mode tree
    python benchmarks/scale_bench.py --n 1000000 --mode treepm --pmgrid 256
    python benchmarks/scale_bench.py --n 1000000 --mode sharded --devices 8

Baseline framing (BASELINE.md): 64-rank MPI CPU Gadget-2 tree throughput
~1e5 part/sec/rank -> 6.4e6 particle-steps/sec.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASELINE = 6.4e6


def _system(n, box, seed=0, n_gravs=2):
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.particles import Particles

    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(box / n ** (1 / 3) / 30,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box,
        n_gravs=n_gravs, type_to_grav=(0, 1, 0, 0, 0, 0)[:6],
        wiring="newton_yukawa" if n_gravs == 2 else "newton",
        tree_depth=10 if n >= 3_000_000 else 9,
        tree_bucket_size=32, tree_group_size=256)
    rng = np.random.default_rng(seed)
    # clustered: a few hundred Plummer-ish clumps + uniform background
    nclump = max(1, n // 2048)
    centers = rng.uniform(0, box, (nclump, 3))
    k = rng.integers(0, nclump, n)
    pos = np.mod(centers[k] + rng.normal(0, 0.02 * box, (n, 3)), box) \
        .astype(np.float32)
    vel = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    ptype = rng.integers(1, 3, n).astype(np.int32)
    p = Particles.create(pos, vel, np.full(n, 1.0 / n, np.float32),
                         np.arange(n), ptype, cfg.type_to_grav)
    return cfg, p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--mode", choices=["tree", "treepm", "sharded"],
                    default="tree")
    ap.add_argument("--pmgrid", type=int, default=0)
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--box", type=float, default=1000.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--depth", type=int, default=0)
    args = ap.parse_args()

    import jax

    from ngravs_tpu.cosmology import make_tables
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.units import set_units

    cfg, p = _system(args.n, args.box)
    if args.depth:
        cfg = cfg.replace(tree_depth=args.depth)
    if args.mode == "treepm" or args.pmgrid:
        cfg = cfg.replace(pmgrid=args.pmgrid or 256)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)

    if args.mode == "sharded":
        from ngravs_tpu.parallel.mesh import make_mesh, shard_particles
        from ngravs_tpu.parallel.tree_sharded import (make_sharded_tree_step,
                                                      reshard_by_morton)
        n_dev = args.devices or len(jax.devices())
        mesh = make_mesh(n_dev)
        ps = reshard_by_morton(shard_particles(p, mesh), mesh,
                               box=cfg.box_size)
        nloc = ps.pos.shape[0] // n_dev
        fcap = 131072 if args.n >= 500_000 else 16384
        step = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                      n_local=nloc, fcap=fcap,
                                      node_list_cap=8192, leaf_list_cap=8192,
                                      pm_step=bool(cfg.pmgrid))
        pm_args = (0, 0) if cfg.pmgrid else ()
        out = step(ps, 0, 0, cfg.time_begin, *pm_args)   # compile + warm
        jax.block_until_ready(out[0].accel)
        t0 = time.time()
        for _ in range(args.reps):
            out = step(ps, 0, 0, cfg.time_begin, *pm_args)
        jax.block_until_ready(out[0].accel)
        dt = (time.time() - t0) / args.reps
        label = f"sharded tree step ({n_dev} devices)"
    else:
        from ngravs_tpu.integrate.runner import Simulation
        sim = Simulation(cfg, particles=p, log_dir="")
        sim.compute_forces(full=True)          # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            sim.compute_forces(full=True)
        dt = (time.time() - t0) / args.reps
        label = f"single-chip {args.mode} forces"

    rate = args.n / dt
    print(json.dumps({
        "metric": f"force-computations/sec ({label}, N={args.n}, "
                  f"2-species, clustered periodic box"
                  f"{', PMGRID=' + str(cfg.pmgrid) if cfg.pmgrid else ''})",
        "value": round(rate, 1),
        "unit": "particles/s",
        "vs_baseline": round(rate / BASELINE, 4),
    }))


if __name__ == "__main__":
    main()

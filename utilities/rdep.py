#!/usr/bin/env python3
"""Two-particle radial force-law probe — rebuild of the reference's
utilities/rdep.py: places a test particle at a range of separations from a
central particle and records the recovered force (direct, tree, and
tree+PM where enabled) versus radius, verifying the wired force law.

Usage: python utilities/rdep.py [--wiring newton] [--pmgrid 0] [--points 32]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wiring", default="newton")
    ap.add_argument("--pmgrid", type=int, default=0)
    ap.add_argument("--box", type=float, default=10000.0)
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--rmin", type=float, default=1.0)
    ap.add_argument("--rmax", type=float, default=3000.0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.particles import Particles

    box = args.box
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(args.rmin / 4,) * 6, max_size_timestep=0.01,
        periodic=args.pmgrid > 0, box_size=box if args.pmgrid > 0 else 0.0,
        pmgrid=args.pmgrid, n_gravs=max(
            2 if args.wiring in ("yukawa", "newton_yukawa", "bam") else 1, 1),
        type_to_grav=(0, 0, 1, 0, 0, 0)
        if args.wiring in ("yukawa", "newton_yukawa", "bam")
        else (0,) * 6,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0, wiring=args.wiring, ngravs_en=32,
        solver="direct")

    rs = np.logspace(np.log10(args.rmin), np.log10(args.rmax), args.points)
    print("# r   |F_solver|   |F_expected_newton|")
    c = box / 2 if args.pmgrid > 0 else 0.0
    for r in rs:
        pos = np.array([[c, c, c], [c + r, c, c]], np.float32)
        p = Particles.create(pos, np.zeros((2, 3), np.float32),
                             np.array([1000.0, 1e-6], np.float32),
                             [1, 2], [1, 2], cfg.type_to_grav)
        sim = Simulation(cfg, particles=p, log_dir="")
        sim.compute_forces(full=True)
        a = np.linalg.norm(np.asarray(sim.p.accel)[1]
                           + (np.asarray(sim.p.accel_pm)[1]
                              if args.pmgrid else 0.0))
        print(f"{r:.6g} {a:.6g} {1000.0/r**2:.6g}")


if __name__ == "__main__":
    main()

"""The reference's shipped example: two colliding galaxies, 60k particles,
N_GRAVS=2 stock (all-Newton) wiring — `GalaxyCollision.IC` +
`Configuration.reference` (README.md:30-32, Makefile.reference:51,60).

Runs the unmodified reference parameterfile through the TPU-native engine:

    python examples/galaxy_collision.py [--steps N] [--out DIR]

With no --steps, integrates t: 0 -> 2 exactly like the reference
(~200 snapshots at TimeBetSnapshot=0.01).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0,
                    help="stop after N steps (0 = run to TimeMax)")
    ap.add_argument("--out", default="galaxy_collision_out",
                    help="output directory (snapshots + logs)")
    ap.add_argument("--paramfile",
                    default="/root/reference/Configuration.reference")
    ap.add_argument("--ic", default="/root/reference/GalaxyCollision.IC")
    args = ap.parse_args()

    from ngravs_tpu.config import read_parameter_file
    from ngravs_tpu.integrate.runner import Simulation

    os.makedirs(args.out, exist_ok=True)
    cfg = read_parameter_file(args.paramfile, init_cond_file=args.ic,
                              output_dir=args.out)
    sim = Simulation(cfg)
    t0 = time.time()
    sim.run(max_steps=args.steps or None)
    dt = time.time() - t0
    print(f"done: t={float(sim.time):.4f} steps={sim.step_count} "
          f"snapshots={sim.snapshot_count} "
          f"({sim.num_force_updates / max(dt, 1e-9):.0f} particle-steps/s)")


if __name__ == "__main__":
    main()

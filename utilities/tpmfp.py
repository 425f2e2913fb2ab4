#!/usr/bin/env python3
"""TreePM force-accuracy harness — rebuild of the reference's
utilities/tpmfp.py (Python 2, driving the MPI binary via forcetest.txt).

Generates random particle realizations around a massive central particle,
computes solver forces (tree or TreePM) and exact periodic direct-sum
forces, and prints log-binned RMS relative force error vs separation across
the tree/PM transition — the plot utilities/tpmfp.gpt drew.

Usage: python utilities/tpmfp.py [--pmgrid 64] [--n 4096] [--real 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pmgrid", type=int, default=64)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--box", type=float, default=10000.0)
    ap.add_argument("--real", type=int, default=4, help="realizations")
    ap.add_argument("--bins", type=int, default=24)
    ap.add_argument("--gradient", default="fd4", choices=("fd4", "spectral"),
                    help="PM k-space gradient (spectral = exact ik)")
    ap.add_argument("--en", type=int, default=32,
                    help="Ewald oracle table resolution (NGRAVS_EN)")
    ap.add_argument("--asmth", type=float, default=0.0,
                    help="override Asmth (grid cells); 0 = default 1.25")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU free)")
    ap.add_argument("--interlace", action="store_true",
                    help="enable PM grid interlacing")
    ap.add_argument("--cenm", type=float, default=1e6,
                    help="central mass (reference tpmfp.py:68-69: testm=1, "
                         "cenm=1e6 so the central force dominates and the "
                         "binned error probes the solver, not shot noise)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.diagnostics.forcetest import force_test, rms_error
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.particles import Particles

    box = args.box
    samples_r, samples_e = [], []
    for real in range(args.real):
        rng = np.random.default_rng(100 + real)
        cfg = SimulationConfig(
            time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
            softening=(box / 3000,) * 6, max_size_timestep=0.01,
            periodic=True, box_size=box, pmgrid=args.pmgrid,
            time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
            time_bet_statistics=0.0, wiring="newton", ngravs_en=args.en,
            pm_gradient=args.gradient, pm_interlace=args.interlace,
            **({"asmth": args.asmth} if args.asmth else {}))
        # random shell realization around a massive center (tpmfp.py:86-116)
        n = args.n
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
        pos[0] = box / 2
        mass = np.full(n, 1.0, np.float32)
        mass[0] = args.cenm
        p = Particles.create(pos, np.zeros((n, 3), np.float32), mass,
                             np.arange(n), np.ones(n, np.int32),
                             cfg.type_to_grav)
        sim = Simulation(cfg, particles=p, log_dir="")
        sim.compute_forces(full=True)
        idx, acc_d, acc_s, rel = force_test(sim, fraction=0.25, write=False)
        r = np.linalg.norm(np.asarray(sim.p.pos)[idx] - box / 2, axis=1)
        samples_r.append(r)
        samples_e.append(rel)
        print(f"# realization {real}: {rms_error(rel)}")

    r = np.concatenate(samples_r)
    e = np.concatenate(samples_e)
    lo, hi = np.log10(max(r.min(), 1e-3)), np.log10(r.max())
    edges = np.logspace(lo, hi, args.bins + 1)
    print("# r_mid  rms_rel_err  count")
    for i in range(args.bins):
        m = (r >= edges[i]) & (r < edges[i + 1])
        if m.sum() == 0:
            continue
        print(f"{np.sqrt(edges[i]*edges[i+1]):.6g} "
              f"{np.sqrt((e[m]**2).mean()):.6g} {int(m.sum())}")


if __name__ == "__main__":
    main()

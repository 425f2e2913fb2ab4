"""Stock-Newton equivalence: ngravs_tpu vs the real C reference binary.

The reference's strongest regression is NGRAVS_STOCK_TESTING: with both
gravities wired to Newton it must behave like unmodified Gadget-2
(Makefile.reference:60, ngravs.c:98-161).  This harness runs the SAME
physics window on GalaxyCollision with BOTH engines and compares:

  1. energy.txt component trajectories (global.c:22, run.c:413-431)
  2. final-snapshot particle displacement, matched by particle ID
  3. velocity displacement, same matching

Usage:
    python tools/stock_equivalence/compare.py [--tmax 0.1] [--workdir DIR]
        [--skip-c]        # reuse an existing C run in workdir/cref/out
        [--platform cpu]  # force the JAX backend for the rebuild's run

Writes <workdir>/stock_equivalence.json and prints it; exits nonzero when
any tolerance fails.  tests/test_verification.py::test_stock_equivalence
(slow marker) drives this end to end.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

import numpy as np

REF = "/root/reference"

# tolerances (f32 rebuild vs f64 C binary, chaotic N-body over a short
# window; these bound *physics* equivalence, not bitwise identity)
TOL = {
    # relative error on total potential/kinetic energy at matched times
    "energy_rel": 0.02,
    # RMS particle displacement at t_max, relative to the RMS radius of
    # the system (60k-body trajectories diverge exponentially; a short
    # window keeps this meaningful)
    "disp_rms_rel": 0.05,
}


def build_c_reference(workdir: str) -> str:
    """Build the C binary with the round-1 single-rank harness (MPI/GSL
    stubs, stock options of Makefile.reference:51-99)."""
    bdir = os.path.join(workdir, "cref")
    os.makedirs(os.path.join(bdir, "out"), exist_ok=True)
    harness = os.path.join(REPO, "tools", "reference_baseline")
    for f in os.listdir(REF):
        if f.endswith((".c", ".h")):
            shutil.copy(os.path.join(REF, f), bdir)
    # three upstream bugs under OUTPUTPOTENTIAL && !PMGRID (the reference
    # was evidently only ever built with both or neither):
    #  - forcetree.c ~2750: `if(r >= h) {` is never closed before `else`
    #  - forcetree.c:2678: `if(mass > 0)` where ngravs made `mass` an
    #    ARRAY (pointer compare, always true -> spurious endrun(988); the
    #    gravity walk's same check was updated to `summass`, :1481)
    #  - ngravs.c:156: PotentialZero uses PMGRID without a guard
    ft = os.path.join(bdir, "forcetree.c")
    src = open(ft).read()
    src = src.replace(
        "\t    pot -= (*PotentialFxns[pgravtype][i])"
        "(pmass, mass[i], h, r, 1);\n#endif\n\t  else",
        "\t    pot -= (*PotentialFxns[pgravtype][i])"
        "(pmass, mass[i], h, r, 1);\n#endif\n\t  }\n\t  else", 1)
    src = src.replace("if(mass > 0)", "if(summass > 0)")
    open(ft, "w").write(src)
    ng = os.path.join(bdir, "ngravs.c")
    src = open(ng).read()
    src = src.replace(
        "      PotentialZero[i][j] = -1 / (sqrt(M_PI) * "
        "(((double) ASMTH) / (2*PMGRID)));",
        "#ifdef PMGRID\n      PotentialZero[i][j] = -1 / (sqrt(M_PI) * "
        "(((double) ASMTH) / (2*PMGRID)));\n#endif")
    open(ng, "w").write(src)
    shutil.copy(os.path.join(harness, "mpi_stub.c"), bdir)
    shutil.copy(os.path.join(harness, "gsl_stub.c"), bdir)
    shutil.copytree(os.path.join(harness, "stubinc"),
                    os.path.join(bdir, "stubinc"), dirs_exist_ok=True)
    srcs = ("main.c run.c predict.c begrun.c endrun.c global.c timestep.c "
            "init.c restart.c io.c accel.c read_ic.c ngb.c system.c "
            "allocate.c density.c gravtree.c hydra.c driftfac.c domain.c "
            "allvars.c potential.c forcetree.c peano.c "
            "gravtree_forcetest.c pm_periodic.c pm_nonperiodic.c "
            "longrange.c ngravs.c ngravs_core.c mpi_stub.c gsl_stub.c")
    # NB: OUTPUTPOTENTIAL is required — the reference compiles the BODY of
    # force_treeevaluate_potential under it (forcetree.c:2469), so a build
    # with only COMPUTE_POTENTIAL_ENERGY leaves the potential walk a no-op
    # and energy.txt's Epot compounds garbage (*= G per call,
    # potential.c:265)
    cmd = (["gcc", "-O3", "-w", "-std=gnu89", "-fcommon", "-Istubinc",
            "-DN_GRAVS=2", "-DNTAB=2048", "-DNGRAVS_EN=64",
            "-DNGRAVS_TIMESTEP_SCALE=1.0", "-DNGRAVS_STOCK_TESTING",
            "-DUNEQUALSOFTENINGS", "-DPEANOHILBERT", "-DWALLCLOCK",
            "-DDOUBLEPRECISION", "-DSYNCHRONIZATION",
            "-DCOMPUTE_POTENTIAL_ENERGY", "-DOUTPUTPOTENTIAL",
            "-o", "Gadget2"]
           + srcs.split() + ["-lm"])
    subprocess.run(cmd, cwd=bdir, check=True, capture_output=True)
    return os.path.join(bdir, "Gadget2")


def write_param(workdir: str, outdir: str, tmax: float) -> str:
    path = os.path.join(workdir, "param.txt")
    with open(os.path.join(REF, "Configuration.reference")) as f:
        lines = f.readlines()
    subs = {"InitCondFile": f"InitCondFile {REF}/GalaxyCollision.IC",
            "OutputDir": f"OutputDir {outdir}/",
            "TimeMax": f"TimeMax {tmax}",
            "TimeLimitCPU": "TimeLimitCPU 1000000",
            # one snapshot at the very end only: what we diff
            "TimeBetSnapshot": f"TimeBetSnapshot {tmax}",
            "TimeOfFirstSnapshot": f"TimeOfFirstSnapshot {tmax}",
            # energy rows every 0.01 for trajectory comparison
            "TimeBetStatistics": "TimeBetStatistics 0.01"}
    out = []
    for ln in lines:
        tag = ln.split()[0] if ln.split() else ""
        out.append(subs.pop(tag, None) + "\n" if tag in subs else ln)
    with open(path, "w") as f:
        f.writelines(out)
    return path


def run_c(binary: str, param: str, timeout: int = 3600):
    subprocess.run([binary, param], check=True, timeout=timeout,
                   cwd=os.path.dirname(binary), capture_output=True)


def run_tpu_rebuild(param: str, outdir: str):
    from ngravs_tpu.config import read_parameter_file
    from ngravs_tpu.integrate.runner import Simulation

    os.makedirs(outdir, exist_ok=True)
    cfg = read_parameter_file(param, output_dir=outdir)
    # the C side is built with -DCOMPUTE_POTENTIAL_ENERGY (compile-time in
    # Gadget, run.c:54); mirror it here so energy.txt Epot columns compare
    import dataclasses
    cfg = dataclasses.replace(cfg, compute_potential_energy=True)
    sim = Simulation(cfg, log_dir=outdir)
    sim.run()
    sim.close()


def load_energy(path: str) -> np.ndarray:
    return np.loadtxt(path, ndmin=2)


def match_energy(ea: np.ndarray, eb: np.ndarray):
    """Match rows by time (both engines emit at TimeBetStatistics
    boundaries; sync-point times differ slightly) and compare Epot/Ekin."""
    rows = []
    for ra in ea:
        j = int(np.argmin(np.abs(eb[:, 0] - ra[0])))
        if abs(eb[j, 0] - ra[0]) > 0.005:
            continue
        rows.append((ra, eb[j]))
    diffs = {}
    for name, col in (("pot", 2), ("kin", 3)):
        errs = [abs(a[col] - b[col]) / max(abs(b[col]), 1e-30)
                for a, b in rows]
        diffs[name] = float(max(errs)) if errs else float("nan")
    return diffs, len(rows)


def load_snapshot_np(path: str):
    from ngravs_tpu.io.gadget_format import read_snapshot
    d = read_snapshot(path)
    return d.pid, d.pos, d.vel, d.header.time


def compare_final_snapshots(pa: str, pb: str):
    ida, posa, vela, ta = load_snapshot_np(pa)
    idb, posb, velb, tb = load_snapshot_np(pb)
    oa, ob = np.argsort(ida), np.argsort(idb)
    assert (ida[oa] == idb[ob]).all(), "particle ID sets differ"
    dp = posa[oa] - posb[ob]
    dv = vela[oa] - velb[ob]
    com = posb[ob].mean(axis=0)
    r_rms = float(np.sqrt(((posb[ob] - com) ** 2).sum(axis=1).mean()))
    v_rms = float(np.sqrt((velb[ob] ** 2).sum(axis=1).mean()))
    return {
        "time_a": float(ta), "time_b": float(tb),
        "disp_rms": float(np.sqrt((dp ** 2).sum(axis=1).mean())),
        "disp_max": float(np.abs(dp).max()),
        "r_rms": r_rms,
        "disp_rms_rel": float(np.sqrt((dp ** 2).sum(axis=1).mean()) / r_rms),
        "dvel_rms_rel": float(np.sqrt((dv ** 2).sum(axis=1).mean())
                              / max(v_rms, 1e-30)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tmax", type=float, default=0.1)
    ap.add_argument("--workdir", default="/tmp/stock_eq")
    ap.add_argument("--skip-c", action="store_true")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    os.makedirs(args.workdir, exist_ok=True)
    c_out = os.path.join(args.workdir, "cref", "out")
    t_out = os.path.join(args.workdir, "tpu_out")
    if not args.skip_c or not os.path.exists(
            os.path.join(c_out, "energy.txt")):
        binary = build_c_reference(args.workdir)
        os.makedirs(c_out, exist_ok=True)
        param_c = write_param(args.workdir, c_out, args.tmax)
        run_c(binary, param_c)
    if os.path.exists(t_out):
        shutil.rmtree(t_out)
    param_t = write_param(args.workdir, t_out, args.tmax)
    run_tpu_rebuild(param_t, t_out)

    ediff, n_rows = match_energy(
        load_energy(os.path.join(t_out, "energy.txt")),
        load_energy(os.path.join(c_out, "energy.txt")))

    # last snapshot each side
    def last_snap(d):
        snaps = sorted(f for f in os.listdir(d) if f.startswith("snapshot"))
        assert snaps, f"no snapshot in {d}"
        return os.path.join(d, snaps[-1])

    sdiff = compare_final_snapshots(last_snap(t_out), last_snap(c_out))

    result = {
        "tmax": args.tmax,
        "energy_rows_matched": n_rows,
        "energy_pot_rel_max": ediff["pot"],
        "energy_kin_rel_max": ediff["kin"],
        **sdiff,
        "tolerances": TOL,
        "pass": bool(n_rows >= 2
                     and ediff["pot"] < TOL["energy_rel"]
                     and ediff["kin"] < TOL["energy_rel"]
                     and sdiff["disp_rms_rel"] < TOL["disp_rms_rel"]),
    }
    out_path = os.path.join(args.workdir, "stock_equivalence.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()

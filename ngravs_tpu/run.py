"""Command-line driver:
`python -m ngravs_tpu.run <paramfile> [restartflag] [--devices K]`.

Mirrors the reference CLI (main.c:39-54): restartflag 0 = start from ICs,
1 = resume from checkpoint, 2 = start from a snapshot file.  `--devices K`
is the `mpirun -n K` analog: it runs the pod-sharded main loop over a
K-device mesh (DistributedSimulation) instead of the single-chip driver.
"""

from __future__ import annotations

import sys

from .config import read_parameter_file, write_usedvalues
from .integrate.runner import Simulation


def main(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]
    devices = 0
    if "--devices" in argv:
        i = argv.index("--devices")
        devices = int(argv[i + 1])
        del argv[i:i + 2]
    if not argv:
        print("usage: python -m ngravs_tpu.run <parameterfile> "
              "[restartflag] [--devices K]", file=sys.stderr)
        return 1
    paramfile = argv[0]
    restartflag = int(argv[1]) if len(argv) > 1 else 0
    cfg = read_parameter_file(paramfile)
    if devices > 1:
        return _main_distributed(cfg, restartflag, devices)
    try:
        # parameter echo (begrun.c:619): <paramfile>-usedvalues
        write_usedvalues(cfg, paramfile + "-usedvalues")
    except OSError:
        pass  # read-only parameterfile location
    if cfg.output_dir:
        try:
            # copy of the echo into the output dir (begrun.c:678-681)
            import os
            os.makedirs(cfg.output_dir, exist_ok=True)
            write_usedvalues(cfg, os.path.join(
                cfg.output_dir,
                os.path.basename(paramfile) + "-usedvalues"))
        except OSError:
            pass
    if restartflag == 1:
        # resume from restart files (main.c:47-50, restart.c:35)
        sim = Simulation(cfg)
        sim.resume()
    elif restartflag == 2:
        # start fresh from the last snapshot (init.c:84-85)
        import glob
        snaps = sorted(glob.glob(
            f"{cfg.output_dir}/{cfg.snapshot_file_base}_*"))
        if not snaps:
            print("no snapshot found for RestartFlag=2", file=sys.stderr)
            return 1
        sim = Simulation(cfg, ic_path=snaps[-1])
        sim.snapshot_count = len(snaps)
    else:
        sim = Simulation(cfg)
    print(f"ngravs_tpu: {sim.p.n} particles, n_gravs={cfg.n_gravs}, "
          f"wiring={cfg.wiring}, t in [{cfg.time_begin}, {cfg.time_max}]")
    steps = sim.run()
    print(f"done: {steps} steps, {sim.snapshot_count} snapshots, "
          f"final time {sim.time:.6g}")
    sim.close()
    return 0


def _main_distributed(cfg, restartflag: int, devices: int):
    """Pod-sharded run (the `mpirun -n K` analog)."""
    from .integrate.runner import load_initial_conditions
    from .parallel.mesh import make_mesh
    from .parallel.runner import DistributedSimulation
    from .units import set_units

    ic_path = None
    if restartflag == 2:
        import glob
        snaps = sorted(glob.glob(
            f"{cfg.output_dir}/{cfg.snapshot_file_base}_*"))
        if not snaps:
            print("no snapshot found for RestartFlag=2", file=sys.stderr)
            return 1
        ic_path = snaps[-1]
    units = set_units(cfg)
    p, sph = load_initial_conditions(cfg, units, ic_path=ic_path)
    sim = DistributedSimulation(
        cfg, p, sph=sph, mesh=make_mesh(devices),
        entropy_is_u=sph is not None and restartflag != 1)
    if restartflag == 1:
        # resume from the distributed restart dump (restart.c:35)
        sim.resume()
    print(f"ngravs_tpu: {p.pos.shape[0]} particles over {devices} devices, "
          f"n_gravs={cfg.n_gravs}, wiring={cfg.wiring}, "
          f"t in [{cfg.time_begin}, {cfg.time_max}]")
    sim.run()
    print(f"done: {sim.step_count} steps, {sim.snapshot_count} snapshots, "
          f"final time {sim.time:.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Command-line driver: `python -m ngravs_tpu.run <paramfile> [restartflag]`.

Mirrors the reference CLI (main.c:39-54): restartflag 0 = start from ICs,
1 = resume from checkpoint, 2 = start from a snapshot file.
"""

from __future__ import annotations

import sys

from .config import read_parameter_file, write_usedvalues
from .integrate.runner import Simulation


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m ngravs_tpu.run <parameterfile> [restartflag]",
              file=sys.stderr)
        return 1
    paramfile = argv[0]
    restartflag = int(argv[1]) if len(argv) > 1 else 0
    cfg = read_parameter_file(paramfile)
    try:
        # parameter echo (begrun.c:619): <paramfile>-usedvalues
        write_usedvalues(cfg, paramfile + "-usedvalues")
    except OSError:
        pass  # read-only parameterfile location
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


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: particle-steps/sec on the reference workload (GalaxyCollision).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); CPU Gadget-2 tree
throughput on comparable runs is ~1e5 part/sec per rank (timings.txt part/sec
format, gravtree.c:443-444), so a 64-rank CPU baseline of 6.4e6
particle-steps/sec is used as the comparison denominator, matching the
BASELINE.json north-star framing.

The run exercises the PRODUCTION path: the fused Barnes-Hut tree walk
(ops/walk.py — octet frontier traversal, Pallas pair evaluation,
device-resident multi-step segments), N_GRAVS=2 multi-gravity wiring (the
stock all-Newton config of Makefile.reference:51,60), fused
drift+force+kick steps, individual power-of-two timesteps on the integer
timeline.  The direct O(N^2) path (which at 60k is faster but does not
scale) is NOT used: `direct_crossover` is forced below N so the recorded
number tracks the north-star quantity (the O(N log N) walk of
forcetree.c:1623).

Robustness contract (a bench that exits without a parseable line loses the
round).  The axon TPU tunnel can block INSIDE a C extension while holding
the GIL (observed: main thread in socket recv, every other thread
futex-waiting on the GIL), so no in-process watchdog — thread timer or
signal handler — is guaranteed to run.  The measurement therefore runs in
a CHILD process that checkpoints progress to a status file after every
step; this parent SUPERVISOR enforces the deadline from outside, SIGKILLs
a wedged child, and always prints valid JSON from the last checkpoint.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PART_STEPS_PER_SEC = 6.4e6  # 64 ranks x ~1e5 part/sec CPU tree

DEADLINE_S = float(os.environ.get("BENCH_WATCHDOG_S", 1500.0))
WARMUP_WALL_S = float(os.environ.get("BENCH_WARMUP_S", 600.0))
MEASURE_WALL_S = 300.0  # measurement window budget

_CHILD_ENV = "NGRAVS_BENCH_CHILD"
_STATUS_ENV = "NGRAVS_BENCH_STATUS"


def _emit(rate: float, note: str):
    print(json.dumps({
        "metric": "particle-steps/sec (GalaxyCollision 60k, 2-species "
                  f"gravity, fused BH tree walk{note})",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / BASELINE_PART_STEPS_PER_SEC, 4),
    }), flush=True)


# ---------------------------------------------------------------------------
# child: the actual measurement, checkpointing progress after every step
# ---------------------------------------------------------------------------

def _checkpoint(path: str, state: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)  # atomic: the parent never reads a torn file


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """Check TPU reachability in a subprocess (the axon tunnel can hang the
    whole process otherwise).  Returns True if the default backend works."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _child():
    _T0 = time.time()
    status = os.environ[_STATUS_ENV]
    st = {"stage": "backend probe", "note": "", "updates": 0, "t0": None,
          "partial": True}
    _checkpoint(status, st)

    platform_note = ""
    if not _probe_backend():
        # TPU tunnel down: fall back to CPU so the driver still records a
        # real (if slow) measurement instead of a hang.  No persistent
        # cache on CPU (AOT reload spams feature-mismatch errors).
        os.environ.setdefault("NGRAVS_TPU_NO_CACHE", "1")
        import jax
        jax.config.update("jax_platforms", "cpu")
        platform_note = "; CPU FALLBACK - TPU unreachable"

    st["stage"] = "startup (IC load + first compile)"
    st["note"] = platform_note
    _checkpoint(status, st)

    from ngravs_tpu.config import read_parameter_file
    from ngravs_tpu.integrate.runner import Simulation

    cfg = read_parameter_file(
        "/root/reference/Configuration.reference",
        init_cond_file="/root/reference/GalaxyCollision.IC",
        output_dir="", time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0,
        # PRODUCTION PATH: force the fused BH tree walk (ops/walk.py) —
        # the O(N log N) path the north-star is about — instead of the
        # exact O(N^2) sweep the auto solver would pick at 60k.  Walk
        # caps are preset to the measured GalaxyCollision demand
        # (benchmarks/SCALE_r03.json) so the first pass does not burn
        # the window on cap-regrow recompiles.
        direct_crossover=1000, tree_depth=12,
        walk_ent_cap=512, walk_chunk_cap=1024, walk_frontier_cap=1024)
    def _settled_caps(sim):
        # SETTLED walk caps for this exact (deterministic) workload,
        # measured on-chip 2026-08: every overflow regrow or post-success
        # tighten is a full multi-minute XLA recompile over the axon
        # tunnel — r4's bench timed out purely on cap-settling churn.
        # Presetting the converged values and freezing the tightener gives
        # exactly ONE compile per program shape, all persistently cached.
        # If the system drifts out of these caps, the regrow path still
        # recovers (at recompile cost).
        sim.solver.fcaps["chunk"] = 16384
        sim.solver.fcaps["frontier"] = (
            1, 8, 64, 256, 1024, 4096, 2048, 2048, 2048, 1024, 64, 64, 64)
        sim.solver.octet_caps = (
            1, 1, 8, 64, 192, 384, 320, 320, 320, 128, 8, 8, 8)
        sim.solver._tightened = True

    best = {"rate": None, "note": ""}  # best COMPLETED measurement so far

    def _measure(sim, warm_steps, warm_extra, target_steps, phase_note):
        """Warm up then measure one Simulation; checkpoints continuously
        and records the completed rate.  Returns the rate (or None if the
        warmup window closed before any step ran)."""
        note = platform_note + phase_note
        # warmup: compile all kernels on the shapes the loop will use.
        # HARD bounds on steps and wall time.  Warmup steps feed the
        # checkpoint (post-compile clock, first-segment updates excluded):
        # if the parent's deadline lands mid-warmup — e.g. a cold compile
        # cache ate the window — the emitted line still carries a real,
        # conservative rate, not 0.
        st.clear()
        st.update({"stage": "warmup" + phase_note, "note": note,
                   "updates": 0, "t0": None, "partial": True,
                   "best_rate": best["rate"], "best_note": best["note"]})
        _checkpoint(status, st)
        warm = sim.step_count
        t_warm0 = time.time()
        caps = None
        warm_n0 = None
        while ((sim.step_count - warm < warm_steps
                or caps != sim.solver.fcaps)
               and sim.step_count - warm <= warm_extra
               and time.time() - t_warm0 < WARMUP_WALL_S):
            caps = dict(sim.solver.fcaps)
            sim.step()
            if warm_n0 is None:  # clock starts after the compile step
                warm_n0 = sim.num_force_updates
                st["t0"] = time.time()
                st["note"] = note + "; WARMUP-stage rate"
            else:
                st["updates"] = sim.num_force_updates - warm_n0
            _checkpoint(status, st)

        import ngravs_tpu.constants as C
        st2 = {"stage": "measure" + phase_note, "note": note, "updates": 0,
               "t0": time.time(), "partial": True,
               "best_rate": best["rate"], "best_note": best["note"]}
        st.clear()
        st.update(st2)
        _checkpoint(status, st)
        n0 = sim.num_force_updates
        s0 = sim.step_count
        t0 = time.time()
        # measure a fixed sync-point budget (each step() call may advance
        # a whole device-resident segment), bounded in wall time
        while sim.step_count - s0 < target_steps \
                and sim.ti_current < C.TIMEBASE \
                and time.time() - t0 < MEASURE_WALL_S:
            sim.step()
            st["updates"] = sim.num_force_updates - n0
            _checkpoint(status, st)
        dt = time.time() - t0
        rate = (sim.num_force_updates - n0) / max(dt, 1e-9)
        if sim.num_force_updates > n0:
            if best["rate"] is None or rate > best["rate"]:
                best["rate"], best["note"] = rate, note
            st.update(partial=False, rate=best["rate"], note=best["note"],
                      best_rate=best["rate"], best_note=best["note"])
            _checkpoint(status, st)
            return rate
        return None

    if platform_note:
        # shrink the CPU-fallback workload so the measurement completes:
        # an honest small number beats a driver timeout
        import numpy as np
        from ngravs_tpu.integrate.runner import load_initial_conditions
        from ngravs_tpu.units import set_units
        import jax
        p_full, _ = load_initial_conditions(cfg, set_units(cfg))
        sel = np.sort(np.random.default_rng(0).choice(
            p_full.pos.shape[0], 4096, replace=False))
        p_sub = jax.tree.map(lambda a: a[sel], p_full)
        sim = Simulation(cfg, particles=p_sub, log_dir="", segment_steps=32)
        platform_note += " (4k subset)"
        st["note"] = platform_note
        _measure(sim, 32, 64, 64, "")
        return

    # Phase A: device-resident 64-step segments — the production fast
    # path and the best number (measured 79.4k part-steps/s steady state,
    # benchmarks/SCALE_r05.json).  Its programs are the most expensive
    # compiles in the framework (~15 min for the segment over the
    # tunnel) but they live in the persistent host-keyed cache, where
    # benchmarks/bench_probe.py pre-warms them; a warm run completes the
    # whole phase in minutes.
    sim = Simulation(cfg, log_dir="", segment_steps=64)
    _settled_caps(sim)
    rate_a = _measure(sim, 12, 400, 1024, "")

    # Phase B (fallback): per-step dispatch (segment_steps=1).  Uses only
    # the per-step programs (tree prep / fused walk / scatter / kick at
    # bucketed active-set sizes) — several smaller compiles instead of
    # one monster, so on a cold cache SOME phase completes inside the
    # driver window.  ~25 ms host sync per step on the tunnel.  The
    # checkpoint keeps the best COMPLETED rate across both phases.
    if rate_a is None or time.time() - _T0 < DEADLINE_S * 0.5:
        sim_b = Simulation(cfg, log_dir="", segment_steps=1)
        _settled_caps(sim_b)
        _measure(sim_b, 30, 120, 192, "; per-step dispatch")


# ---------------------------------------------------------------------------
# parent: out-of-process deadline, always prints valid JSON
# ---------------------------------------------------------------------------

def _read_status(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _finish(status_path: str, why: str, code: int = 0):
    st = _read_status(status_path)
    note = st.get("note", "")
    if not st.get("partial", True) and "rate" in st:
        rate = st["rate"]
    else:
        upd, t0 = st.get("updates", 0), st.get("t0")
        if t0 is not None and upd > 0:
            rate = upd / max(time.time() - t0, 1e-9)
            note += f"; PARTIAL window ({why})"
        else:
            rate = 0.0
            note += (f"; ABORTED in stage "
                     f"'{st.get('stage', 'launch')}' ({why})")
        # an earlier phase's COMPLETED measurement floors the result (a
        # later phase interrupted mid-compile must not erase it)
        best = st.get("best_rate")
        if best is not None and best > rate:
            rate, note = best, st.get("best_note", "") + \
                f"; later phase cut short ({why})"
    _emit(rate, note)
    raise SystemExit(code)


def _supervise():
    fd, status_path = tempfile.mkstemp(prefix="ngravs_bench_", suffix=".json")
    os.close(fd)
    env = dict(os.environ, **{_CHILD_ENV: "1", _STATUS_ENV: status_path})
    child = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=sys.stderr)

    def _kill_and_finish(why):
        try:
            child.kill()  # SIGKILL: a GIL-wedged child ignores SIGTERM
            child.wait(timeout=30)
        except Exception:
            pass
        _finish(status_path, why)

    signal.signal(signal.SIGTERM, lambda *_: _kill_and_finish("SIGTERM"))
    signal.signal(signal.SIGINT, lambda *_: _kill_and_finish("SIGINT"))

    deadline = time.time() + DEADLINE_S
    while True:
        try:
            rc = child.wait(timeout=min(10.0, max(0.1,
                                                  deadline - time.time())))
            why = "clean" if rc == 0 else f"child exit {rc}"
            _finish(status_path, why)
        except subprocess.TimeoutExpired:
            if time.time() >= deadline:
                _kill_and_finish("watchdog")


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV):
        try:
            _child()
        except Exception as e:  # surface the error in the parent's line
            path = os.environ[_STATUS_ENV]
            st = _read_status(path)
            st["note"] = (st.get("note", "")
                          + f"; ERROR {type(e).__name__}: {e}"[:200])
            st["partial"] = st.get("partial", True) and "rate" not in st
            _checkpoint(path, st)
            raise
    else:
        _supervise()

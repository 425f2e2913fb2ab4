"""Restart files: bit-exact checkpoint/resume of the simulation state.

Rebuild of `restart.c`: the reference dumps the whole `All` struct, particle
arrays, RNG state and the built tree per rank (restart.c:92-207).  Here the
checkpoint is one compressed npz of the particle/SPH pytrees plus the
integer-timeline and PM state; the tree is NOT saved — rebuilds are cheap on
TPU (the reference saves it only because serial insertion is not).

`.bak` rotation matches restart.c:45-78.  Resume reproduces trajectories
exactly: the integrator state is integer timeline ticks plus device arrays,
all of which round-trip losslessly through the file.
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp


def save_restart(sim, path: str | None = None) -> str:
    """Write a restart file for `sim` (restart(0), restart.c:35)."""
    cfg = sim.cfg
    if path is None:
        base = sim.log_dir or "."
        path = os.path.join(base, f"{cfg.restart_file}.npz")
    if os.path.exists(path):  # .bak rotation (restart.c:45)
        os.replace(path, path + ".bak")
    p = jax.device_get(sim.p)
    state = {f"p_{k}": np.asarray(v) for k, v in
             zip(("pos", "vel", "mass", "pid", "ptype", "grav", "accel",
                  "accel_pm", "potential", "old_acc", "ti_begstep",
                  "ti_endstep", "grav_cost"),
                 (p.pos, p.vel, p.mass, p.pid, p.ptype, p.grav, p.accel,
                  p.accel_pm, p.potential, p.old_acc, p.ti_begstep,
                  p.ti_endstep, p.grav_cost))}
    if sim.sph is not None:
        s = jax.device_get(sim.sph)
        for k in ("entropy", "density", "hsml", "pressure", "dt_entropy",
                  "hydro_accel", "vel_pred", "div_vel", "curl_vel",
                  "dhsml_density_factor", "max_signal_vel", "num_ngb"):
            state[f"sph_{k}"] = np.asarray(getattr(s, k))
    state["ti_current"] = np.int64(sim.ti_current)
    state["pm_ti_begstep"] = np.int64(sim.pm_ti_begstep)
    state["pm_ti_endstep"] = np.int64(sim.pm_ti_endstep)
    state["dt_displacement"] = np.float64(sim.dt_displacement)
    state["step_count"] = np.int64(sim.step_count)
    state["snapshot_count"] = np.int64(sim.snapshot_count)
    state["num_force_updates"] = np.int64(sim.num_force_updates)
    state["next_output"] = np.float64(sim._next_output)
    state["next_stats"] = np.float64(sim._next_stats)
    # timeline span, so a resume with larger TimeMax can rescale the integer
    # ticks (readjust_timebase, begrun.c:821-864)
    state["time_begin"] = np.float64(cfg.time_begin)
    state["timeline_time_max"] = np.float64(cfg.timeline_time_max
                                            or cfg.time_max)
    if cfg.flexsteps:
        # FLEXSTEPS globals (allvars.h:407-409); flex_step_grp itself is
        # deterministic from the particle IDs and regenerated at init
        state["present_min_step"] = np.int64(sim.present_min_step)
        state["present_max_step"] = np.int64(sim.present_max_step)
    np.savez_compressed(path + ".tmp.npz", **state)
    os.replace(path + ".tmp.npz", path)
    return path


def load_restart(sim, path: str | None = None):
    """Resume `sim` from a restart file (restart(1)).

    Shape-defining configuration (particle counts, n_gravs, pmgrid, wiring)
    must match the checkpoint; run-control parameters may change on resume
    exactly like the reference's allowed subset (begrun.c:81-128).  A LARGER
    TimeMax is handled by rescaling the integer timeline with power-of-two
    halvings (readjust_timebase, begrun.c:821-864): each halving doubles the
    tick interval, so old ticks map to new ticks exactly by a right shift;
    the timeline then covers [time_begin, timeline_time_max] >= time_max and
    `run()` terminates on Time > TimeMax (run.c:32)."""
    from ..particles import Particles, SphState

    cfg = sim.cfg
    if path is None:
        path = os.path.join(sim.log_dir or ".", f"{cfg.restart_file}.npz")
    z = np.load(path)

    shift = 0
    if "timeline_time_max" in z.files:
        old_tmax = float(z["timeline_time_max"])
        old_tb = float(z["time_begin"])
        if abs(old_tb - cfg.time_begin) > 1e-12 * max(1.0, abs(old_tb)):
            raise ValueError(
                f"TimeBegin may not change on resume: checkpoint "
                f"{old_tb} vs config {cfg.time_begin}")
        if cfg.time_max < old_tmax * (1 - 1e-12):
            pass  # shrinking TimeMax: timeline still covers it; run() stops early
        if cfg.time_max > old_tmax * (1 + 1e-12):
            # readjust_timebase (begrun.c:821-864)
            if cfg.comoving_integration:
                old_span = math.log(old_tmax) - math.log(old_tb)
                new_span = math.log(cfg.time_max) - math.log(old_tb)
            else:
                old_span = old_tmax - old_tb
                new_span = cfg.time_max - old_tb
            while old_span * (1 << shift) < new_span * (1 - 1e-12):
                shift += 1
        if shift or cfg.time_max < old_tmax * (1 - 1e-12):
            tl_tmax = old_tmax
            if shift:
                if cfg.comoving_integration:
                    tl_tmax = old_tb * math.exp(
                        (math.log(old_tmax / old_tb)) * (1 << shift))
                else:
                    tl_tmax = old_tb + (old_tmax - old_tb) * (1 << shift)
            sim.cfg = cfg = cfg.replace(timeline_time_max=tl_tmax)
            from ..cosmology import make_tables
            from ..integrate.timeline import timebase_interval
            sim.tbi = timebase_interval(cfg)
            sim.tables = make_tables(cfg, sim.units)
            # the jitted drift/kick kernels close over cfg's tick interval
            sim._build_kernels()

    pk = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("p_")}
    pk.setdefault("aphys_old", jnp.zeros_like(pk["old_acc"]))
    sim.p = Particles(**pk)
    if shift:
        sim.p = sim.p.replace(ti_begstep=sim.p.ti_begstep >> shift,
                              ti_endstep=sim.p.ti_endstep >> shift)
    if sim.sph is not None:
        sk = {k[4:]: jnp.asarray(z[k]) for k in z.files
              if k.startswith("sph_")}
        sim.sph = SphState(**sk)
    sim.ti_current = int(z["ti_current"]) >> shift
    sim.pm_ti_begstep = int(z["pm_ti_begstep"]) >> shift
    sim.pm_ti_endstep = int(z["pm_ti_endstep"]) >> shift
    sim.dt_displacement = float(z["dt_displacement"])
    sim.step_count = int(z["step_count"])
    sim.snapshot_count = int(z["snapshot_count"])
    sim.num_force_updates = int(z["num_force_updates"])
    sim._next_output = float(z["next_output"])
    sim._next_stats = float(z["next_stats"])
    if cfg.flexsteps and "present_min_step" in z.files:
        sim.present_min_step = int(z["present_min_step"])
        sim.present_max_step = int(z["present_max_step"])
    sim._forces_bootstrapped = True
    sim._entropy_is_u = False
    return sim

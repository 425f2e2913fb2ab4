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
    if cfg.flexsteps:
        # FLEXSTEPS globals (allvars.h:407-409); flex_step_grp itself is
        # deterministic from the particle IDs and regenerated at init
        state["present_min_step"] = np.int64(sim.present_min_step)
        state["present_max_step"] = np.int64(sim.present_max_step)
    np.savez_compressed(path + ".tmp.npz", **state)
    os.replace(path + ".tmp.npz", path)
    return path


def load_restart(sim, path: str | None = None):
    """Resume `sim` from a restart file (restart(1)); sim must be built with
    the same configuration (the reference likewise forbids changing the
    run's shape on resume, begrun.c:81-128)."""
    from ..particles import Particles, SphState

    cfg = sim.cfg
    if path is None:
        path = os.path.join(sim.log_dir or ".", f"{cfg.restart_file}.npz")
    z = np.load(path)
    pk = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("p_")}
    sim.p = Particles(**pk)
    if sim.sph is not None:
        sk = {k[4:]: jnp.asarray(z[k]) for k in z.files
              if k.startswith("sph_")}
        sim.sph = SphState(**sk)
    sim.ti_current = int(z["ti_current"])
    sim.pm_ti_begstep = int(z["pm_ti_begstep"])
    sim.pm_ti_endstep = int(z["pm_ti_endstep"])
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

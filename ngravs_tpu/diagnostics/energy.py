"""Global conservation diagnostics (reference global.c:22-198, run.c:413-433).

`compute_global_quantities` returns per-type kinetic/potential/internal
energies, momentum, angular momentum, CM and mass, with velocities predicted
from each particle's half-step midpoint to the current time — the reference's
practical regression check for integration correctness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import N_TYPES


class SysState(NamedTuple):
    energy_kin: jnp.ndarray        # scalar
    energy_pot: jnp.ndarray
    energy_int: jnp.ndarray
    energy_kin_comp: jnp.ndarray   # [6]
    energy_pot_comp: jnp.ndarray
    energy_int_comp: jnp.ndarray
    momentum: jnp.ndarray          # [4] (xyz, |p|)
    ang_momentum: jnp.ndarray      # [4]
    center_of_mass: jnp.ndarray    # [3]
    mass_comp: jnp.ndarray         # [6]

    @property
    def energy_tot(self):
        return self.energy_kin + self.energy_pot + self.energy_int


def predicted_velocities(p, tables, ti_current, sph=None, pm_window=None):
    """Velocities advanced from each particle's kick midpoint to ti_current
    (global.c:52-80, io.c:209-240): short-range + gas hydro terms over the
    particle's own window; the PM term over the PM-timeline window
    `pm_window = (pm_ti_begstep, pm_ti_endstep)` when given (the single-chip
    scheme), else over the particle window (the per-step-PM scheme)."""
    mid = (p.ti_begstep + p.ti_endstep) // 2
    dt_grav = tables.gravkick_factor(mid, ti_current)
    vel = p.vel + p.accel * dt_grav[:, None]
    if sph is not None:
        dt_hydro = tables.hydrokick_factor(mid, ti_current)
        vel = vel + jnp.where((p.ptype == 0)[:, None],
                              sph.hydro_accel * dt_hydro[:, None], 0.0)
    if pm_window is not None:
        pm_beg, pm_end = pm_window
        pm_mid = jnp.asarray([(pm_beg + pm_end) // 2], jnp.int32)
        dt_pm = tables.gravkick_factor(
            pm_mid, jnp.asarray([ti_current], jnp.int32))[0]
        vel = vel + p.accel_pm * dt_pm
    else:
        vel = vel + p.accel_pm * dt_grav[:, None]
    return vel


def compute_global_quantities(cfg, p, sph, tables, ti_current,
                              a3inv=1.0, pm_window=None,
                              atime=1.0) -> SysState:
    vel = predicted_velocities(p, tables, ti_current, sph=sph,
                               pm_window=pm_window)
    m = p.mass
    v2 = jnp.sum(vel * vel, axis=-1)

    onehot = jax.nn.one_hot(p.ptype, N_TYPES, dtype=m.dtype)  # [N,6]
    mass_comp = onehot.T @ m

    ekin_i = 0.5 * m * v2
    # potential energy carries a 1/a under comoving (global.c:56)
    epot_i = 0.5 * m * p.potential / atime
    ekin_comp = onehot.T @ ekin_i
    epot_comp = onehot.T @ epot_i

    if sph is not None:
        # entropy predicted to the current time (global.c:77-78)
        from ..integrate.timeline import timebase_interval
        mid = (p.ti_begstep + p.ti_endstep) // 2
        dt_entr = (ti_current - mid).astype(jnp.float32) \
            * timebase_interval(cfg)
        entr = sph.entropy + sph.dt_entropy * dt_entr
        if cfg.isotherm_eqs:
            # ISOTHERM_EQS: the entropy variable IS u (global.c:95-99)
            egyspec = entr
        else:
            gm1 = cfg.gamma_minus1
            egyspec = entr / gm1 \
                * jnp.maximum(sph.density * a3inv, 1e-30) ** gm1
        eint_i = jnp.where(p.ptype == 0, m * egyspec, 0.0)
    else:
        eint_i = jnp.zeros_like(m)
    eint_comp = onehot.T @ eint_i

    mom = jnp.sum(m[:, None] * vel, axis=0)
    ang = jnp.sum(m[:, None] * jnp.cross(p.pos, vel), axis=0)
    com = jnp.sum(m[:, None] * p.pos, axis=0) / jnp.sum(m)

    return SysState(
        energy_kin=jnp.sum(ekin_i),
        energy_pot=jnp.sum(epot_i),
        energy_int=jnp.sum(eint_i),
        energy_kin_comp=ekin_comp,
        energy_pot_comp=epot_comp,
        energy_int_comp=eint_comp,
        momentum=jnp.concatenate([mom, jnp.linalg.norm(mom)[None]]),
        ang_momentum=jnp.concatenate([ang, jnp.linalg.norm(ang)[None]]),
        center_of_mass=com,
        mass_comp=mass_comp,
    )


def format_energy_line(time: float, s: SysState) -> str:
    """One energy.txt row (run.c:419-431): time, Eint, Epot, Ekin, then
    per-type (Eint, Epot, Ekin) triplets, then per-type masses — 28 columns."""
    cols = [time, float(s.energy_int), float(s.energy_pot), float(s.energy_kin)]
    for t in range(N_TYPES):
        cols += [float(s.energy_int_comp[t]), float(s.energy_pot_comp[t]),
                 float(s.energy_kin_comp[t])]
    cols += [float(m) for m in s.mass_comp]
    return " ".join(f"{c:.10g}" for c in cols)

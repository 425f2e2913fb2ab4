"""KDK leapfrog on the integer timeline with individual power-of-two steps.

TPU-native rebuild of the reference's integrator:
  * drift   — predict.c:31 `move_particles` (all particles)
  * kick    — timestep.c:24 `advance_and_find_timesteps` (active particles)
  * dt rule — timestep.c:427 `get_timestep`, criterion 0

Instead of per-particle scalar loops, every operation is a masked vectorized
update over the full arrays; the active set is `ti_endstep == ti_current`.
The integer-step bookkeeping (power-of-two floor, SYNCHRONIZATION alignment
rule, midpoint kick windows) reproduces the reference's semantics exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import TIMEBASE
from .timeline import pow2_floor_i32, timebase_interval


class CosmoFactors(NamedTuple):
    """Comoving prefactors at the current time (timestep.c:48-61)."""
    fac1: jnp.ndarray      # 1/a^2 — converts GravAccel to physical
    fac2: jnp.ndarray      # 1/a^{3 GAMMA - 2} — HydroAccel to physical
    fac3: jnp.ndarray      # a^{3(1-GAMMA)/2} — signal-velocity factor
    hubble_a: jnp.ndarray  # H(a)
    a3inv: jnp.ndarray
    atime: jnp.ndarray


def cosmo_factors(cfg, units, time_now) -> CosmoFactors:
    if cfg.comoving_integration:
        a = jnp.asarray(time_now, jnp.float32)
        h2 = (cfg.omega0 / (a * a * a)
              + (1 - cfg.omega0 - cfg.omega_lambda) / (a * a)
              + cfg.omega_lambda)
        g = cfg.gamma  # 5/3, or 1 under IsothermEqs (allvars.h:49-53)
        return CosmoFactors(
            fac1=1.0 / (a * a),
            fac2=1.0 / a ** (3 * g - 2),
            fac3=a ** (3 * (1 - g) / 2.0),
            hubble_a=units.hubble * jnp.sqrt(h2),
            a3inv=1.0 / (a * a * a),
            atime=a,
        )
    one = jnp.float32(1.0)
    return CosmoFactors(one, one, one, one, one, one)


def compute_timestep_dt(cfg, units, p, sph, cf: CosmoFactors,
                        dt_displacement: float, soft_table: jnp.ndarray):
    """Per-particle dt from timestep criterion 0, BEFORE the MinSizeTimestep
    floor (timestep.c:427-530): dt = sqrt(2 eta atime eps_plummer /
    |a_phys|), Courant-limited for gas, clamped by MaxSizeTimestep and the
    displacement constraint."""
    acc = p.accel * cf.fac1 + p.accel_pm * cf.fac1
    if sph is not None:
        is_gas = (p.ptype == 0)
        acc = acc + jnp.where(is_gas[:, None], sph.hydro_accel * cf.fac2, 0.0)
    ac = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    ac = jnp.maximum(ac, 1.0e-30) * cfg.ngravs_timestep_scale

    eps = soft_table[p.ptype]
    if cfg.adaptive_gravsoft_forgas and sph is not None:
        # gas Plummer-equivalent = Hsml/2.8 (timestep.c:497-500)
        from ..constants import SOFTFAC_SPLINE
        eps = jnp.where(p.ptype == 0, sph.hsml / SOFTFAC_SPLINE, eps)
    dt = jnp.sqrt(2 * cfg.err_tol_int_accuracy * cf.atime * eps / ac)

    if sph is not None:
        # SPH Courant criterion (timestep.c:507-518)
        if cfg.comoving_integration:
            dt_courant = 2 * cfg.courant_fac * cf.atime * sph.hsml \
                / (cf.fac3 * jnp.maximum(sph.max_signal_vel, 1e-30))
        else:
            dt_courant = 2 * cfg.courant_fac * sph.hsml \
                / jnp.maximum(sph.max_signal_vel, 1e-30)
        dt = jnp.where((p.ptype == 0) & (sph.max_signal_vel > 0),
                       jnp.minimum(dt, dt_courant), dt)

    dt = dt * cf.hubble_a  # physical -> dloga for comoving (hubble_a=1 else)
    dt = jnp.minimum(dt, cfg.max_size_timestep)
    dt = jnp.minimum(dt, dt_displacement)
    return dt


def compute_timestep_ticks(cfg, units, p, sph, cf: CosmoFactors,
                           dt_displacement: float, soft_table: jnp.ndarray):
    """Per-particle integer step (power-of-two) from timestep criterion 0,
    floored to MinSizeTimestep then to a power of two on the integer
    timeline (timestep.c:427-560 and the pow-2 subdivision at
    timestep.c:190-194)."""
    dt = compute_timestep_dt(cfg, units, p, sph, cf, dt_displacement,
                             soft_table)
    dt = jnp.maximum(dt, cfg.min_size_timestep)

    tbi = timebase_interval(cfg)
    ti_step = jnp.clip((dt / tbi).astype(jnp.int32), 1, TIMEBASE)
    return pow2_floor_i32(ti_step)


def glass_step(cfg, units, p):
    """MAKEGLASS (timestep.c:85-133): reverse gravity, displace toward
    uniformity, zero velocities — makes glass initial conditions."""
    acc = -(p.accel + p.accel_pm)
    disp_fac = 2.0 / (3 * units.hubble ** 2)
    disp = jnp.linalg.norm(acc, axis=-1) * disp_fac
    dmax = jnp.max(disp)
    rho_crit_mean = cfg.omega0 * 3 * units.hubble ** 2 / (8 * np.pi * units.G)
    dmean = (p.mass[0] / jnp.maximum(rho_crit_mean, 1e-37)) ** (1.0 / 3)
    fac = jnp.where(dmax > dmean, dmean / dmax, 1.0)
    pos = p.pos + fac * acc * disp_fac
    if cfg.periodic and cfg.box_size > 0:
        pos = jnp.mod(pos, cfg.box_size)
    return p.replace(pos=pos, vel=jnp.zeros_like(p.vel),
                     accel=jnp.zeros_like(p.accel),
                     accel_pm=jnp.zeros_like(p.accel_pm))


def kick(cfg, units, p, sph, tables, ti_current: jnp.ndarray,
         dt_displacement: float, soft_table, time_now, flex=None,
         rnd_table=None):
    """advance_and_find_timesteps (timestep.c:24-408) for the active set.

    Returns updated (particles, sph).  `p.accel`/`hydro_accel` must already
    include G / all prefactors applied at force time.

    `flex`: None for SYNCHRONIZATION mode, else a (flex_step_grp[N] int32,
    present_min_step, present_max_step) triple for FLEXSTEPS
    (timestep.c:196-199): each particle's step end is phase-shifted by its
    random group so sync points spread out instead of piling at powers of
    two.
    """
    cf = cosmo_factors(cfg, units, time_now)
    active = p.ti_endstep == ti_current

    ti_step = compute_timestep_ticks(cfg, units, p, sph, cf, dt_displacement,
                                     soft_table)

    if flex is not None:
        # FLEXSTEPS alignment (timestep.c:196-199): steps end on the
        # particle's group-phase grid of spacing ti_step
        flex_grp, pmin_step, pmax_step = flex
        ti_grp = flex_grp % jnp.maximum(pmax_step, 1)
        ti_grp = (ti_grp // jnp.maximum(pmin_step, 1)) * pmin_step
        base = p.ti_endstep + ti_grp
        ti_step = ((base + ti_step) // ti_step) * ti_step - base
        ti_step = jnp.maximum(ti_step, 1)
    else:
        if cfg.pseudosymmetric and rnd_table is not None:
            # PSEUDOSYMMETRIC (timestep.c:202-238): predict the physical
            # acceleration at the end of the proposed step to first order;
            # if the predicted step would differ, halve/double THIS step
            # with a probability that makes the step sequence
            # time-symmetric on average.  Non-gas particles only.
            old_step = p.ti_endstep - p.ti_begstep
            acc_p = (p.accel + p.accel_pm) * cf.fac1
            aphys = jnp.sqrt(jnp.sum(acc_p * acc_p, axis=-1))
            slope = (aphys - p.aphys_old) \
                / jnp.maximum(old_step, 1).astype(aphys.dtype)
            apred = aphys + slope * ti_step.astype(aphys.dtype)
            eligible = (p.ptype != 0) & (old_step > 0) & active \
                & (jnp.abs(apred - aphys) < 0.5 * aphys)
            # step the predicted acceleration would give (get_timestep
            # with flag=-1: full criterion incl. clamps)
            eps = soft_table[p.ptype]
            eta2 = 2 * cfg.err_tol_int_accuracy * cf.atime * eps
            ac2 = jnp.maximum(apred, 1e-30) * cfg.ngravs_timestep_scale
            dt2 = jnp.sqrt(eta2 / ac2) * cf.hubble_a
            dt2 = jnp.clip(dt2, cfg.min_size_timestep,
                           jnp.minimum(cfg.max_size_timestep,
                                       dt_displacement))
            tbi = timebase_interval(cfg)
            ti2 = pow2_floor_i32(jnp.clip((dt2 / tbi).astype(jnp.int32),
                                          1, TIMEBASE))
            # acceleration equivalent of dt = ti_step / 2*ti_step
            # (get_timestep flag>0 branch, timestep.c:475-487)
            dt_cur = ti_step.astype(aphys.dtype) * tbi / cf.hubble_a
            scale = cfg.ngravs_timestep_scale
            ac_eq_s = eta2 / jnp.maximum(dt_cur * dt_cur * scale, 1e-37)
            ac_eq_g = eta2 / jnp.maximum(4 * dt_cur * dt_cur * scale, 1e-37)
            denom = aphys - p.aphys_old
            safe_den = jnp.where(denom == 0, 1e-30, denom)
            base_fac = old_step.astype(aphys.dtype) \
                / jnp.maximum(ti_step, 1).astype(aphys.dtype) / safe_den
            prob_s = (ac_eq_s - aphys) * base_fac
            prob_g = (ac_eq_g - aphys) * base_fac
            rnd_a = rnd_table[p.pid % rnd_table.shape[0]]
            rnd_b = rnd_table[(p.pid + 1) % rnd_table.shape[0]]
            shrink = eligible & (ti2 < ti_step) & (prob_s < rnd_a)
            grow = eligible & (ti2 > ti_step) & (prob_g < rnd_b)
            ti_step = jnp.where(shrink, ti_step // 2,
                                jnp.where(grow, ti_step * 2, ti_step))
            ti_step = jnp.maximum(ti_step, 1)
            p = p.replace(aphys_old=jnp.where(
                active & (p.ptype != 0), aphys, p.aphys_old))
        # SYNCHRONIZATION rule (timestep.c:240-246): a step may only grow if
        # the new end lands on an aligned tick
        old_step = p.ti_endstep - p.ti_begstep
        wants_increase = ti_step > old_step
        misaligned = ((TIMEBASE - p.ti_endstep) % ti_step) > 0
        ti_step = jnp.where(wants_increase & misaligned & (old_step > 0),
                            old_step, ti_step)

    # end-of-run clamps (timestep.c:249-253)
    ti_step = jnp.where(ti_current == TIMEBASE, 0, ti_step)
    ti_step = jnp.minimum(ti_step, TIMEBASE - ti_current)

    # midpoint kick windows (timestep.c:255-271)
    tstart = (p.ti_begstep + p.ti_endstep) // 2   # midpoint of old step
    tend = p.ti_endstep + ti_step // 2            # midpoint of new step
    dt_grav = tables.gravkick_factor(tstart, tend)
    dt_hydro = tables.hydrokick_factor(tstart, tend)

    vel = p.vel + jnp.where(active[:, None], p.accel * dt_grav[:, None], 0.0)

    new_beg = jnp.where(active, p.ti_endstep, p.ti_begstep)
    new_end = jnp.where(active, p.ti_endstep + ti_step, p.ti_endstep)

    if sph is not None:
        is_act_gas = active & (p.ptype == 0)
        vel = vel + jnp.where(is_act_gas[:, None],
                              sph.hydro_accel * dt_hydro[:, None], 0.0)
        # predicted velocity rewound to the step start (timestep.c:113-117)
        dt_grav2 = tables.gravkick_factor(p.ti_endstep, tend)
        dt_hydro2 = tables.hydrokick_factor(p.ti_endstep, tend)
        vel_pred = vel - p.accel * dt_grav2[:, None] \
            - sph.hydro_accel * dt_hydro2[:, None]
        vel_pred = jnp.where(is_act_gas[:, None], vel_pred, sph.vel_pred)
        # entropy update with the -50% floor (timestep.c:123-126)
        dt_entr = (tend - tstart).astype(jnp.float32) * timebase_interval(cfg)
        d_ent = sph.dt_entropy * dt_entr
        entropy = jnp.where(d_ent > -0.5 * sph.entropy,
                            sph.entropy + d_ent, sph.entropy * 0.5)
        if units.min_egy_spec > 0:
            gm1 = cfg.gamma_minus1
            min_entropy = units.min_egy_spec * gm1 \
                / jnp.maximum(sph.density * cf.a3inv, 1e-30) ** gm1
            floor_hit = entropy < min_entropy
            entropy = jnp.where(floor_hit, min_entropy, entropy)
            dt_entropy = jnp.where(floor_hit & is_act_gas, 0.0, sph.dt_entropy)
        else:
            dt_entropy = sph.dt_entropy
        entropy = jnp.where(is_act_gas, entropy, sph.entropy)
        sph = sph.replace(vel_pred=vel_pred, entropy=entropy,
                          dt_entropy=dt_entropy)

    p = p.replace(vel=vel, ti_begstep=new_beg, ti_endstep=new_end)
    return p, sph


def drift(cfg, p, sph, tables, ti0, ti1):
    """move_particles (predict.c:31-104): drift ALL particles ti0 -> ti1,
    plus SPH predicted-quantity extrapolation (predict.c:55-76)."""
    dd = tables.drift_factor(ti0, ti1)
    pos = p.pos + p.vel * dd
    p = p.replace(pos=pos)
    if sph is not None:
        dt_grav = tables.gravkick_factor(ti0, ti1)
        dt_hydro = tables.hydrokick_factor(ti0, ti1)
        dt_drift = dd
        # under PMGRID the prediction includes the long-range force
        # (predict.c:58-61)
        grav_acc = p.accel + p.accel_pm if cfg.pmgrid else p.accel
        vel_pred = sph.vel_pred + grav_acc * dt_grav + \
            sph.hydro_accel * dt_hydro
        # density/hsml extrapolated via div(v) (predict.c:62-74)
        ex = sph.div_vel * dt_drift
        density = sph.density * jnp.exp(-ex)
        hsml = sph.hsml * jnp.exp(ex / 3.0)
        # MinGasHsml floor (predict.c:69-71); only gas rows (hsml > 0 —
        # zero marks non-gas throughout the tree machinery)
        min_hsml = cfg.min_gas_hsml_fractional * cfg.softening[0] * 2.8
        if min_hsml > 0:
            hsml = jnp.where(sph.hsml > 0,
                             jnp.maximum(hsml, min_hsml), hsml)
        # re-predicted pressure (predict.c:74): entropy advanced from the
        # particle's own step start to the new current time
        dt_entr = (jnp.asarray(ti1, jnp.float32)
                   - p.ti_begstep.astype(jnp.float32)) * timebase_interval(cfg)
        pressure = (sph.entropy + sph.dt_entropy * dt_entr) \
            * density ** cfg.gamma
        sph = sph.replace(vel_pred=vel_pred, density=density, hsml=hsml,
                          pressure=pressure)
    return p, sph


def box_wrap(cfg, p):
    """do_box_wrapping (predict.c:106-134); per-axis sizes under
    LONG_X/Y/Z (predict.c:114-122)."""
    if not cfg.periodic or cfg.box_size <= 0:
        return p
    box = jnp.asarray(cfg.box_sizes, p.pos.dtype)
    return p.replace(pos=jnp.mod(p.pos, box))

"""Simulation driver: the main loop (reference run.c:20-141, begrun.c, init.c).

Host-side orchestration of jitted device kernels:

    while ti_current < TIMEBASE:
        min_glob = min(ti_endstep)            # global sync point (run.c:165)
        write any snapshots due in (ti_current, min_glob]
        drift all particles -> min_glob       # predict.c
        compute forces for the active set     # accel.c -> solver
        energy statistics if due              # global.c
        kick active set, assign new steps     # timestep.c

The active subset is gathered into power-of-two padded index buckets so jit
sees a small number of static shapes while small-step particles stay cheap —
the TPU answer to the reference's per-particle adaptivity (timestep.c).
"""

from __future__ import annotations

import math
import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import SimulationConfig
from ..cosmology import make_tables
from ..diagnostics.energy import compute_global_quantities, format_energy_line
from ..io.gadget_format import (SnapshotData, SnapshotHeader, read_snapshot,
                                write_snapshot)
from ..models.wiring import build_wiring
from ..ops.solver import GravitySolver
from ..ops.sph import HydroSolver
from ..particles import Particles, SphState
from ..units import set_units
from .kdk import box_wrap, drift, kick
from .timeline import ti_to_time, time_to_ti, timebase_interval


def _bucket(n: int, minimum: int = 256) -> int:
    return max(minimum, 1 << math.ceil(math.log2(max(n, 1))))


def build_snapshot_data(cfg, units, tables, tbi, p, sph, n_gas,
                        ti_current, time_now, entropy_is_u=False,
                        pm_window=None):
    """Assemble a SnapshotData from integrator state (fill_write_buffer,
    io.c:129-351): velocities predicted to now with half-kick factors,
    per-type constant masses lifted into the header table, entropy
    converted to internal energy, comoving->physical output factors.

    `p`/`sph` are pytrees in type-sorted order (gas first); shared by the
    single-chip Simulation and the DistributedSimulation after gathering.
    """
    from ..diagnostics.energy import predicted_velocities

    vel = predicted_velocities(p, tables, ti_current, sph=sph,
                               pm_window=pm_window)
    if cfg.comoving_integration:
        # snapshot velocity convention: file vel = internal vel / a^(3/2)
        # (io.c:239-240; inverse of init.c:95-101)
        vel = vel * time_now ** -1.5
    p_np = jax.device_get((p.pos, vel, p.mass, p.pid, p.ptype, p.potential))
    pos, vel, mass, pid, ptype, pot = [np.asarray(x) for x in p_np]
    h = SnapshotHeader()
    counts = np.bincount(ptype, minlength=6).astype(np.int32)
    h.npart = counts
    h.npart_total = counts.astype(np.uint32)
    h.time = time_now
    h.redshift = 1.0 / time_now - 1 if cfg.comoving_integration else 0.0
    h.box_size = cfg.box_size
    h.omega0, h.omega_lambda, h.hubble_param = \
        cfg.omega0, cfg.omega_lambda, cfg.hubble_param
    # per-type constant masses go to the header table (io.c block rules)
    mass_tab = np.zeros(6)
    for t in range(6):
        sel = ptype == t
        if sel.any():
            mt = mass[sel]
            if np.all(mt == mt[0]):
                mass_tab[t] = mt[0]
    h.mass = mass_tab
    data = SnapshotData(header=h, pos=pos, vel=vel, pid=pid.astype(np.uint32),
                        mass=mass.copy(), ptype=ptype,
                        pot=pot if cfg.output_potential else None)
    a3inv = fac1 = fac2 = 1.0
    if cfg.comoving_integration:
        # comoving->physical factors for output (io.c:149-156)
        a3inv = 1.0 / time_now ** 3
        fac1 = 1.0 / time_now ** 2
        fac2 = 1.0 / time_now ** (3 * cfg.gamma - 2)
    if sph is not None and n_gas:
        s = jax.device_get((sph.entropy, sph.density, sph.hsml,
                            sph.dt_entropy))
        ent, rho, hs, dent = [np.asarray(x)[:n_gas] for x in s]
        if entropy_is_u or cfg.isotherm_eqs:
            # density has not run yet, or IsothermEqs: the entropy
            # field holds u directly (io.c:270-271)
            data.u = ent
        else:
            # entropy -> specific internal energy (io.c:266-279)
            data.u = np.maximum(
                units.min_egy_spec,
                ent / cfg.gamma_minus1
                * np.maximum(rho * a3inv, 1e-37) ** cfg.gamma_minus1
            ).astype(np.float32)
        data.rho, data.hsml = rho, hs
        if cfg.output_change_of_entropy:
            data.dtentr = dent
    if cfg.output_acceleration:
        # physical acceleration: fac1*(tree+PM) + fac2*hydro for gas
        # (io.c:311-330)
        acc = np.asarray(jax.device_get(p.accel + p.accel_pm))
        acc = fac1 * acc
        if sph is not None and n_gas:
            hacc = np.asarray(jax.device_get(sph.hydro_accel))[:n_gas]
            acc[:n_gas] += fac2 * hacc
        data.accel = acc.astype(np.float32)
    if cfg.output_timestep:
        # (Ti_endstep - Ti_begstep) * Timebase_interval (io.c:343-351)
        tbeg, tend = jax.device_get((p.ti_begstep, p.ti_endstep))
        data.tstp = ((np.asarray(tend) - np.asarray(tbeg))
                     * tbi).astype(np.float32)
    return data


def load_initial_conditions(cfg, units, ic_path=None):
    """read_ic (read_ic.c:31-146): load ICs into (Particles, SphState|None),
    with InitGasTemp defaulting and the entropy floor.  The SPH entropy
    field holds the IC internal energy u; the runner converts u -> A at the
    first force computation (init.c:170-174)."""
    path = ic_path or cfg.init_cond_file
    snap = read_snapshot(path, expect_format=cfg.ic_format or None)
    vel_ic = snap.vel
    if cfg.comoving_integration:
        # comoving velocity variable: internal vel = file vel * a^(3/2)
        # (init.c:95-101)
        vel_ic = np.asarray(vel_ic) * cfg.time_begin ** 1.5
    particles = Particles.create(snap.pos, vel_ic, snap.mass,
                                 snap.pid, snap.ptype, cfg.type_to_grav)
    ngas = int(snap.header.npart[0])
    sph = None
    if ngas > 0:
        sph = SphState.zeros(particles.n)
        u_ic = np.zeros(ngas, np.float32) if snap.u is None \
            else np.asarray(snap.u, np.float32).copy()
        if cfg.init_gas_temp > 0:
            # read_ic.c:114-143: gas with u == 0 starts at InitGasTemp;
            # mean molecular weight assumes full ionization above 1e4 K,
            # neutral below.  Under IsothermEqs u = kT/mp with no
            # 1/(gamma-1) or mu (read_ic.c:121-132)
            u0 = ((C.BOLTZMANN / C.PROTONMASS) * cfg.init_gas_temp
                  / units.unit_energy_in_cgs * units.unit_mass_in_g)
            if not cfg.isotherm_eqs:
                yhe = (1 - C.HYDROGEN_MASSFRAC) / (4 * C.HYDROGEN_MASSFRAC)
                if cfg.init_gas_temp > 1e4:
                    mu = (1 + 4 * yhe) / (1 + 3 * yhe + 1)
                else:
                    mu = (1 + 4 * yhe) / (1 + yhe)
                u0 = u0 / (cfg.gamma_minus1 * mu)
            u_ic = np.where(u_ic == 0, np.float32(u0), u_ic)
        # entropy floor (read_ic.c:145-146)
        u_ic = np.maximum(u_ic, units.min_egy_spec)
        u = jnp.zeros(particles.n).at[:ngas].set(jnp.asarray(u_ic))
        sph = sph.replace(entropy=u)  # converted to entropy later
    return particles, sph


def write_snapshot_files(cfg, path, data):
    """Route a SnapshotData to format 1/2/HDF5, single- or multi-file
    (savepositions/distribute_file, io.c:33-112)."""
    if cfg.num_files_per_snapshot > 1:
        from ..io.gadget_format import write_snapshot_multi
        write_snapshot_multi(
            path, data, cfg.num_files_per_snapshot,
            snap_format=cfg.snap_format, with_pot=cfg.output_potential,
            longids=cfg.longids,
            max_parallel=cfg.num_files_written_in_parallel or None)
    elif cfg.snap_format == 3:
        from ..io.gadget_format import write_snapshot_hdf5
        write_snapshot_hdf5(path + ".hdf5", data,
                            with_pot=cfg.output_potential,
                            longids=cfg.longids)
    else:
        write_snapshot(path, data, snap_format=cfg.snap_format,
                       with_pot=cfg.output_potential, longids=cfg.longids)
    return path


class Simulation:
    """begrun() + run() equivalent."""

    def __init__(self, cfg: SimulationConfig, particles: Particles | None = None,
                 sph: SphState | None = None, ic_path: str | None = None,
                 log_dir: str | None = None, segment_steps: int = 1):
        # segment_steps > 1 opts into the device-resident multi-step
        # segment for the fused fast path (headless runs only): up to that
        # many consecutive sync points run inside one lax.while_loop
        # dispatch.  Physics is bitwise-identical to single stepping (the
        # non-comoving kick ignores wall time); step()'s granularity
        # coarsens, which is why it is opt-in.
        self._segment_cap = max(1, int(segment_steps))
        self.cfg = cfg
        self.units = set_units(cfg)
        self.wiring = build_wiring(cfg)
        self.tables = make_tables(cfg, self.units)
        self.tbi = timebase_interval(cfg)

        # softening tables (gravtree.c:468-515): SofteningTable is the
        # Plummer-equivalent; ForceSoftening = 2.8x that.  Comoving runs clamp
        # by the MaxPhys values (handled in set_softenings_at).
        self.soft_table = np.array(cfg.softening, np.float32)
        self.force_soft = self.soft_table * C.SOFTFAC_SPLINE

        if particles is None:
            particles, sph_ic = load_initial_conditions(
                cfg, self.units, ic_path=ic_path)
            if sph is None:
                sph = sph_ic
        self.p = particles
        self.sph = sph
        self.n_gas = int(np.asarray(self.p.ptype == 0).sum()) if sph is not None else 0
        if self.sph is not None and self.n_gas > 0 \
                and float(jnp.max(self.sph.hsml)) == 0.0:
            # initial smoothing-length guess (setup_smoothinglengths,
            # init.c:218): from the mean gas interparticle separation
            gas = np.asarray(self.p.ptype) == 0
            gpos = np.asarray(self.p.pos)[gas]
            ext = gpos.max(0) - gpos.min(0)
            if cfg.twodims:
                # 2D guess (init.c:245-251)
                area = float(ext[0] * ext[1] + 1e-30)
                if cfg.periodic and cfg.box_size > 0:
                    area = cfg.box_sizes[0] * cfg.box_sizes[1]
                h0 = (area * cfg.des_num_ngb
                      / (math.pi * max(self.n_gas, 1))) ** 0.5
            else:
                vol = float(np.prod(ext) + 1e-30)
                if cfg.periodic and cfg.box_size > 0:
                    bx, by, bz = cfg.box_sizes
                    vol = bx * by * bz
                h0 = (3 * vol * cfg.des_num_ngb
                      / (4 * math.pi * max(self.n_gas, 1))) ** (1.0 / 3)
            hs = jnp.where(jnp.asarray(gas), jnp.float32(h0), 0.0)
            self.sph = self.sph.replace(hsml=hs)

        if cfg.comoving_integration and cfg.periodic and cfg.box_size > 0:
            # check_omega (init.c:181-208): total box mass must match the
            # cosmology; a mismatch means ICs and parameterfile disagree
            mtot = float(jnp.sum(self.p.mass))
            G = self.units.G
            hub = self.units.hubble
            omega = mtot / cfg.box_size ** 3 \
                / (3 * hub * hub / (8 * math.pi * G))
            if abs(omega - cfg.omega0) > 1e-2 * max(cfg.omega0, 1e-10):
                import warnings
                warnings.warn(
                    f"IC mass implies Omega0={omega:.4g} but the "
                    f"parameterfile says {cfg.omega0:.4g} (check_omega, "
                    "init.c:181-208)")

        self.ti_current = 0
        self.flag_fullstep = True
        self.dt_displacement = cfg.max_size_timestep  # refined per PM step
        # PM (long-range) integer-timeline state (timestep.c:350-408)
        self.pm_ti_begstep = 0
        self.pm_ti_endstep = 0
        self.num_force_updates = 0
        self.step_count = 0
        self.snapshot_count = 0

        # log files (begrun.c:202-255).  log_dir semantics:
        #   log_dir="" (explicit)  -> HEADLESS: no log files are opened, so
        #       the device-resident fused segments run without per-step
        #       host log formatting; snapshots/restarts, if any, fall back
        #       to a scratch tmpdir created lazily.
        #   log_dir=None (default) -> cfg.output_dir; an unset OutputDir
        #       falls back to a scratch tmpdir (cleaned at exit) rather
        #       than littering the CWD with snapshots/logs.
        self.log_dir = log_dir if log_dir is not None else cfg.output_dir
        if not self.log_dir and log_dir is None:
            from ..utils import scratch_output_dir
            self.log_dir = scratch_output_dir()
        self._logs = {}
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            for key, fname in [("info", cfg.info_file), ("energy", cfg.energy_file),
                               ("cpu", cfg.cpu_file), ("timings", cfg.timings_file)]:
                self._logs[key] = open(os.path.join(self.log_dir, fname), "w")

        self._next_output = self._first_output_time()
        self._next_stats = cfg.time_begin
        self.cpu_timers = {k: 0.0 for k in
                           ["total", "gravity", "drift", "timeline", "snapshot",
                            "potential", "hydro", "domain"]}
        self._build_kernels()

        if cfg.adaptive_gravsoft_forgas and self.sph is not None \
                and self.n_gas > 0:
            # the gas gravitational softening is Hsml, so converge the
            # smoothing lengths BEFORE the first force computation, like
            # init()'s setup_smoothinglengths -> density() (init.c:159-218)
            from ..ops.tree import build_tree
            fsoft = jnp.asarray(self.force_soft)[self.p.ptype]
            tree0 = build_tree(
                self.p.pos, self.p.mass, self.p.grav, fsoft,
                self.p.old_acc, self.sph.hsml,
                depth=self.solver.depth, n_gravs=cfg.n_gravs,
                bucket=cfg.tree_bucket_size,
                box_size=cfg.tree_box_size)
            self.sph = self.hydro.density(
                tree0, self.p, self.sph, self.ti_current, self.n_gas,
                self.solver.depth, float(self.tbi))

    # ------------------------------------------------------------------
    def _build_kernels(self):
        cfg, units, wiring = self.cfg, self.units, self.wiring
        tables = self.tables
        fsoft_by_type = jnp.asarray(self.force_soft)
        soft_by_type = jnp.asarray(self.soft_table)

        self.solver = GravitySolver(cfg, wiring, self.force_soft,
                                    self.soft_table, units.G,
                                    hubble=units.hubble)
        self.hydro = HydroSolver(cfg, units) if self.sph is not None else None
        self._forces_bootstrapped = False
        self._entropy_is_u = self.sph is not None and self.n_gas > 0

        def drift_fn(p, sph, ti0, ti1):
            p, sph = drift(cfg, p, sph, tables, ti0, ti1)
            return box_wrap(cfg, p), sph

        self._drift = jax.jit(drift_fn)

        if cfg.pseudosymmetric:
            def kick_fn(p, sph, ti_current, time_now, dt_disp, rnd):
                return kick(cfg, units, p, sph, tables, ti_current, dt_disp,
                            soft_by_type, time_now, rnd_table=rnd)
            # per-step refreshed 3000-entry random table, seed 42
            # (set_random_numbers, system.c:37; begrun.c:54-55)
            self._rnd_rng = np.random.default_rng(42)
        else:
            def kick_fn(p, sph, ti_current, time_now, dt_disp):
                return kick(cfg, units, p, sph, tables, ti_current, dt_disp,
                            soft_by_type, time_now)

        self._kick = jax.jit(kick_fn)

        if cfg.flexsteps:
            # FLEXSTEPS state (init.c:123-129): ID-keyed random phase per
            # particle from a 3000-entry table (get_random_number,
            # system.c:29-47 — processor-count-independent randomness)
            rnd = np.random.default_rng(42).random(3000)
            self.flex_grp = jnp.asarray(
                (C.TIMEBASE * rnd[np.asarray(self.p.pid) % 3000])
                .astype(np.int64).astype(np.int32))
            self.present_min_step = C.TIMEBASE
            self.present_max_step = C.TIMEBASE

            def flex_kick_fn(p, sph, ti_current, time_now, dt_disp,
                             flex_grp, pmin_step, pmax_step):
                return kick(cfg, units, p, sph, tables, ti_current, dt_disp,
                            soft_by_type, time_now,
                            flex=(flex_grp, pmin_step, pmax_step))

            self._flex_kick = jax.jit(flex_kick_fn)

            def flex_min_fn(p, sph, ti_current, time_now, dt_disp):
                from .kdk import compute_timestep_ticks, cosmo_factors
                cf = cosmo_factors(cfg, units, time_now)
                ti_step = compute_timestep_ticks(cfg, units, p, sph, cf,
                                                 dt_disp, soft_by_type)
                active = p.ti_endstep == ti_current
                return jnp.min(jnp.where(active, ti_step, C.TIMEBASE))

            self._flex_min = jax.jit(flex_min_fn)

        def pm_kick_fn(p, sph, tstart, tend, ti_current, pm_beg, pm_end):
            """Long-range kick of ALL particles over the PM midpoint window,
            plus the gas VelPred re-prediction (timestep.c:350-408)."""
            dt = tables.gravkick_factor(jnp.asarray([tstart], jnp.int32),
                                        jnp.asarray([tend], jnp.int32))[0]
            p = p.replace(vel=p.vel + p.accel_pm * dt)
            if sph is not None:
                # VelPred = Vel + GravAccel*dtA + Hydro*dtH + GravPM*dtB
                # (timestep.c:392-406); dtB rewinds to the new PM midpoint
                mid = (p.ti_begstep + p.ti_endstep) // 2
                dt_a = tables.gravkick_factor(p.ti_begstep, ti_current) \
                    - tables.gravkick_factor(p.ti_begstep, mid)
                dt_h = tables.hydrokick_factor(p.ti_begstep, ti_current) \
                    - tables.hydrokick_factor(p.ti_begstep, mid)
                dt_b = -tables.gravkick_factor(
                    jnp.asarray([pm_beg], jnp.int32),
                    jnp.asarray([(pm_beg + pm_end) // 2], jnp.int32))[0]
                vp = p.vel + p.accel * dt_a[:, None] \
                    + sph.hydro_accel * dt_h[:, None] + p.accel_pm * dt_b
                is_gas = p.ptype == 0
                sph = sph.replace(vel_pred=jnp.where(is_gas[:, None], vp,
                                                     sph.vel_pred))
            return p, sph

        self._pm_kick = jax.jit(pm_kick_fn)

        def dt_disp_fn(p, atime):
            """find_dt_displacement_constraint (timestep.c:587-651): global
            RMS-displacement limit per type, from the minimum particle mass
            vs the component's mean cosmic density (gas: OmegaBaryon, else
            Omega0-OmegaBaryon), mesh-aware under PMGRID.  Only active for
            comoving runs; otherwise dt stays MaxSizeTimestep
            (timestep.c:596-597)."""
            dt_min = jnp.asarray(cfg.max_size_timestep, jnp.float32)
            if not cfg.comoving_integration:
                return dt_min
            a = atime
            h2 = (cfg.omega0 / (a * a * a)
                  + (1 - cfg.omega0 - cfg.omega_lambda) / (a * a)
                  + cfg.omega_lambda)
            hfac = units.hubble * jnp.sqrt(h2) * a * a  # a^2 H(a)
            rho_fac = 3 * units.hubble ** 2 / (8 * math.pi * units.G)
            for t in range(6):
                sel = p.ptype == t
                count = jnp.sum(sel)
                v2 = jnp.sum(jnp.where(sel[:, None], p.vel ** 2, 0.0))
                vrms = jnp.sqrt(v2 / jnp.maximum(count, 1))
                min_mass = jnp.min(jnp.where(sel, p.mass, jnp.inf))
                omega_t = cfg.omega_baryon if t == 0 \
                    else cfg.omega0 - cfg.omega_baryon
                dmean = (min_mass
                         / jnp.maximum(omega_t * rho_fac, 1e-37)) ** (1.0 / 3)
                if cfg.pmgrid:
                    dmean = jnp.minimum(
                        dmean, cfg.asmth * cfg.box_size / cfg.pmgrid)
                dt_t = (cfg.max_rms_displacement_fac * hfac * dmean
                        / jnp.maximum(vrms, 1e-30))
                dt_min = jnp.where(count > 0, jnp.minimum(dt_min, dt_t),
                                   dt_min)
            return dt_min

        self._dt_disp = jax.jit(dt_disp_fn)

        def active_info(p, ti_current):
            mask = p.ti_endstep == ti_current
            return jnp.sum(mask), jnp.min(p.ti_endstep)

        self._active_info = jax.jit(active_info)

        def next_sync_info(p):
            min_next = jnp.min(p.ti_endstep)
            return min_next, jnp.sum(p.ti_endstep == min_next)

        self._next_sync_info = jax.jit(next_sync_info)

        def gather_active(p, ti_current, size):
            mask = p.ti_endstep == ti_current
            idx = jnp.nonzero(mask, size=size, fill_value=-1)[0].astype(jnp.int32)
            return idx

        self._gather_active = jax.jit(gather_active, static_argnums=2)

        def zero_active_grav(p, ti_current):
            """NOGRAVITY (gravtree.c:368-374): zero GravAccel/potential of
            the active set."""
            act = p.ti_endstep == ti_current
            return p.replace(
                accel=jnp.where(act[:, None], 0.0, p.accel),
                potential=jnp.where(act, 0.0, p.potential))

        self._zero_active_grav = jax.jit(zero_active_grav)

        selmask = int(cfg.selective_no_gravity)

        def hide_selective(p, ti_current):
            """SELECTIVE_NO_GRAVITY (gravtree.c:86-90): flip Ti_endstep of
            masked types so the target gather skips them."""
            sel = ((1 << p.ptype) & selmask) != 0
            return p.replace(ti_endstep=jnp.where(
                sel, -p.ti_endstep - 1, p.ti_endstep))

        self._hide_selective = jax.jit(hide_selective)

        if cfg.min_size_timestep > 0 and not cfg.nostop_when_below_mintimestep:
            from .kdk import compute_timestep_dt, cosmo_factors as _cosmo

            def min_dt_active(p, sph, ti_current, time_now, dt_disp):
                """Smallest wanted dt of the active set, before the
                MinSizeTimestep floor (timestep.c:531-556)."""
                cf = _cosmo(cfg, units, time_now)
                dtp = compute_timestep_dt(cfg, units, p, sph, cf, dt_disp,
                                          soft_by_type)
                act = p.ti_endstep == ti_current
                return jnp.min(jnp.where(act, dtp, jnp.inf))

            self._min_dt_active = jax.jit(min_dt_active)
        else:
            self._min_dt_active = None

        def stats_fn(p, sph, ti_current, a3inv, atime, pm_beg, pm_end):
            return compute_global_quantities(
                cfg, p, sph, tables, ti_current, a3inv,
                pm_window=(pm_beg, pm_end) if cfg.pmgrid else None,
                atime=atime)

        self._stats = jax.jit(stats_fn)

        # --- fused fast-path step (pure N-body, direct solver) ---------
        # One device call per step: drift -> gather active -> pairwise
        # forces (no potential) -> KDK kick -> next-sync reduction.  This
        # removes the ~6 host<->device round trips of the general step —
        # the dominant cost once the force sweep itself is ~100ms.
        from ..ops.direct import direct_forces
        G = units.G
        box = cfg.box_size if cfg.periodic else 0.0

        def fused_one(s, p, ti_from, min_glob, time_now, dt_disp):
            p, _ = drift_fn(p, None, ti_from, min_glob)
            fsoft = fsoft_by_type[p.ptype]
            mask = p.ti_endstep == min_glob
            tgt = jnp.nonzero(mask, size=s, fill_value=-1)[0] \
                .astype(jnp.int32)
            acc, _ = direct_forces(
                wiring, p.pos, p.mass, p.grav, fsoft, tgt_idx=tgt,
                box=box, chunk=min(1024, s), want_pot=False,
                lattice_tables=self.solver.lattice_tables)
            acc = acc * G
            idx = jnp.where(tgt >= 0, tgt, p.n)
            new_acc = p.accel.at[idx].set(acc, mode="drop")
            amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
            new_old = p.old_acc.at[idx].set(amag, mode="drop")
            p = p.replace(accel=new_acc, old_acc=new_old)
            p, _ = kick(cfg, units, p, None, tables, min_glob, dt_disp,
                        soft_by_type, time_now)
            min_next = jnp.min(p.ti_endstep)
            n_active = jnp.sum(mask)
            n_next = jnp.sum(p.ti_endstep == min_next)
            return p, n_active, min_next, n_next

        def fused_step_fn(s, p, ti_from, min_glob, time_now, dt_disp):
            p, n_active, min_next, n_next = fused_one(
                s, p, ti_from, min_glob, time_now, dt_disp)
            return p, jnp.stack([n_active.astype(jnp.int32), min_next,
                                 n_next.astype(jnp.int32)])

        self._fused_step = jax.jit(fused_step_fn, static_argnums=0)
        self._fused_info = None  # (min_glob, n_active) from the last call

        # --- device-resident multi-step segment ------------------------
        # The reference's main loop is paced by the host (run.c:32-132);
        # with a tunneled/remote accelerator each step pays a full host
        # round trip.  This variant runs consecutive fused steps inside
        # one lax.while_loop while (a) the next sync point stays strictly
        # before ti_stop (the next snapshot/statistics boundary), (b) its
        # active set fits the static `s` bucket, and (c) the segment cap
        # isn't hit — one dispatch per segment instead of per step.
        # Non-comoving only (the fast path already excludes comoving), so
        # the sync-point time is ti-linear and computable on device.
        tbi_f = float(self.tbi)
        seg_cap = self._segment_cap

        def fused_multistep_fn(s, p, ti_from, min_glob, n_act, ti_stop,
                               dt_disp):
            def cond(c):
                p, ti_cur, min_nxt, n_nxt, updates, steps, last_act = c
                return ((steps < seg_cap) & (min_nxt <= ti_stop)
                        & ((steps == 0) | (min_nxt > ti_cur))
                        & (n_nxt <= s))

            def body(c):
                p, ti_cur, min_nxt, n_nxt, updates, steps, last_act = c
                time_now = jnp.float32(cfg.time_begin) \
                    + min_nxt.astype(jnp.float32) * jnp.float32(tbi_f)
                p, n_active, min2, n2 = fused_one(
                    s, p, ti_cur, min_nxt, time_now, dt_disp)
                return (p, min_nxt, min2, n2,
                        updates + n_active.astype(jnp.int32),
                        steps + jnp.int32(1), n_active.astype(jnp.int32))

            c0 = (p, jnp.asarray(ti_from, jnp.int32),
                  jnp.asarray(min_glob, jnp.int32),
                  jnp.asarray(n_act, jnp.int32), jnp.int32(0),
                  jnp.int32(0), jnp.int32(0))
            p, ti_cur, min_nxt, n_nxt, updates, steps, last_act = \
                jax.lax.while_loop(cond, body, c0)
            return p, jnp.stack([ti_cur, min_nxt, n_nxt, updates, steps,
                                 last_act])

        self._fused_multi = jax.jit(fused_multistep_fn, static_argnums=0)
        self._tree_multi_cache = {}

    # ------------------------------------------------------------------
    def _get_tree_multi(self, s: int):
        """Device-resident multi-step segment for the TREE/TreePM solver.

        One jitted while_loop running consecutive KDK steps with the fused
        walk (ops/walk.py): drift -> [PM when due] -> build/refresh octree
        -> walk -> scatter+corrections -> kick [-> PM window/kick].  The
        TPU analog of the reference's whole main loop (run.c:32-132) with
        zero host round trips per step.  Walk-cap overflow freezes the
        state *before* the offending step (per-leaf select), stops the
        loop, and reports demands so the caller can grow caps and resume.
        """
        cfg, units, tables = self.cfg, self.units, self.tables
        solver = self.solver
        key = (s, solver.depth, solver.leaf_factor, solver.octet_caps,
               tuple(sorted(solver.fcaps.items())))
        if key in self._tree_multi_cache:
            return self._tree_multi_cache[key]
        from ..ops.tree import build_tree, drift_tree, refresh_tree
        from .timeline import pm_window_update

        walk = solver._walk(want_pot=False)
        fsoft_by_type = jnp.asarray(self.force_soft)
        soft_by_type = jnp.asarray(self.soft_table)
        G = units.G
        err_tol = cfg.err_tol_force_acc
        box_t = cfg.tree_box_size
        depth = solver.depth
        seg_cap = self._segment_cap
        tbi_f = float(self.tbi)
        rebuild_every = max(1, int(cfg.tree_domain_update_frequency
                                   * self.p.n))
        rel = jnp.asarray(cfg.type_of_opening_criterion == 1)
        comoving = cfg.comoving_integration

        def time_at_dev(ti):
            tf = ti.astype(jnp.float32) * jnp.float32(tbi_f)
            if comoving:
                return jnp.float32(cfg.time_begin) * jnp.exp(tf)
            return jnp.float32(cfg.time_begin) + tf

        # tree maintenance cadence (the reference's scheme): full rebuild
        # every TreeDomainUpdateFrequency*N force updates (domain.c:76),
        # moment RE-AGGREGATION every few steps, and in between the tree
        # only DRIFTS (node CMs move with node velocities, the cheap
        # elementwise dynamic update of predict.c:83-90) — re-aggregating
        # every step cost ~10x the walk itself at small active sets
        REFRESH_EVERY = 8

        def make_tree(p, tree_c, wt_c, mode, dd):
            """Tree + packed walk-table maintenance on the reference's
            cadence: drift steps only move positions/CMs elementwise
            (tables drift too — no layout derivation, no re-scatter);
            refreshes re-aggregate moments and repack values on the
            CACHED octet layout; rebuilds re-derive everything."""
            fsoft = fsoft_by_type[p.ptype]
            aold = err_tol * p.old_acc / G
            zero_h = jnp.zeros_like(p.mass)

            def _build(tc, wc):
                tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                                  zero_h, depth=depth, n_gravs=cfg.n_gravs,
                                  bucket=cfg.tree_bucket_size,
                                  box_size=box_t,
                                  group_size=cfg.walk_group_size,
                                  vel=p.vel)
                return tree, walk.pack_tables(tree)

            def _refresh(tc, wc):
                tree = refresh_tree(tc, p.pos, p.mass, p.grav, fsoft, aold,
                                    zero_h, depth=depth,
                                    n_gravs=cfg.n_gravs,
                                    bucket=cfg.tree_bucket_size,
                                    vel=p.vel)
                return tree, walk.pack_tables(
                    tree, layout=(wc.slot8, wc.child_oct, wc.layout_ovf))

            def _drift(tc, wc):
                return drift_tree(tc, dd), walk.drift_tables(wc, dd)

            return jax.lax.switch(mode, [_drift, _refresh, _build],
                                  tree_c, wt_c)

        def tree_one(p, ti_from, min_glob, time_now, dt_disp, tree_c, wt_c,
                     since, since_agg, pm_beg, pm_end):
            dd_step = tables.drift_factor(ti_from, min_glob)
            p, _ = self._drift(p, None, ti_from, min_glob)
            if cfg.pmgrid:
                def pm_on(p):
                    return p.replace(accel_pm=solver.pm.forces(
                        p.pos, p.mass, p.grav))
                p = jax.lax.cond(min_glob == pm_end, pm_on, lambda p: p, p)
            mask = p.ti_endstep == min_glob
            n_active = jnp.sum(mask)
            do_build = since >= rebuild_every
            do_agg = since_agg >= REFRESH_EVERY
            mode = jnp.where(do_build, 2, jnp.where(do_agg, 1, 0))
            tree, wt = make_tree(p, tree_c, wt_c, mode, dd_step)
            since = jnp.where(do_build, 0, since) \
                + n_active.astype(jnp.int32)
            since_agg = jnp.where(mode > 0, 0, since_agg + 1)
            mask_s = mask[tree.order]
            tgt = jnp.nonzero(mask_s, size=s, fill_value=-1)[0] \
                .astype(jnp.int32)
            res = walk(tree, tgt, rel=rel, tables=wt)
            valid = tgt >= 0
            orig = jnp.where(valid, tree.order[jnp.maximum(tgt, 0)], p.n)
            safe = jnp.minimum(orig, p.n - 1)
            acc, amag, _ = solver._apply_corr(
                p.pos[safe], p.mass[safe], p.grav[safe], res.acc * G,
                jnp.zeros_like(res.pot))
            p = p.replace(
                accel=p.accel.at[orig].set(acc, mode="drop"),
                old_acc=p.old_acc.at[orig].set(amag, mode="drop"),
                grav_cost=p.grav_cost.at[orig].set(
                    res.ninteract.astype(p.grav_cost.dtype), mode="drop"))
            if comoving and not cfg.no_pmstep_adjustment:
                # displacement constraint refresh on full steps
                # (timestep.c:63-68)
                full = n_active == p.n
                dt_disp = jnp.where(full, self._dt_disp(p, time_now),
                                    dt_disp)
            p, _ = kick(cfg, units, p, None, tables, min_glob, dt_disp,
                        soft_by_type, time_now)
            if cfg.pmgrid:
                def pm_kick_on(args):
                    p, pm_beg, pm_end = args
                    tstart, tend, nb, ne = pm_window_update(
                        min_glob, pm_beg, pm_end, dt_disp, tbi_f)
                    dt = tables.gravkick_factor(
                        jnp.asarray([tstart], jnp.int32),
                        jnp.asarray([tend], jnp.int32))[0]
                    return (p.replace(vel=p.vel + p.accel_pm * dt), nb, ne)

                p, pm_beg, pm_end = jax.lax.cond(
                    min_glob == pm_end, pm_kick_on, lambda a: a,
                    (p, pm_beg, pm_end))
            min_next = jnp.min(p.ti_endstep)
            n_next = jnp.sum(p.ti_endstep == min_next)
            nia_sum = jnp.sum(jnp.where(valid, res.ninteract, 0))
            return (p, n_active, min_next, n_next, tree, wt, since,
                    since_agg, pm_beg, pm_end, dt_disp, res.overflow,
                    nia_sum,
                    jnp.concatenate(
                        [jnp.stack([res.max_ent, res.max_chunk,
                                    res.max_rows]), res.max_frontier]))

        def tree_multi_fn(p, ti_from, min_glob, n_act, ti_stop, dt_disp,
                          pm_beg, pm_end):
            fsoft = fsoft_by_type[p.ptype]
            aold = err_tol * p.old_acc / G
            tree0 = build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                               jnp.zeros_like(p.mass), depth=depth,
                               n_gravs=cfg.n_gravs,
                               bucket=cfg.tree_bucket_size, box_size=box_t,
                               group_size=cfg.walk_group_size, vel=p.vel)
            wt0 = walk.pack_tables(tree0)
            stats0 = jnp.zeros((3 + depth + 1,), jnp.int32)

            def cond(c):
                (p, ti_cur, min_nxt, n_nxt, updates, steps, last_act,
                 tree, wt, since, since_agg, pm_b, pm_e, dtd, ovf, stats,
                 rec) = c
                go = ((steps < seg_cap) & (min_nxt <= ti_stop)
                      & ((steps == 0) | (min_nxt > ti_cur))
                      & (n_nxt <= s) & ~ovf)
                if cfg.pmgrid:
                    # a PM step forces full sync (run.c:175-181): segments
                    # stop right before a PM boundary crossing would be
                    # mishandled — min_nxt > pm_e can't happen (PM is a sync
                    # point for everyone), but guard anyway
                    go = go & (min_nxt <= pm_e)
                return go

            def body(c):
                (p0, ti_cur, min_nxt, n_nxt, updates, steps, last_act,
                 tree0_, wt0_, since0, sagg0, pm_b0, pm_e0, dtd0, ovf,
                 stats, rec) = c
                time_now = time_at_dev(min_nxt)
                (p1, n_active, min2, n2, tree1, wt1, since1, sagg1, pm_b1,
                 pm_e1, dtd1, ovf1, nia1, st1) = tree_one(
                    p0, ti_cur, min_nxt, time_now, dtd0, tree0_, wt0_,
                    since0, sagg0, pm_b0, pm_e0)
                keep = ~ovf1
                sel = lambda a, b: jax.tree_util.tree_map(
                    lambda x, y: jnp.where(keep, x, y), a, b)
                p = sel(p1, p0)
                tree = sel(tree1, tree0_)
                wt = sel(wt1, wt0_)
                since = jnp.where(keep, since1, since0)
                sagg = jnp.where(keep, sagg1, sagg0)
                pm_b = jnp.where(keep, pm_b1, pm_b0)
                pm_e = jnp.where(keep, pm_e1, pm_e0)
                dtd = jnp.where(keep, dtd1, dtd0)
                # per-step log record (ti, active, interactions)
                rec = rec.at[jnp.where(keep, steps, seg_cap)].set(
                    jnp.stack([min_nxt, n_active.astype(jnp.int32),
                               jnp.minimum(nia1, 2**31 - 1)
                               .astype(jnp.int32)]), mode="drop")
                return (p, jnp.where(keep, min_nxt, ti_cur),
                        jnp.where(keep, min2, min_nxt),
                        jnp.where(keep, n2, n_nxt),
                        updates + jnp.where(keep,
                                            n_active.astype(jnp.int32), 0),
                        steps + jnp.where(keep, 1, 0),
                        jnp.where(keep, n_active.astype(jnp.int32),
                                  last_act),
                        tree, wt, since, sagg, pm_b, pm_e, dtd,
                        ovf | ovf1, jnp.maximum(stats, st1), rec)

            c0 = (p, jnp.asarray(ti_from, jnp.int32),
                  jnp.asarray(min_glob, jnp.int32),
                  jnp.asarray(n_act, jnp.int32), jnp.int32(0),
                  jnp.int32(0), jnp.int32(0), tree0, wt0, jnp.int32(0),
                  jnp.int32(0),
                  jnp.asarray(pm_beg, jnp.int32),
                  jnp.asarray(pm_end, jnp.int32),
                  jnp.asarray(dt_disp, jnp.float32),
                  jnp.zeros((), bool), stats0,
                  jnp.zeros((seg_cap, 3), jnp.int32))
            (p, ti_cur, min_nxt, n_nxt, updates, steps, last_act, _tree,
             _wt, _since, _sagg, pm_b, pm_e, dtd, ovf, stats, rec) = \
                jax.lax.while_loop(cond, body, c0)
            info = jnp.stack([ti_cur, min_nxt, n_nxt, updates, steps,
                              last_act, pm_b, pm_e,
                              ovf.astype(jnp.int32)])
            return p, info, dtd, stats, rec

        fn = jax.jit(tree_multi_fn)
        self._tree_multi_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def _first_output_time(self):
        cfg = self.cfg
        if cfg.output_list_on and cfg.output_list_filename:
            with open(cfg.output_list_filename) as f:
                self._output_list = sorted(float(x) for x in f.read().split())
            for t in self._output_list:
                if t > cfg.time_begin:
                    return t
            return float("inf")
        self._output_list = None
        t = cfg.time_of_first_snapshot
        while t <= self.cfg.time_begin:
            if cfg.time_bet_snapshot <= 0:
                return float("inf")
            t += cfg.time_bet_snapshot
        return t

    def _advance_output_time(self):
        if self._output_list is not None:
            nxt = [t for t in self._output_list if t > self._next_output]
            self._next_output = nxt[0] if nxt else float("inf")
        else:
            self._next_output += self.cfg.time_bet_snapshot

    # ------------------------------------------------------------------
    def time_at(self, ti) -> float:
        return float(ti_to_time(self.cfg, ti))

    @property
    def time(self) -> float:
        return self.time_at(self.ti_current)

    def compute_forces(self, full: bool = False):
        """compute_accelerations (accel.c:24) for the active set."""
        t0 = _time.time()
        if full:
            n_active = self.p.n
            if self.cfg.pmgrid and not self.cfg.no_gravity:
                # a FULL force computation refreshes the long-range PM
                # force too (long_range_force, accel.c:34-42) — the step
                # loop gates PM by its own timeline, but standalone
                # full-force callers (FORCETEST, tpmfp/rdep harnesses,
                # update_full_potential) need a current accel_pm
                self.p = self.p.replace(
                    accel_pm=self.solver.pm_forces(self.p))
        else:
            n_act, _ = self._active_info(self.p, self.ti_current)
            n_active = int(n_act)
        if n_active == 0:
            return
        hsml = self.sph.hsml if self.sph is not None else None
        tree = None
        n_ia = 0
        if self.cfg.no_gravity:
            # NOGRAVITY (gravtree.c:368-374): active particles get zero
            # gravitational acceleration; SPH still runs below
            self.p = self._zero_active_grav(self.p, self.ti_current)
        else:
            p_solve = self.p
            saved_endstep = None
            if self.cfg.selective_no_gravity:
                # SELECTIVE_NO_GRAVITY (gravtree.c:86-90): types whose bit
                # is set are hidden from the target gather (they stay
                # sources in the tree), exactly the reference's Ti_endstep
                # flip trick
                saved_endstep = self.p.ti_endstep
                p_solve = self._hide_selective(self.p, self.ti_current)
            if not self._forces_bootstrapped \
                    and self.cfg.type_of_opening_criterion == 1 \
                    and not self.solver.uses_direct(self.p.n):
                # relative criterion needs OldAcc: bootstrap with the
                # geometric criterion, then recompute (accel.c:48-52)
                p_solve, _, _ = self.solver.compute(p_solve, self.ti_current,
                                                    n_active, opening="bh",
                                                    hsml=hsml)
            self._forces_bootstrapped = True
            p_solve, n_ia, tree = self.solver.compute(p_solve,
                                                      self.ti_current,
                                                      n_active, hsml=hsml)
            if saved_endstep is not None:
                p_solve = p_solve.replace(ti_endstep=saved_endstep)
            self.p = p_solve
            self.p.accel.block_until_ready()
        self.num_force_updates += n_active
        dt = _time.time() - t0
        self.cpu_timers["gravity"] += dt

        # --- SPH: density + smoothing lengths, then hydro (accel.c:60-89) ---
        if self.sph is not None and self.n_gas > 0:
            t1 = _time.time()
            n_gas_act = int(jnp.sum(
                (self.p.ti_endstep == self.ti_current)
                & (self.p.ptype == 0)))
            if n_gas_act > 0:
                if tree is None:
                    from ..ops.tree import build_tree
                    fsoft = jnp.asarray(self.force_soft)[self.p.ptype]
                    tree = build_tree(
                        self.p.pos, self.p.mass, self.p.grav, fsoft,
                        self.p.old_acc, self.sph.hsml,
                        depth=self.solver.depth, n_gravs=self.cfg.n_gravs,
                        bucket=self.cfg.tree_bucket_size,
                        box_size=self.cfg.tree_box_size)
                self.sph = self.hydro.density(
                    tree, self.p, self.sph, self.ti_current, n_gas_act,
                    self.solver.depth, float(self.tbi))
                if self._entropy_is_u:
                    # the IC carried internal energy u: convert to entropy
                    # A = (gamma-1) u / rho^(gamma-1) (init.c:170-174).
                    # Under IsothermEqs there is no conversion: the entropy
                    # variable stays u and P = u*rho (init.c:170 #ifndef)
                    gm1 = self.cfg.gamma_minus1
                    a3inv = 1.0 / self.time ** 3 \
                        if self.cfg.comoving_integration else 1.0
                    rho = jnp.maximum(self.sph.density * a3inv, 1e-37)
                    if self.cfg.isotherm_eqs:
                        ent = self.sph.entropy
                    else:
                        ent = gm1 * self.sph.entropy / rho ** gm1
                    gasm = self.p.ptype == 0
                    self.sph = self.sph.replace(
                        entropy=jnp.where(gasm, ent, self.sph.entropy),
                        pressure=jnp.where(
                            gasm, jnp.where(gasm, ent, 0.0)
                            * jnp.maximum(self.sph.density, 1e-37)
                            ** self.cfg.gamma, self.sph.pressure))
                    self._entropy_is_u = False
                self.sph = self.hydro.hydro(
                    tree, self.p, self.sph, self.ti_current, n_gas_act,
                    self.solver.depth, float(self.tbi), self.time)
            self.cpu_timers["hydro"] += _time.time() - t1
        if "timings" in self._logs and dt > 0:
            self._logs["timings"].write(
                f"Step {self.step_count}: forces for {n_active} particles "
                f"in {dt:.4f}s  part/sec={n_active / dt:.5g}  "
                f"ia/part={n_ia / max(n_active, 1):.1f}\n")

    def write_snapshot_now(self, path=None):
        """savepositions (io.c:33): snapshot with velocities predicted to now."""
        t0 = _time.time()
        cfg = self.cfg
        if cfg.output_potential:
            # OUTPUTPOTENTIAL: fresh all-particle potential for the POT
            # block (savepositions, io.c:41-49)
            self.update_full_potential()
        data = build_snapshot_data(
            cfg, self.units, self.tables, float(self.tbi), self.p, self.sph,
            self.n_gas, self.ti_current, self.time,
            entropy_is_u=self._entropy_is_u,
            pm_window=((self.pm_ti_begstep, self.pm_ti_endstep)
                       if cfg.pmgrid else None))
        if path is None:
            # never drop run artifacts into the CWD: a headless run
            # (log_dir="") falls back to a scratch temp directory
            out_dir = self.log_dir or cfg.output_dir
            if not out_dir:
                from ..utils import scratch_output_dir
                out_dir = getattr(self, "_tmp_out", None) or \
                    scratch_output_dir()
                self._tmp_out = out_dir
            path = os.path.join(
                out_dir,
                f"{cfg.snapshot_file_base}_{self.snapshot_count:03d}")
        write_snapshot_files(cfg, path, data)
        self.snapshot_count += 1
        self.cpu_timers["snapshot"] += _time.time() - t0
        return path

    def update_full_potential(self):
        """Refresh p.potential for ALL particles (compute_potential,
        potential.c:22: a dedicated all-particle pass; accelerations and
        OldAcc of inactive particles are left untouched)."""
        import jax.numpy as _jnp
        if self.cfg.no_gravity:
            # NOGRAVITY: no potential either (potential.c:26)
            self.p = self.p.replace(
                potential=_jnp.zeros_like(self.p.potential))
            return
        p_all = self.p.replace(ti_endstep=_jnp.full_like(
            self.p.ti_endstep, self.ti_current))
        hsml = self.sph.hsml if self.sph is not None else None
        p2, _, _ = self.solver.compute(p_all, self.ti_current, self.p.n,
                                       hsml=hsml, want_pot=True)
        pot = p2.potential
        if self.cfg.pmgrid:
            # long-range PM potential (potential.c:268-306)
            pot = pot + self.solver.pm.potential(self.p.pos, self.p.mass,
                                                 self.p.grav)
        self.p = self.p.replace(potential=pot)

    def energy_statistics(self):
        if self.cfg.compute_potential_energy:
            t0 = _time.time()
            self.update_full_potential()
            self.cpu_timers["potential"] += _time.time() - t0
        com = self.cfg.comoving_integration
        s = self._stats(self.p, self.sph, self.ti_current,
                        1.0 / self.time ** 3 if com else 1.0,
                        self.time if com else 1.0,
                        self.pm_ti_begstep, self.pm_ti_endstep)
        if "energy" in self._logs:
            self._logs["energy"].write(format_energy_line(self.time, s) + "\n")
            self._logs["energy"].flush()
        return s

    # ------------------------------------------------------------------
    def _segment_bounds(self):
        """(ti_stop, ok): largest tick strictly before the next snapshot /
        statistics boundary, or (0, False) when a boundary is due now."""
        cfg = self.cfg
        t_bound = self._next_output
        if cfg.time_bet_statistics > 0:
            t_bound = min(t_bound, self._next_stats)
        if t_bound < float("inf"):
            ti_stop = min(time_to_ti(cfg, t_bound), C.TIMEBASE)
            while ti_stop > 0 and t_bound <= self.time_at(ti_stop) + 1e-12:
                ti_stop -= 1
        else:
            ti_stop = C.TIMEBASE
        return ti_stop

    def _try_tree_segment(self) -> bool:
        """Device-resident multi-step segment on the TREE/TreePM solver
        (the production path).  Returns True if it advanced the state."""
        cfg = self.cfg
        if self._fused_info is None:
            min_glob, n_act = (int(x) for x in
                               self._next_sync_info(self.p))
        else:
            min_glob, n_act = self._fused_info
        t_sync = self.time_at(min_glob)
        if self._next_output <= t_sync + 1e-12:
            self._fused_info = None
            return False
        if cfg.time_bet_statistics > 0 and t_sync >= self._next_stats:
            self._fused_info = None
            return False
        # ONE segment program for every active-set size: walk cost is
        # active-block-proportional (tree-aligned blocks), so padding the
        # target list to N is nearly free, while re-jitting per active
        # bucket cost 5-8 minutes of compile at every bucket change
        s = _bucket(self.p.n)
        ti_stop = self._segment_bounds()
        if min_glob > ti_stop:
            self._fused_info = None
            return False
        self.solver.clamp_caps(self.p.n)
        for _attempt in range(6):
            fn = self._get_tree_multi(s)
            t_seg0 = _time.time()
            p2, info, dtd, stats, rec = fn(
                self.p, self.ti_current, min_glob, n_act, ti_stop,
                self.dt_displacement, self.pm_ti_begstep,
                self.pm_ti_endstep)
            (ti_cur, min_next, n_next, updates, steps, last_act, pm_b,
             pm_e, ovf) = (int(x) for x in jax.device_get(info))
            dt_seg = _time.time() - t_seg0
            # commit whatever completed cleanly (overflow freezes the
            # state before the offending step)
            self.p = p2
            self.ti_current = ti_cur
            self.dt_displacement = float(jax.device_get(dtd))
            self.pm_ti_begstep, self.pm_ti_endstep = pm_b, pm_e
            step0 = self.step_count
            self.num_force_updates += updates
            self.step_count += steps
            if steps:
                self.flag_fullstep = last_act == self.p.n
            self._fused_info = (min_next, n_next)
            self.solver._tree_cache = None  # segment trees are not cached
            if steps and self._logs:
                # per-step log lines from the gathered on-device records
                # (every_timestep_stuff, run.c:370-392; timings
                # gravtree.c:408-445) — wall time attributed evenly
                rows = jax.device_get(rec[:steps])
                per = dt_seg / steps
                for k, (ti_k, act_k, nia_k) in enumerate(rows):
                    if "info" in self._logs:
                        self._logs["info"].write(
                            f"Begin Step {step0 + k}, Time: "
                            f"{self.time_at(int(ti_k)):.8g}, "
                            f"Active: {int(act_k)} (segment)\n")
                    if "timings" in self._logs:
                        self._logs["timings"].write(
                            f"Step {step0 + k + 1}: forces for "
                            f"{int(act_k)} particles in {per:.4f}s  "
                            f"part/sec={int(act_k) / max(per, 1e-9):.5g}  "
                            f"ia/part={int(nia_k) / max(int(act_k), 1):.1f}"
                            "\n")
                for key in ("info", "timings"):
                    if key in self._logs:
                        self._logs[key].flush()
            if not ovf:
                return steps > 0
            # grow the walk caps to the measured demand and recompile
            caps_before = (dict(self.solver.fcaps), self.solver.octet_caps)
            stats_v = jax.device_get(stats)
            self.solver.grow_caps(int(stats_v[0]), int(stats_v[1]),
                                  int(stats_v[2]), stats_v[3:])
            if (dict(self.solver.fcaps),
                    self.solver.octet_caps) == caps_before:
                # no-progress overflow: the source is the octet LAYOUT
                # (mono region), which has no demand stat here.  Drop the
                # measured octet caps and bail to the general step path —
                # solver.compute rebuilds the tree and re-measures them
                # (the TreeAllocFactor regrow contract, forcetree.c:3176).
                self.solver.octet_caps = None
                self._fused_info = (min_next, n_next)
                return steps > 0
            min_glob, n_act = min_next, n_next
        raise RuntimeError(
            f"fused tree segment caps still overflowing at "
            f"{self.solver.fcaps}")

    # ------------------------------------------------------------------
    def _try_fast_step(self) -> bool:
        """Fused single-call step (direct solver) or device-resident
        segment (tree/TreePM solver).  Returns True if it handled the
        step."""
        cfg = self.cfg
        if (cfg.make_glass or cfg.force_test > 0
                or cfg.no_gravity or cfg.selective_no_gravity
                or cfg.pseudosymmetric or cfg.flexsteps
                or self._min_dt_active is not None
                or (self.sph is not None and self.n_gas > 0)):
            return False
        if not self.solver.uses_direct(self.p.n):
            # tree/TreePM production path.  Logged runs are admitted:
            # per-step info/timings lines are reconstructed from gathered
            # segment records, and segments stop at snapshot/statistics
            # boundaries so energy.txt timing is unchanged.
            if (self._segment_cap <= 1
                    or not self._forces_bootstrapped
                    or self.ti_current >= C.TIMEBASE):
                return False
            return self._try_tree_segment()
        if cfg.pmgrid or cfg.comoving_integration:
            return False
        if self._fused_info is None:
            min_glob, n_act = (int(x) for x in
                               self._next_sync_info(self.p))
        else:
            min_glob, n_act = self._fused_info
        t_sync = self.time_at(min_glob)
        if self._next_output <= t_sync + 1e-12:
            self._fused_info = None
            return False
        if cfg.time_bet_statistics > 0 and t_sync >= self._next_stats:
            self._fused_info = None
            return False
        s = min(_bucket(max(n_act, 1)), _bucket(self.p.n))

        if self._segment_cap > 1 and not self._logs:
            # headless (no per-step log lines wanted): run a whole segment
            # of steps on-device, bounded by the next snapshot/statistics
            # time — one host round trip for up to segment_steps steps
            t_bound = self._next_output
            if cfg.time_bet_statistics > 0:
                t_bound = min(t_bound, self._next_stats)
            if t_bound < float("inf"):
                ti_stop = min(time_to_ti(cfg, t_bound), C.TIMEBASE)
                while ti_stop > 0 \
                        and t_bound <= self.time_at(ti_stop) + 1e-12:
                    ti_stop -= 1
            else:
                ti_stop = C.TIMEBASE
            if min_glob <= ti_stop:
                self.p, info = self._fused_multi(
                    s, self.p, self.ti_current, min_glob, n_act, ti_stop,
                    self.dt_displacement)
                ti_cur, min_next, n_next, updates, steps, last_act = (
                    int(x) for x in jax.device_get(info))
                self.ti_current = ti_cur
                self.flag_fullstep = last_act == self.p.n
                self.num_force_updates += updates
                self.step_count += steps
                self._fused_info = (min_next, n_next)
                return True
            self._fused_info = None
            return False

        self.p, info = self._fused_step(s, self.p, self.ti_current,
                                        min_glob, t_sync,
                                        self.dt_displacement)
        n_active, min_next, n_next = (int(x) for x in jax.device_get(info))
        if n_active > s:  # bucket hint was stale: redo via the general path
            self._fused_info = None
            raise RuntimeError("fused-step bucket underflow")  # unreachable
        self.ti_current = min_glob
        self.flag_fullstep = n_active == self.p.n
        self.num_force_updates += n_active
        self.step_count += 1
        self._fused_info = (min_next, n_next)
        if "info" in self._logs:
            self._logs["info"].write(
                f"Begin Step {self.step_count - 1}, Time: {self.time:.8g}, "
                f"Active: {n_active}\n")
        return True

    def step(self):
        """One main-loop iteration (run.c:32-132)."""
        cfg = self.cfg
        t_step0 = _time.time()

        if self._try_fast_step():
            return

        # --- find next sync point (run.c:151-236) ---
        n_act, min_glob = self._active_info(self.p, self.ti_current)
        min_glob = int(min_glob)
        self._fused_info = None
        if cfg.pmgrid and min_glob > self.pm_ti_endstep:
            # a PM step forces a full synchronization (run.c:175-181)
            min_glob = self.pm_ti_endstep

        # snapshots due strictly before the sync point
        while self._next_output <= self.time_at(min_glob) + 1e-12 \
                and self._next_output < float("inf"):
            ti_out = min(time_to_ti(cfg, self._next_output), C.TIMEBASE)
            if ti_out > self.ti_current:
                self.p, self.sph = self._drift(self.p, self.sph,
                                               self.ti_current, ti_out)
                self.ti_current = ti_out
            self.write_snapshot_now()
            self._advance_output_time()

        # drift everyone to the sync point
        t0 = _time.time()
        if min_glob > self.ti_current:
            self.p, self.sph = self._drift(self.p, self.sph,
                                           self.ti_current, min_glob)
        self.ti_current = min_glob
        self.cpu_timers["drift"] += _time.time() - t0

        n_act, _ = self._active_info(self.p, self.ti_current)
        self.flag_fullstep = int(n_act) == self.p.n

        if "info" in self._logs:
            self._logs["info"].write(
                f"Begin Step {self.step_count}, Time: {self.time:.8g}, "
                f"Active: {int(n_act)}\n")

        # --- forces: long-range PM first when due (accel.c:34-42) ---
        if cfg.pmgrid and self.ti_current == self.pm_ti_endstep:
            t0 = _time.time()
            accel_pm = self.solver.pm_forces(self.p)
            self.p = self.p.replace(accel_pm=accel_pm)
            self.cpu_timers["pm"] = self.cpu_timers.get("pm", 0.0) \
                + _time.time() - t0
        self.compute_forces()

        # --- FORCETEST: direct-sum accuracy rows (gravtree_forcetest.c:28;
        # under PMGRID only on PM steps, :46-49; off under NOGRAVITY, :34) ---
        if cfg.force_test > 0 and not cfg.no_gravity \
                and (not cfg.pmgrid
                     or self.ti_current == self.pm_ti_endstep):
            from ..diagnostics.forcetest import force_test
            force_test(self)

        # --- statistics ---
        if cfg.time_bet_statistics > 0 and self.time >= self._next_stats:
            self.energy_statistics()
            self._next_stats += cfg.time_bet_statistics

        # --- MAKEGLASS (timestep.c:85-133): displace instead of kicking ---
        if cfg.make_glass:
            from .kdk import glass_step
            self.p = glass_step(cfg, self.units, self.p)
            self.p = self.p.replace(
                ti_begstep=jnp.where(self.p.ti_endstep == self.ti_current,
                                     self.p.ti_endstep, self.p.ti_begstep),
                ti_endstep=jnp.where(
                    self.p.ti_endstep == self.ti_current,
                    self.p.ti_endstep + max(
                        1, int(cfg.max_size_timestep / self.tbi)),
                    self.p.ti_endstep))
            self.step_count += 1
            return

        # --- kick + new timesteps ---
        t0 = _time.time()
        # displacement constraint refresh on full steps (timestep.c:63-68);
        # NOPMSTEPADJUSTMENT pins it to MaxSizeTimestep
        if cfg.no_pmstep_adjustment:
            self.dt_displacement = cfg.max_size_timestep
        elif self.flag_fullstep and cfg.comoving_integration:
            self.dt_displacement = float(self._dt_disp(self.p, self.time))
        if self._min_dt_active is not None:
            # stop when a particle wants dt below MinSizeTimestep
            # (timestep.c:531-556), unless NoStopBelowMinTimestep
            mn = float(self._min_dt_active(self.p, self.sph, self.ti_current,
                                           self.time, self.dt_displacement))
            if mn < cfg.min_size_timestep:
                raise RuntimeError(
                    f"timestep wants to be {mn:g}, below MinSizeTimestep="
                    f"{cfg.min_size_timestep:g} (timestep.c:531-556); set "
                    "NoStopBelowMinTimestep 1 to clamp instead")
        if cfg.flexsteps:
            # PresentMinStep doubling schedule + refresh from the active
            # set's smallest step (timestep.c:140-162)
            if (self.ti_current % (4 * self.present_min_step)) == 0 \
                    and self.present_min_step < C.TIMEBASE:
                self.present_min_step *= 2
            mn = int(self._flex_min(self.p, self.sph, self.ti_current,
                                    self.time, self.dt_displacement))
            self.present_min_step = min(self.present_min_step, mn)
            # PresentMaxStep from the displacement constraint
            # (timestep.c:164-175)
            from .timeline import pow2_floor_i32
            mx = max(1, min(int(min(self.dt_displacement,
                                    cfg.max_size_timestep) / self.tbi),
                            C.TIMEBASE))
            self.present_max_step = int(pow2_floor_i32(
                jnp.asarray(mx, jnp.int32)))
            self.p, self.sph = self._flex_kick(
                self.p, self.sph, self.ti_current, self.time,
                self.dt_displacement, self.flex_grp,
                jnp.asarray(self.present_min_step, jnp.int32),
                jnp.asarray(self.present_max_step, jnp.int32))
        elif cfg.pseudosymmetric:
            rnd = jnp.asarray(self._rnd_rng.random(3000), jnp.float32)
            self.p, self.sph = self._kick(self.p, self.sph, self.ti_current,
                                          self.time, self.dt_displacement,
                                          rnd)
        else:
            self.p, self.sph = self._kick(self.p, self.sph, self.ti_current,
                                          self.time, self.dt_displacement)
        # PM long-range kick over the PM midpoint window (timestep.c:350-408)
        if cfg.pmgrid and self.ti_current == self.pm_ti_endstep:
            from ..integrate.timeline import pow2_floor_i32
            tbi = self.tbi
            ti_step = max(1, min(int(self.dt_displacement / tbi),
                                 C.TIMEBASE - self.ti_current))
            ti_step = int(pow2_floor_i32(jnp.asarray(ti_step, jnp.int32)))
            # PM step may only grow onto an aligned tick (timestep.c:357-362)
            old = self.pm_ti_endstep - self.pm_ti_begstep
            if ti_step > old > 0 \
                    and ((C.TIMEBASE - self.pm_ti_endstep) % ti_step) > 0:
                ti_step = old
            if self.ti_current == C.TIMEBASE:
                ti_step = 0
            tstart = (self.pm_ti_begstep + self.pm_ti_endstep) // 2
            tend = self.pm_ti_endstep + ti_step // 2
            new_beg = self.pm_ti_endstep
            new_end = self.pm_ti_endstep + ti_step
            self.p, self.sph = self._pm_kick(
                self.p, self.sph, tstart, tend, self.ti_current,
                new_beg, new_end)
            self.pm_ti_begstep = new_beg
            self.pm_ti_endstep = new_end
        self.p.vel.block_until_ready()
        self.cpu_timers["timeline"] += _time.time() - t0

        self.step_count += 1
        self.cpu_timers["total"] += _time.time() - t_step0
        if "cpu" in self._logs:
            c = self.cpu_timers
            self._logs["cpu"].write(
                f"Step {self.step_count}, Time: {self.time:.8g}\n"
                f"{c['total']:.2f} {c['gravity']:.2f} {c['hydro']:.2f} "
                f"{c['domain']:.2f} {c['potential']:.2f} {c['drift']:.2f} "
                f"{c['timeline']:.2f} {c['snapshot']:.2f}\n")

    def save_restart(self, path: str | None = None) -> str:
        """Write a restart checkpoint (restart(0), restart.c:35)."""
        from ..io.restart import save_restart
        return save_restart(self, path)

    def resume(self, path: str | None = None):
        """Resume from a restart checkpoint (RestartFlag=1)."""
        from ..io.restart import load_restart
        self._fused_info = None  # cached sync-point hint is stale
        return load_restart(self, path)

    def _interrupt_requested(self) -> str | None:
        """stop-file and CPU-limit checks (run.c:67-103).  Returns the
        reason ("stop" / "cpulimit") or None."""
        if self.log_dir and os.path.exists(os.path.join(self.log_dir,
                                                        "stop")):
            os.remove(os.path.join(self.log_dir, "stop"))
            return "stop"
        if self.cfg.time_limit_cpu > 0:
            elapsed = _time.time() - self._wall_start
            if elapsed > 0.85 * self.cfg.time_limit_cpu:
                return "cpulimit"
        return None

    def run(self, max_steps: int | None = None):
        """run() (run.c:20): loop to TimeMax.  At entry, all particles have
        ti_endstep == 0 so the first step computes forces for everyone.

        Handles graceful self-interruption: a `stop` file in the output dir
        or reaching 85% of TimeLimitCPU writes restart files and returns
        (run.c:67-103); periodic safety restart writes every
        CpuTimeBetRestartFile seconds (run.c:108-125)."""
        steps = 0
        self._wall_start = getattr(self, "_wall_start", _time.time())
        last_restart = _time.time()
        while self.ti_current < C.TIMEBASE:
            # after a TimeMax-extending resume the timeline covers more than
            # TimeMax; stop on Time > TimeMax like the reference (run.c:32)
            if self.cfg.timeline_time_max \
                    and self.time > self.cfg.time_max * (1 + 1e-12):
                break
            try:
                self.step()
            except Exception:
                # crash dump (dump_particles, forcetree.c:3557): full state
                # for post-mortem before re-raising
                if self.log_dir:
                    try:
                        self.save_restart(os.path.join(
                            self.log_dir, "crash_dump.npz"))
                    except Exception:
                        pass
                raise
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
            reason = self._interrupt_requested()
            if reason:
                if self.log_dir:
                    self.save_restart()
                if reason == "cpulimit" and self.cfg.resubmit_on \
                        and self.cfg.resubmit_command:
                    # self-resubmission on the CPU-limit interruption
                    # (run.c:99-103)
                    os.system(self.cfg.resubmit_command)
                break
            if self.log_dir and self.cfg.cpu_time_bet_restart_file > 0 \
                    and _time.time() - last_restart \
                    > self.cfg.cpu_time_bet_restart_file:
                self.save_restart()
                last_restart = _time.time()
        if self.ti_current >= C.TIMEBASE and self._next_output < float("inf"):
            self.write_snapshot_now()  # final snapshot (run.c:134-141)
        for f in self._logs.values():
            f.flush()
        return steps

    def close(self):
        for f in self._logs.values():
            f.close()

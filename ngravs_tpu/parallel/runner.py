"""Multi-chip main loop: the reference's run() (run.c:20-132) over the
single-program sharded TreePM+SPH step.

Host orchestration holds only scalars (integer-timeline state, counters,
output times); all particle state stays sharded on the device mesh.  One
step() is ONE compiled XLA program — drift, PM, tree walk, SPH density
iteration, hydro, kick, and the pmin sync-point reduction — i.e. every MPI
exchange of one reference main-loop iteration collapsed into collectives.

Host-side duties mirror the reference's serial bookkeeping:
  * sync-point selection incl. drifting exactly onto snapshot times
    (find_next_sync_point_and_drift, run.c:151-236) — the step program's
    kick is masked by `ti_endstep == ti_next`, so stepping onto an output
    tick that is not a power-of-two boundary only drifts;
  * work-weighted domain decomposition every
    TreeDomainUpdateFrequency * N force updates (domain.c:76) via
    `reshard_by_cost` with the measured per-particle interaction counts;
  * snapshot/energy/info/cpu logs, stop-file + CPU-limit interruption, and
    periodic restart writes (run.c:67-125).

SPH candidate-cap overflows are handled like the reference's bunch-buffer
sizing (allocate.c:44-76): the step reports overflow, the host doubles the
cap, rebuilds the program, and re-runs the SAME step from the retained
pre-step state.
"""

from __future__ import annotations

import math
import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import constants as C
from ..cosmology import make_tables
from ..diagnostics.energy import compute_global_quantities, format_energy_line
from ..integrate.runner import build_snapshot_data, write_snapshot_files
from ..integrate.timeline import ti_to_time, time_to_ti, timebase_interval
from ..models.wiring import build_wiring
from ..units import set_units
from .full_sharded import make_sharded_full_step
from .mesh import AXIS, make_mesh
from .tree_sharded import make_sharded_tree_step, reshard_by_cost


class DistributedSimulation:
    """Pod-sharded simulation driver (BASELINE config 5).

    `particles` must be type-sorted with gas first (the Gadget layout,
    peano.c:47-67); `sph.entropy` must hold the ENTROPY variable A unless
    `entropy_is_u=True`, in which case an init-time density pass converts
    it exactly like init.c:170-174.

    Notes vs the single-chip Simulation: the FORCETEST / MAKEGLASS /
    fast-direct special modes stay single-chip.  Under PMGRID the
    long-range force lives on its own integer timeline exactly like the
    reference (timestep.c:350-408): PM steps force a full synchronization
    (run.c:175-181) and run a separate compiled program variant that
    includes the sharded FFT + midpoint-window PM kick; between PM steps
    the held accel_pm is integrated through the drift prediction.
    """

    def __init__(self, cfg, particles, sph=None, mesh=None, log_dir=None,
                 alloc_factor: float = 1.25, cand_cap: int = 2048,
                 fcap: int = 65536, sph_group: int = 64,
                 entropy_is_u: bool = False, use_let: bool = False):
        self.use_let = use_let
        self.ghost_cap = 4096
        self.let_expn_cap = 4096
        self.let_expp_cap = 8192
        self.cfg = cfg
        self.units = set_units(cfg)
        self.wiring = build_wiring(cfg)
        self.tables = make_tables(cfg, self.units)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        self.alloc_factor = alloc_factor
        self.cand_cap = cand_cap
        self.fcap = fcap
        self.sph_group = sph_group
        self.node_list_cap = 4096
        self.leaf_list_cap = 4096
        self.leaf_factor = 4.0
        self.tbi = timebase_interval(cfg)

        self.n_real = int(particles.pos.shape[0])
        self.n_gas = int(np.sum(np.asarray(particles.ptype) == 0))
        self.has_gas = sph is not None and self.n_gas > 0
        # initial-order restoration key for snapshots (unique Gadget IDs)
        self._init_pid = np.asarray(jax.device_get(particles.pid)).copy()
        self._pid_sorted = np.sort(self._init_pid)
        self._pid_rank = np.argsort(self._init_pid)

        if self.has_gas and float(jnp.max(sph.hsml)) <= 0:
            # initial smoothing-length guess; the first density iteration
            # converges it (setup_smoothinglengths, init.c:218)
            if cfg.periodic and cfg.box_size > 0:
                h0 = cfg.box_size * (cfg.des_num_ngb / self.n_gas) ** (1 / 3)
            else:
                ext = float(jnp.max(particles.pos) - jnp.min(particles.pos))
                h0 = ext * (cfg.des_num_ngb / max(self.n_gas, 1)) ** (1 / 3)
            hs = np.where(np.asarray(particles.ptype) == 0, h0, 0.0)
            sph = sph.replace(hsml=jnp.asarray(hs, jnp.float32))

        # initial domain decomposition (no costs yet -> count-balanced)
        self.p, self.sph = reshard_by_cost(particles, self.mesh, sph=sph,
                                           alloc_factor=alloc_factor)
        self.n_local = self.p.pos.shape[0] // self.n_dev
        self._build_step()

        self.ti_current = 0
        self._min_end = 0       # next global sync point (run.c:165)
        # PM (long-range) integer-timeline window (timestep.c:350-408)
        self.pm_ti_begstep = 0
        self.pm_ti_endstep = 0
        self.time_max_ti = C.TIMEBASE
        self.step_count = 0
        self.num_force_updates = 0
        self.snapshot_count = 0
        self._since_reshard = 0
        self._entropy_pending_u = False
        self._wall_start = _time.time()

        # log_dir="" (explicit) = headless (no log files, scratch snapshots);
        # log_dir=None + unset OutputDir = scratch tmpdir, cleaned at exit
        self.log_dir = log_dir if log_dir is not None else cfg.output_dir
        if not self.log_dir and log_dir is None:
            from ..utils import scratch_output_dir
            self.log_dir = scratch_output_dir()
        self._logs = {}
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            for key, fname in [("info", cfg.info_file),
                               ("energy", cfg.energy_file),
                               ("cpu", cfg.cpu_file),
                               ("timings", cfg.timings_file)]:
                self._logs[key] = open(os.path.join(self.log_dir, fname), "w")
        self._next_output = (cfg.time_of_first_snapshot
                             if cfg.time_bet_snapshot > 0 else float("inf"))
        self._next_stats = (cfg.time_begin if cfg.time_bet_statistics > 0
                            else float("inf"))
        # special timestep modes (distributed via make_mode_kick): host
        # state mirroring the single-chip driver (runner.py FLEXSTEPS /
        # PSEUDOSYMMETRIC blocks)
        if cfg.pseudosymmetric:
            self._rnd_rng = np.random.default_rng(42)
        if cfg.flexsteps:
            self.present_min_step = C.TIMEBASE
            self.present_max_step = C.TIMEBASE
            self._flex_min_fn = self._build_flex_min()
        if entropy_is_u and self.has_gas:
            self.convert_u_to_entropy()

    def _build_flex_min(self):
        """Sharded min active timestep (PresentMinStep refresh,
        timestep.c:140-162): compute_timestep_ticks per shard + pmin."""
        cfg, units, tables = self.cfg, self.units, self.tables
        from jax.sharding import PartitionSpec as P

        from ..integrate.kdk import compute_timestep_ticks, cosmo_factors
        from .mesh import AXIS as _AX, sharded_dt_displacement
        soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))

        def fn(p, sph, ti_current, time_now):
            cf = cosmo_factors(cfg, units, time_now)
            dt_disp = sharded_dt_displacement(cfg, units, p, time_now)
            ti_step = compute_timestep_ticks(cfg, units, p, sph, cf,
                                             dt_disp, soft_by_type)
            active = (p.ti_endstep == ti_current) & (p.pid >= 0)
            mn = jnp.min(jnp.where(active, ti_step, C.TIMEBASE))
            return jax.lax.pmin(mn, _AX), dt_disp

        sph_spec = P(_AX) if self.has_gas else None
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(_AX), sph_spec, P(), P()),
            out_specs=(P(), P()), check_vma=False))

    def _mode_extras(self, ti_next, time_next):
        """Per-step replicated inputs for the special timestep modes."""
        cfg = self.cfg
        if cfg.pseudosymmetric:
            # set_random_numbers (system.c:37): fresh table every step
            return (jnp.asarray(self._rnd_rng.random(3000), jnp.float32),)
        if cfg.flexsteps:
            # PresentMinStep doubling schedule (timestep.c:140-162); the
            # refresh itself happens post-step from the steps actually
            # assigned (_flex_post_step) — pre-step accelerations can be
            # stale/zero.  PresentMaxStep from the displacement
            # constraint (timestep.c:164-175).
            if (self.ti_current % (4 * self.present_min_step)) == 0 \
                    and 1 < self.present_min_step < C.TIMEBASE:
                self.present_min_step *= 2
            _, dt_disp = self._flex_min_fn(
                self.p, self.sph if self.has_gas else None,
                self.ti_current, time_next)
            from ..integrate.timeline import pow2_floor_i32
            mx = max(1, min(int(min(float(dt_disp),
                                    cfg.max_size_timestep) / self.tbi),
                            C.TIMEBASE))
            self.present_max_step = int(pow2_floor_i32(
                jnp.asarray(mx, jnp.int32)))
            return (jnp.asarray(self.present_min_step, jnp.int32),
                    jnp.asarray(self.present_max_step, jnp.int32))
        return ()

    def _flex_post_step(self):
        """PresentMinStep refresh from the steps just assigned
        (timestep.c:150-162: All.PresentMinStep tracks the smallest
        active step)."""
        ends = self.p.ti_endstep
        begs = self.p.ti_begstep
        live = self.p.pid >= 0
        steps = jnp.where(live & (ends > begs), ends - begs, C.TIMEBASE)
        self.present_min_step = min(self.present_min_step,
                                    int(jnp.min(steps)))

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        # under PMGRID two program variants exist: the PM-step one
        # (recomputes the long-range force + PM kick, carries the PM
        # window) and the in-between one (holds accel_pm) — the TPU analog
        # of the reference's conditional long_range_force (accel.c:34-42)
        variants = (True, False) if cfg.pmgrid else (False,)
        fns = []
        for pm in variants:
            if self.has_gas and self.use_let:
                # LET full step: TreePM + SPH with sender-driven ghost
                # exchange, o(N_total) per-shard memory (density.c:115-285
                # export/import symmetry, rebuilt sender-driven)
                from .full_let_sharded import make_let_full_step
                fns.append(make_let_full_step(
                    cfg, self.units, self.wiring, self.tables, self.mesh,
                    n_local=self.n_local, sph_group=self.sph_group,
                    cand_cap=self.cand_cap,
                    expn_cap=self.let_expn_cap,
                    expp_cap=self.let_expp_cap,
                    ghost_cap=self.ghost_cap, pm_step=pm))
            elif self.has_gas:
                fns.append(make_sharded_full_step(
                    cfg, self.units, self.wiring, self.tables, self.mesh,
                    n_local=self.n_local, sph_group=self.sph_group,
                    cand_cap=self.cand_cap, fcap=self.fcap,
                    node_list_cap=self.node_list_cap,
                    leaf_list_cap=self.leaf_list_cap,
                    leaf_factor=self.leaf_factor, pm_step=pm))
            elif self.use_let:
                # locally-essential-tree production path: per-shard
                # memory o(N_total) (gravtree.c:102-285 analog)
                from .tree_sharded import make_let_tree_step
                fns.append(make_let_tree_step(
                    cfg, self.units, self.wiring, self.tables, self.mesh,
                    n_local=self.n_local,
                    expn_cap=self.let_expn_cap,
                    expp_cap=self.let_expp_cap, pm_step=pm))
            else:
                fns.append(make_sharded_tree_step(
                    cfg, self.units, self.wiring, self.tables, self.mesh,
                    n_local=self.n_local, fcap=self.fcap,
                    node_list_cap=self.node_list_cap,
                    leaf_list_cap=self.leaf_list_cap,
                    leaf_factor=self.leaf_factor, pm_step=pm))
        if cfg.pmgrid:
            self._step_pm_fn, self._step_fn = fns
        else:
            self._step_pm_fn = None
            self._step_fn = fns[0]

    @property
    def time(self) -> float:
        return ti_to_time(self.cfg, self.ti_current)

    def convert_u_to_entropy(self):
        """init.c:170-174: IC internal energy -> entropy A, using densities
        from one throwaway sharded step (positions/velocities of the
        retained state are untouched)."""
        assert self.has_gas
        p0, s0 = self.p, self.sph
        _, s_tmp, _, ovf = self._step_fn(
            p0, s0, 0, 0, self.cfg.time_begin,
            *self._mode_extras(0, self.cfg.time_begin))
        if bool(ovf):
            self._grow_caps()
            return self.convert_u_to_entropy()
        rho = jnp.maximum(jax.device_get(s_tmp.density), 1e-37)
        gas = p0.ptype == 0
        a3inv = (1.0 / self.cfg.time_begin ** 3
                 if self.cfg.comoving_integration else 1.0)
        ent = jnp.where(gas, self.cfg.gamma_minus1 * s0.entropy
                        / (rho * a3inv) ** self.cfg.gamma_minus1,
                        s0.entropy)
        self.sph = s0.replace(entropy=ent,
                              hsml=s_tmp.hsml, density=s_tmp.density)

    def _grow_caps(self):
        # bunch-buffer growth analog (allocate.c:44-76): the overflow flag
        # covers both the SPH candidate caps and the walk's node/leaf/
        # frontier caps, so grow them together
        self.cand_cap *= 2
        self.fcap *= 2
        self.node_list_cap *= 2
        self.leaf_list_cap *= 2
        self.let_expn_cap *= 2
        self.let_expp_cap *= 2
        self.leaf_factor = min(self.leaf_factor * 2, 8.0)
        self._build_step()

    # ------------------------------------------------------------------
    def step(self):
        """One main-loop iteration (run.c:32-132)."""
        cfg = self.cfg
        t0 = _time.time()
        ti_next = self._min_end
        if cfg.pmgrid and ti_next > self.pm_ti_endstep:
            # a PM step forces a full synchronization (run.c:175-181)
            ti_next = self.pm_ti_endstep
        # drift exactly onto a pending snapshot time (run.c:206-225)
        wrote_snapshot = False
        if self._next_output < float("inf"):
            ti_out = time_to_ti(cfg, self._next_output)
            if self.ti_current < ti_out < ti_next:
                ti_next = ti_out
        pm_due = bool(cfg.pmgrid) and ti_next == self.pm_ti_endstep

        time_next = ti_to_time(cfg, ti_next)
        pm_beg2 = pm_end2 = None
        mode_extra = self._mode_extras(ti_next, time_next)
        for _ in range(6):
            fn = self._step_pm_fn if pm_due else self._step_fn
            extra = ((self.pm_ti_begstep, self.pm_ti_endstep) if pm_due
                     else ()) + mode_extra
            if self.has_gas:
                out = fn(self.p, self.sph, self.ti_current, ti_next,
                         time_next, *extra)
                if pm_due:
                    p2, s2, min_end, ovf, pm_beg2, pm_end2 = out
                else:
                    p2, s2, min_end, ovf = out
            else:
                out = fn(self.p, self.ti_current, ti_next, time_next,
                         *extra)
                s2 = self.sph
                if pm_due:
                    p2, min_end, ovf, pm_beg2, pm_end2 = out
                else:
                    p2, min_end, ovf = out
            if bool(ovf):
                self._grow_caps()   # re-run same step, state retained
                continue
            break
        else:
            raise RuntimeError("walk/SPH candidate caps kept overflowing")
        if "timings" in self._logs:
            # exact active count for the timings line (one device pull);
            # headless runs use the n_real upper bound
            n_act = int(np.sum(
                np.asarray(jax.device_get(self.p.ti_endstep)) == ti_next))
        else:
            n_act = self.n_real
        self.p, self.sph = p2, s2
        self.ti_current = ti_next
        self._min_end = int(min_end)
        if cfg.flexsteps:
            self._flex_post_step()
        if pm_due:
            self.pm_ti_begstep = int(pm_beg2)
            self.pm_ti_endstep = int(pm_end2)
        self.num_force_updates += n_act
        self._since_reshard += n_act
        self.step_count += 1

        # FORCETEST: direct-sum accuracy rows on the gathered state
        # (gravtree_forcetest.c:28; under PMGRID only on PM steps, :46-49;
        # off under NOGRAVITY, :34)
        if cfg.force_test > 0 and not cfg.no_gravity \
                and (not cfg.pmgrid or pm_due):
            self.force_test()

        # outputs due exactly now (we drifted onto them); write every
        # pending output like the reference's while loop (run.c:206-225)
        while self._next_output < float("inf") \
                and self.time >= self._next_output - 1e-12:
            self.write_snapshot_now()
            self._next_output += cfg.time_bet_snapshot
            wrote_snapshot = True
        if self.time >= self._next_stats - 1e-12:
            self.energy_statistics()
            self._next_stats += cfg.time_bet_statistics

        # work-weighted re-decomposition (domain.c:76)
        if self._since_reshard > cfg.tree_domain_update_frequency \
                * self.n_real * self.n_dev:
            self.domain_decomposition()

        if "info" in self._logs:
            self._logs["info"].write(
                f"Begin Step {self.step_count - 1}, Time: {self.time:.8g}, "
                f"Systemstep: {_time.time() - t0:.3g}"
                f"{', Snapshot' if wrote_snapshot else ''}\n")
            self._logs["info"].flush()
        if "cpu" in self._logs:
            self._logs["cpu"].write(
                f"Step {self.step_count - 1}, Time: {self.time:g}, "
                f"CPUs: {self.n_dev}\n{_time.time() - t0:.2f}\n")
        if "timings" in self._logs:
            # per-gravity-computation detail (gravtree.c:408-445):
            # throughput, interactions/particle, work-load balance from the
            # measured per-shard interaction counts
            cost = np.asarray(jax.device_get(self.p.grav_cost)) \
                .reshape(self.n_dev, self.n_local)
            live = np.asarray(jax.device_get(self.p.pid)) \
                .reshape(self.n_dev, self.n_local) >= 0
            work = (cost * live).sum(axis=1)
            tot = work.sum()
            bal = work.max() * self.n_dev / max(tot, 1e-30)
            dt_step = _time.time() - t0
            self._logs["timings"].write(
                f"Step= {self.step_count - 1}  t= {self.time:g}  "
                f"parts= {self.n_real}  active= {n_act}\n"
                f"part/sec= {n_act / max(dt_step, 1e-9):.6g}  "
                f"ia/part= {tot / max(self.n_real, 1):.6g}\n"
                f"work-load balance: {bal:.4g}  "
                f"particle-load balance: "
                f"{live.sum(axis=1).max() * self.n_dev / max(live.sum(), 1):.4g}\n\n")
            self._logs["timings"].flush()

    def force_test(self, fraction=None, write=True):
        """gravity_forcetest (gravtree_forcetest.c:28) over the mesh: the
        distributed analog of the reference's export-everything direct test
        (gravtree_forcetest.c:94-96) — the state is gathered once and fed to
        the same O(N*Nsel) direct-summation oracle + forcetest.txt writer as
        the single-chip driver (Ewald-corrected when periodic, even under
        PMGRID — begrun.c:47-49)."""
        from types import SimpleNamespace

        from ..constants import SOFTFAC_SPLINE
        from ..diagnostics.forcetest import force_test as _ft

        if not hasattr(self, "_oracle_lat"):
            self._oracle_lat = None
            if self.cfg.periodic:
                from ..ops.lattice import build_lattice_tables
                self._oracle_lat = build_lattice_tables(
                    self.wiring, self.cfg.ngravs_en, self.cfg.box_size)
        p, sph = self.gather_ordered()
        pj = jax.tree.map(jnp.asarray, p)
        sj = jax.tree.map(jnp.asarray, sph) if sph is not None else None
        shim = SimpleNamespace(
            cfg=self.cfg, p=pj, sph=sj, wiring=self.wiring,
            units=self.units,
            force_soft=np.array(self.cfg.softening, np.float32)
            * SOFTFAC_SPLINE,
            solver=SimpleNamespace(oracle_lattice_tables=self._oracle_lat),
            ti_current=self.ti_current, step_count=self.step_count,
            log_dir=self.log_dir)
        return _ft(shim, fraction=fraction, write=write)

    def domain_decomposition(self):
        """Re-split by measured work (domain_Decomposition, domain.c:62)."""
        self.p, self.sph = reshard_by_cost(
            self.p, self.mesh, sph=self.sph,
            alloc_factor=self.alloc_factor,
            box=self.cfg.box_size if self.cfg.periodic else 0.0)
        new_local = self.p.pos.shape[0] // self.n_dev
        if new_local != self.n_local:
            self.n_local = new_local
            self._build_step()
        self._since_reshard = 0

    def run(self, max_steps: int | None = None):
        steps = 0
        last_restart = _time.time()
        while self.ti_current < C.TIMEBASE:
            if self.time > self.cfg.time_max * (1 + 1e-12):
                break
            try:
                self.step()
            except Exception:
                # crash dump (dump_particles, forcetree.c:3557)
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
            # graceful interruption + restart write (run.c:67-103)
            if self.log_dir and os.path.exists(
                    os.path.join(self.log_dir, "stop")):
                os.remove(os.path.join(self.log_dir, "stop"))
                if self.log_dir:
                    self.save_restart()
                break
            if self.cfg.time_limit_cpu > 0 and \
                    _time.time() - self._wall_start \
                    > 0.85 * self.cfg.time_limit_cpu:
                if self.log_dir:
                    self.save_restart()
                if self.cfg.resubmit_on and self.cfg.resubmit_command:
                    # self-resubmission (run.c:99-103)
                    os.system(self.cfg.resubmit_command)
                break
            # periodic safety restart writes (run.c:108-125)
            if self.log_dir and self.cfg.cpu_time_bet_restart_file > 0 \
                    and _time.time() - last_restart \
                    > self.cfg.cpu_time_bet_restart_file:
                self.save_restart()
                last_restart = _time.time()
        if self.ti_current >= C.TIMEBASE \
                and self._next_output < float("inf"):
            self.write_snapshot_now()   # final snapshot (run.c:134-141)
        for f in self._logs.values():
            f.flush()

    def close(self):
        for f in self._logs.values():
            f.close()
        self._logs = {}

    # ------------------------------------------------------------------
    def gather_ordered(self):
        """Pull the sharded state to host, drop padding, restore the
        original (type-sorted) row order by particle ID."""
        ph = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), self.p)
        live = ph.pid >= 0
        # row of each live particle in the ORIGINAL layout
        pos_in_sorted = np.searchsorted(self._pid_sorted, ph.pid[live])
        rows = self._pid_rank[pos_in_sorted]
        perm = np.empty(self.n_real, np.int64)
        perm[rows] = np.nonzero(live)[0]
        p_out = jax.tree.map(lambda a: a[perm], ph)
        s_out = None
        if self.sph is not None:
            sh = jax.tree.map(lambda a: np.asarray(jax.device_get(a)),
                              self.sph)
            s_out = jax.tree.map(lambda a: a[perm], sh)
        return p_out, s_out

    def write_snapshot_now(self, path=None):
        """savepositions (io.c:33).  Multi-device runs write one file per
        shard without ever gathering the whole state (io.c:94-112: files
        written by group masters); single-device falls back to the
        gathered writer."""
        if path is None:
            # never drop run artifacts into the CWD: a headless run
            # (log_dir="") falls back to a scratch temp directory
            out_dir = self.log_dir
            if not out_dir:
                from ..utils import scratch_output_dir
                out_dir = getattr(self, "_tmp_out", None) or \
                    scratch_output_dir()
                self._tmp_out = out_dir
            path = os.path.join(
                out_dir,
                f"{self.cfg.snapshot_file_base}_{self.snapshot_count:03d}")
        if self.n_dev > 1:
            self._write_snapshot_sharded(path)
        else:
            p, sph = self.gather_ordered()
            data = build_snapshot_data(
                self.cfg, self.units, self.tables, float(self.tbi), p, sph,
                self.n_gas, self.ti_current, self.time,
                entropy_is_u=self._entropy_pending_u)
            write_snapshot_files(self.cfg, path, data)
        self.snapshot_count += 1
        return path

    def _write_snapshot_sharded(self, path: str):
        """Per-shard snapshot files `path.k`: each device's live rows are
        pulled independently (addressable shard buffers — per-shard host
        memory, never O(N_total)), type-sorted, and written as one member
        of a num_files = n_dev Gadget multi-file set that
        `read_snapshot_set` reassembles."""
        import dataclasses
        from ..io.gadget_format import write_snapshot, write_snapshot_hdf5

        cfg = self.cfg
        n_dev = self.n_dev

        def shard_arrays(tree, k):
            def one(a):
                shs = sorted(a.addressable_shards,
                             key=lambda s: (s.index[0].start or 0))
                return np.asarray(shs[k].data)
            return jax.tree.map(one, tree)

        # pass 1: global per-type totals from the small id/type columns
        totals = np.zeros(6, np.int64)
        for k in range(n_dev):
            ids = shard_arrays(self.p.pid, k)
            tys = shard_arrays(self.p.ptype, k)
            totals += np.bincount(tys[ids >= 0], minlength=6)

        # pass 2: one shard at a time — peak host memory is one shard
        for k in range(n_dev):
            pk = shard_arrays(self.p, k)
            sk = shard_arrays(self.sph, k) if self.sph is not None else None
            live = np.nonzero(pk.pid >= 0)[0]
            order = live[np.argsort(pk.ptype[live], kind="stable")]
            pk = jax.tree.map(lambda a: a[order], pk)
            if sk is not None:
                sk = jax.tree.map(lambda a: a[order], sk)
            n_gas_k = int((pk.ptype == 0).sum())
            data = build_snapshot_data(
                cfg, self.units, self.tables, float(self.tbi), pk, sk,
                n_gas_k, self.ti_current, self.time,
                entropy_is_u=self._entropy_pending_u)
            # consistent set-wide conventions: global totals, explicit
            # per-particle mass blocks (per-shard mass tables could
            # disagree when a type is absent on some shard)
            data.header.npart_total = totals.astype(np.uint32)
            data.header.num_files = n_dev
            data.header.mass = np.zeros(6)
            if cfg.snap_format == 3:
                write_snapshot_hdf5(f"{path}.{k}.hdf5", data,
                                    with_pot=cfg.output_potential)
            else:
                write_snapshot(f"{path}.{k}", data,
                               snap_format=cfg.snap_format,
                               with_pot=cfg.output_potential)

    def energy_statistics(self):
        """energy.txt line (run.c:413-433) from gathered state."""
        p, sph = self.gather_ordered()
        com = self.cfg.comoving_integration
        s = compute_global_quantities(
            self.cfg, p, sph, self.tables, self.ti_current,
            1.0 / self.time ** 3 if com else 1.0,
            atime=self.time if com else 1.0)
        if "energy" in self._logs:
            self._logs["energy"].write(
                format_energy_line(self.time, s) + "\n")
            self._logs["energy"].flush()
        return s

    def save_restart(self, path: str | None = None) -> str:
        """Restart dump (restart.c:35): gathered full state + timeline."""
        p, sph = self.gather_ordered()
        if path is None:
            path = os.path.join(self.log_dir or ".", "restart_dist.npz")
        if os.path.exists(path):
            os.replace(path, path + ".bak")   # .bak rotation (restart.c:45)
        payload = {f"p_{k}": getattr(p, k)
                   for k in type(p).__dataclass_fields__}
        if sph is not None:
            payload.update({f"s_{k}": getattr(sph, k)
                            for k in type(sph).__dataclass_fields__})
        np.savez(path, ti_current=self.ti_current, min_end=self._min_end,
                 step_count=self.step_count,
                 num_force_updates=self.num_force_updates,
                 snapshot_count=self.snapshot_count,
                 next_output=self._next_output, next_stats=self._next_stats,
                 pm_ti_begstep=self.pm_ti_begstep,
                 pm_ti_endstep=self.pm_ti_endstep,
                 **payload)
        return path

    def resume(self, path: str | None = None):
        """Exact continuation from a restart dump (restart.c:35,
        RestartFlag=1): full integrator state incl. timeline scalars; the
        sharding is rebuilt, not stored (the tree is always rebuilt)."""
        from ..particles import Particles, SphState

        if path is None:
            path = os.path.join(self.log_dir or ".", "restart_dist.npz")
        z = np.load(path)
        p_kw = {k: jnp.asarray(z[f"p_{k}"])
                for k in Particles.__dataclass_fields__}
        p = Particles(**p_kw)
        sph = None
        if any(k.startswith("s_") for k in z.files):
            sph = SphState(**{k: jnp.asarray(z[f"s_{k}"])
                              for k in SphState.__dataclass_fields__})
        self.p, self.sph = reshard_by_cost(
            p, self.mesh, sph=sph, alloc_factor=self.alloc_factor,
            box=self.cfg.box_size if self.cfg.periodic else 0.0)
        new_local = self.p.pos.shape[0] // self.n_dev
        if new_local != self.n_local:
            self.n_local = new_local
            self._build_step()
        self.ti_current = int(z["ti_current"])
        self._min_end = int(z["min_end"])
        if "pm_ti_begstep" in z.files:
            self.pm_ti_begstep = int(z["pm_ti_begstep"])
            self.pm_ti_endstep = int(z["pm_ti_endstep"])
        self.step_count = int(z["step_count"])
        self.num_force_updates = int(z["num_force_updates"])
        self.snapshot_count = int(z["snapshot_count"])
        self._next_output = float(z["next_output"])
        self._next_stats = float(z["next_stats"])
        self._since_reshard = 0
        self._entropy_pending_u = False  # dump holds the entropy variable

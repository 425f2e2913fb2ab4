"""Device-mesh parallelism: sharded particle arrays + collective force steps.

The TPU-native replacement for the reference's MPI machinery (SURVEY.md §2.2):

  reference mechanism                     -> here
  ------------------------------------------------------------------
  Peano-Hilbert domain decomposition      -> arrays sharded along N over a
  (domain.c)                                 1-D mesh axis "shard"
  export/import of remote particles       -> all_gather of the source set
  (gravtree.c:102-285)                       (O(N) replication; the tree path
                                             gathers only top-node moments)
  MPI_Allreduce(min Ti_endstep)           -> lax.pmin inside shard_map
  (run.c:165)

This module provides the data-parallel direct-summation step used by the
multi-chip dry-run and small/medium systems; the tree solver layers its own
LET construction on the same mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import SOFTFAC_SPLINE
from ..integrate.kdk import kick
from ..ops.direct import ParticleSlice, pairwise_forces

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def shard_particles(p, mesh: Mesh):
    """Place a Particles pytree with every leaf sharded along axis 0.
    Pads N to a multiple of the mesh size with massless sentinel particles."""
    n = p.pos.shape[0]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        def _pad(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths)
        p = jax.tree.map(_pad, p)
        # padding particles: zero mass, endstep pushed past the horizon so
        # they are never active
        p = p.replace(
            ti_endstep=p.ti_endstep.at[n:].set(np.int32(2 ** 30)),
            pid=p.pid.at[n:].set(-1),
        )
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), p)


def sharded_dt_displacement(cfg, units, p, atime):
    """find_dt_displacement_constraint (timestep.c:587-651) with
    cross-shard psum/pmin reductions: global RMS-displacement timestep
    limit per type, mesh-aware under PMGRID; MaxSizeTimestep when not
    comoving (timestep.c:596-597).  Call inside shard_map."""
    import math

    dt_min = jnp.asarray(cfg.max_size_timestep, jnp.float32)
    if not cfg.comoving_integration:
        return dt_min
    a = atime
    h2 = (cfg.omega0 / (a * a * a)
          + (1 - cfg.omega0 - cfg.omega_lambda) / (a * a)
          + cfg.omega_lambda)
    hfac = units.hubble * jnp.sqrt(h2) * a * a          # a^2 H(a)
    rho_fac = 3 * units.hubble ** 2 / (8 * math.pi * units.G)
    for t in range(6):
        sel = (p.ptype == t) & (p.pid >= 0)
        count = jax.lax.psum(jnp.sum(sel), AXIS)
        v2 = jax.lax.psum(
            jnp.sum(jnp.where(sel[:, None], p.vel ** 2, 0.0)), AXIS)
        vrms = jnp.sqrt(v2 / jnp.maximum(count, 1))
        min_mass = jax.lax.pmin(
            jnp.min(jnp.where(sel, p.mass, jnp.inf)), AXIS)
        omega_t = cfg.omega_baryon if t == 0 \
            else cfg.omega0 - cfg.omega_baryon
        dmean = (min_mass / jnp.maximum(omega_t * rho_fac, 1e-37)) ** (1. / 3)
        if cfg.pmgrid:
            dmean = jnp.minimum(dmean, cfg.asmth * cfg.box_size / cfg.pmgrid)
        dt_t = (cfg.max_rms_displacement_fac * hfac * dmean
                / jnp.maximum(vrms, 1e-30))
        dt_min = jnp.where(count > 0, jnp.minimum(dt_min, dt_t), dt_min)
    return dt_min


def make_mode_kick(cfg, units, tables, soft_by_type):
    """Distributed kick honoring the reference's special timestep modes.

    Returns kick_fn(p, sph, ti_next, dt_disp, time_next, mode_extras) for
    use INSIDE shard_map step bodies, plus the number of extra replicated
    scalar/array inputs the step signature gains:

      * SYNCHRONIZATION (default)   — plain kdk.kick, no extras
      * FLEXSTEPS (timestep.c:196)  — extras (present_min_step,
        present_max_step); per-particle phase groups recomputed from the
        ID-keyed seed-42 table (system.c:29-47), so they are identical on
        any shard count and survive resharding with no extra state
      * PSEUDOSYMMETRIC (timestep.c:202-238) — extras (rnd_table[3000],)
        refreshed per step by the host driver (set_random_numbers)
      * MAKEGLASS (timestep.c:85-133) — no extras; reversed-gravity
        displacement with the global max-displacement clamp via pmax,
        then a MaxSizeTimestep advance of the active set
    """
    import math as _m

    from ..constants import TIMEBASE
    from ..integrate.timeline import timebase_interval

    tbi = timebase_interval(cfg)
    n_extras = 0
    if cfg.flexsteps:
        n_extras = 2
        _r42 = np.random.default_rng(42).random(3000)
        flextab = jnp.asarray((TIMEBASE * _r42).astype(np.int64)
                              .astype(np.int32))
    elif cfg.pseudosymmetric:
        n_extras = 1

    glass_ticks = max(1, int(cfg.max_size_timestep / tbi)) \
        if cfg.make_glass else 0

    def kick_fn(p, sph, ti_next, dt_disp, time_next, extras):
        if cfg.make_glass:
            acc = -(p.accel + p.accel_pm)
            disp_fac = 2.0 / (3 * units.hubble ** 2)
            disp = jnp.linalg.norm(acc, axis=-1) * disp_fac
            live = p.pid >= 0
            dmax = jax.lax.pmax(jnp.max(jnp.where(live, disp, 0.0)), AXIS)
            rho_crit = (cfg.omega0 * 3 * units.hubble ** 2
                        / (8 * np.pi * units.G))
            msum = jax.lax.psum(jnp.sum(jnp.where(live, p.mass, 0.0)),
                                AXIS)
            ncnt = jax.lax.psum(jnp.sum(live.astype(jnp.float32)), AXIS)
            dmean = (msum / jnp.maximum(ncnt, 1)
                     / max(rho_crit, 1e-37)) ** (1.0 / 3)
            fac = jnp.where(dmax > dmean, dmean / jnp.maximum(dmax, 1e-37),
                            1.0)
            pos = p.pos + fac * acc * disp_fac
            if cfg.periodic and cfg.box_size > 0:
                pos = jnp.mod(pos, cfg.box_size)
            act = p.ti_endstep == ti_next
            return p.replace(
                pos=pos, vel=jnp.zeros_like(p.vel),
                accel=jnp.zeros_like(p.accel),
                accel_pm=jnp.zeros_like(p.accel_pm),
                ti_begstep=jnp.where(act, p.ti_endstep, p.ti_begstep),
                ti_endstep=jnp.where(act, p.ti_endstep + glass_ticks,
                                     p.ti_endstep)), sph
        if cfg.flexsteps:
            pmin_step, pmax_step = extras
            flex_grp = flextab[p.pid % 3000]
            return kick(cfg, units, p, sph, tables, ti_next, dt_disp,
                        soft_by_type, time_next,
                        flex=(flex_grp, pmin_step, pmax_step))
        if cfg.pseudosymmetric:
            return kick(cfg, units, p, sph, tables, ti_next, dt_disp,
                        soft_by_type, time_next, rnd_table=extras[0])
        return kick(cfg, units, p, sph, tables, ti_next, dt_disp,
                    soft_by_type, time_next)

    return kick_fn, n_extras


def make_sharded_step(cfg, units, wiring, tables, mesh: Mesh,
                      chunk: int = 512):
    """Build a jitted full simulation step over the mesh:
    drift(all) -> gather sources -> pairwise forces (local targets) -> kick.

    Returns step(p, ti_current, ti_next, time_next) -> (p, min_endstep).
    In this data-parallel formulation every step treats all particles as
    active (the flat-force regime); the host driver uses the bucketed active
    path instead when adaptivity pays.
    """
    box = cfg.box_size if cfg.periodic else 0.0
    fsoft_by_type = jnp.asarray(np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)
    soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))
    G = units.G

    def _step(p, ti_current, ti_next, time_next):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)
        gid = my * nloc + jnp.arange(nloc, dtype=jnp.int32)
        gid = jnp.where(p.pid >= 0, gid, -1)

        # drift all local particles to the sync point (predict.c:31)
        dd = tables.drift_factor(ti_current, ti_next)
        p = p.replace(pos=p.pos + p.vel * dd)
        if box > 0:
            p = p.replace(pos=jnp.mod(p.pos, box))

        fsoft = fsoft_by_type[p.ptype]
        # source replication over ICI (the export/import replacement)
        gath = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)
        src = ParticleSlice(pos=gath(p.pos), mass=gath(p.mass),
                            grav=gath(p.grav), fsoft=gath(fsoft),
                            gid=gath(gid))
        tgt = ParticleSlice(pos=p.pos, mass=p.mass, grav=p.grav,
                            fsoft=fsoft, gid=gid)
        acc, pot = pairwise_forces(wiring, tgt, src, box=box, chunk=chunk)
        p = p.replace(accel=acc * G, potential=pot * G,
                      old_acc=jnp.linalg.norm(acc * G, axis=-1))

        # kick the active set (timestep.c) — purely local, masked
        p, _ = kick(cfg, units, p, None, tables, ti_next,
                    cfg.max_size_timestep, soft_by_type, time_next)
        min_end = jax.lax.pmin(jnp.min(p.ti_endstep), AXIS)
        return p, min_end

    step = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P()),
        out_specs=(P(AXIS), P()),
    )
    return jax.jit(step)

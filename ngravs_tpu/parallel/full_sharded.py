"""Full sharded simulation step: TreePM gravity + SPH in ONE shard_map jit.

This is the BASELINE config-5 structure (multi-species cosmological
TreePM + SPH over a device mesh) as a single compiled program — the
TPU-native replacement for one whole iteration of the reference's main loop
(run.c:32-132) including every MPI exchange it performs:

  reference mechanism                         -> here
  --------------------------------------------------------------------
  drift + SPH prediction (predict.c:31-104)   -> local masked updates
  tree build + pseudo-particle moment
  exchange (forcetree.c:61,766-819)           -> all_gather sources +
                                                 replicated build
  short-range tree walk with export/import
  bunches (gravtree.c:102-285)                -> per-shard static walk of
                                                 the local Morton slice
  PM with FFTW-MPI slab exchange
  (pm_periodic.c:204-790)                     -> ShardedPMSolver impl
                                                 (psum_scatter + all_to_all
                                                 FFT) inlined in the step
  SPH density + h iteration with export
  bunches (density.c:56-426)                  -> lax.while_loop of
                                                 gather/density/h-update on
                                                 local gas targets against
                                                 the replicated tree
  force_update_hmax (forcetree.c:1134)        -> per-level segment_max of
                                                 the post-iteration hsml
  hydro force exchange (hydra.c:50-304)       -> pairs-mode gather against
                                                 the replicated tree
  kick + timestep (timestep.c:24-408)         -> local masked kick
  MPI_Allreduce(min Ti_endstep) (run.c:165)   -> lax.pmin

Everything shape-static; per-shard work is 1/n_dev of the walk + SPH pair
math, the dominant cost.  The SPH candidate caps are static — overflow is
returned as a flag (`SphOverflow`) for the host to react to, mirroring the
reference's bunch-buffer sizing (allocate.c:44-76).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..constants import SOFTFAC_SPLINE
from ..integrate.kdk import drift, kick
from ..integrate.timeline import timebase_interval
from ..ops.sph import (K3D, MAXITER, Kernel, density_pass, hsml_update,
                       hydro_pass, make_sph_gather)
from ..ops.tree import build_tree, level_caps, make_tree_forces
from ..ops.morton import level_key2
from .mesh import AXIS, sharded_dt_displacement


def _update_node_hmax(tree, depth: int, bucket: int):
    """Recompute per-node hmax from tree.hsml_s (force_update_hmax,
    forcetree.c:1134-1240): per-level segmented max over the cached
    Morton-run segmentation — structure frozen, aggregates refreshed.
    Mirrors build_tree's live-masked slot layout (particles below their
    terminal node are excluded from deeper levels)."""
    n = tree.hsml_s.shape[0]
    caps = level_caps(n, depth, bucket=bucket)
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)
    hmaxs = []
    done = jnp.zeros((n,), bool)
    for lvl in range(depth + 1):
        cap = caps[lvl]
        hk, lk = level_key2(tree.khi_s, tree.klo_s, depth, lvl)
        live = ~done
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (hk[1:] != hk[:-1]) | (lk[1:] != lk[:-1])]) & live
        seg = jnp.cumsum(is_new).astype(jnp.int32) - 1
        seg = jnp.where(live, seg, cap)
        pc = tree.node_pcount[offsets[lvl]:offsets[lvl + 1]]
        mh = jnp.where(pc > 0,
                       jax.ops.segment_max(tree.hsml_s, seg, cap + 1)[:cap],
                       0.0)
        hmaxs.append(mh)
        terminal = ((jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), seg, cap + 1)[:cap] <= bucket)
            | (lvl == depth))
        done = done | (live & terminal[jnp.minimum(seg, cap - 1)])
    return tree._replace(node_hmax=jnp.concatenate(hmaxs))


def make_sharded_full_step(cfg, units, wiring, tables, mesh,
                           n_local: int,
                           depth: int | None = None,
                           group_size: int | None = None,
                           sph_group: int = 64,
                           node_list_cap: int = 4096,
                           leaf_list_cap: int = 4096,
                           fcap: int = 65536,
                           cand_cap: int = 2048,
                           sph_frontier_cap: int = 1024,
                           opening: str | None = None,
                           sph_maxiter: int = MAXITER,
                           leaf_factor: float = 4.0,
                           sph_chunk_blocks: int = 8,
                           pm_step: bool = True):
    """Build the jitted full step over the mesh.

    Without PMGRID (or with it, see below) returns
    step(p, sph, ti_current, ti_next, time_next) ->
    (p, sph, min_endstep, sph_overflow).  `n_local` is the per-shard
    particle count (static); particles must be padded/sharded by
    `mesh.shard_particles` and SPH state sharded identically.

    Under PMGRID the long-range force lives on its own integer timeline
    exactly like the reference (timestep.c:350-408, run.c:175-181), so two
    program variants exist, selected by the static `pm_step` flag:
      * pm_step=True  — a PM step: recompute the sharded-FFT long-range
        force and apply the midpoint-window PM kick.  Signature gains the
        PM window scalars:
        step(p, sph, ti_current, ti_next, time_next, pm_beg, pm_end) ->
        (p, sph, min_endstep, overflow, pm_beg', pm_end').
      * pm_step=False — between PM steps: hold p.accel_pm, skip the FFT
        and the PM kick (signature/returns as without PMGRID).
    The driver must force ti_next <= pm_end (a PM step is a full
    synchronization point) and use the pm_step=True program exactly when
    ti_next == pm_end.
    """
    box = cfg.box_size if cfg.periodic else 0.0
    box_t = cfg.box_sizes
    depth = depth if depth is not None else cfg.tree_depth
    group = group_size if group_size is not None else min(
        cfg.tree_group_size, max(64, 1 << (n_local - 1).bit_length()))
    sph_group = min(sph_group, n_local)
    fsoft_by_type = jnp.asarray(
        np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)
    soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))
    G = units.G
    err_tol = cfg.err_tol_force_acc
    gm1 = cfg.gamma_minus1
    tbi = timebase_interval(cfg)
    if opening is None:
        opening = "bh" if cfg.type_of_opening_criterion == 0 else "relative"
    n_dev = mesh.devices.size
    kern = Kernel.twodims(cfg.box_sizes[2]) if cfg.twodims else K3D
    min_gas_hsml = cfg.min_gas_hsml_fractional * cfg.softening[0] * 2.8
    bucket = cfg.tree_bucket_size

    # --- gravity: short-range (TreePM) or full tree walk ------------------
    pm_sharded = None
    treepm = None
    if cfg.pmgrid:
        from ..ops.pm import PMSolver
        from ..ops.shortrange import shortrange_tables
        from .pm_sharded import ShardedPMSolver
        base_pm = PMSolver(wiring, cfg.pmgrid, cfg.box_size, cfg.n_gravs,
                           G, asmth_cells=cfg.asmth)
        base_pm.rcut = cfg.rcut * base_pm.asmth
        pm_sharded = ShardedPMSolver(base_pm, mesh, cfg.n_gravs)
        sr_ftab, sr_ptab = shortrange_tables(wiring, ntab=cfg.ntab)
        treepm = dict(sr_ftab=sr_ftab, sr_ptab=sr_ptab,
                      asmth=base_pm.asmth, rcut=base_pm.rcut)

    # periodic pure-tree needs the Ewald lattice correction tables
    # (begrun.c:47-49: lattice_init when PERIODIC && !PMGRID)
    lattice_tables = None
    if cfg.periodic and not cfg.pmgrid:
        from ..ops.lattice import build_lattice_tables
        lattice_tables = build_lattice_tables(wiring, cfg.ngravs_en,
                                              cfg.box_size)

    walk = make_tree_forces(
        wiring, n_gravs=cfg.n_gravs, group_size=group,
        node_list_cap=node_list_cap, leaf_list_cap=leaf_list_cap,
        bucket=bucket, depth=depth,
        theta=cfg.err_tol_theta, opening=opening, box_size=box,
        block_batch=max(1, min(8, n_local // group)), treepm=treepm,
        leaf_factor=leaf_factor, lattice_tables=lattice_tables)
    from ..ops.solver import apply_cosmo_corrections, cosmo_corrections
    corr = cosmo_corrections(cfg, G, units.hubble, lattice_tables)

    gather_d = make_sph_gather(depth=depth, bucket=bucket,
                               cand_cap=cand_cap,
                               frontier_cap=sph_frontier_cap,
                               box_size=box_t, group_size=sph_group,
                               pairs=False)
    gather_p = make_sph_gather(depth=depth, bucket=bucket,
                               cand_cap=cand_cap,
                               frontier_cap=sph_frontier_cap,
                               box_size=box_t, group_size=sph_group,
                               pairs=True)

    def _density_iterate(tree, tgt, hsml0, vpt, vel_pred_all, active):
        """Masked fixed-point smoothing-length iteration
        (density.c:110-426) as a lax.while_loop."""
        z = jnp.zeros_like(hsml0)

        def cond(st):
            it, hsml, left, right, rho, wngb, dh, dv, rv, conv, ovf = st
            return (it < sph_maxiter) & ~jnp.all(conv | ~active)

        nb, Gs = tgt.shape
        cb = max(1, min(sph_chunk_blocks, nb))
        nchunk = nb // cb   # caller pads nb to a multiple of cb

        def body(st):
            it, hsml, left, right, _, _, _, _, _, _, ovf = st

            # gather + density sums scanned over block chunks so memory is
            # O(cb * G * cand_cap), not O(nb * ...) — essential at 10^6+
            def chunk(args):
                tgt_c, hsml_c, vpt_c = args
                cands = gather_d(tree, tgt_c, hsml_c)
                r = density_pass(tree, tgt_c, hsml_c, vpt_c, cands,
                                 vel_pred_all, box_size=box_t, kernel=kern)
                return (*r, cands.overflow)

            rho, wngb, dh, dv, rv, ovs = jax.lax.map(
                chunk, (tgt.reshape(nchunk, cb, Gs),
                        hsml.reshape(nchunk, cb, Gs),
                        vpt.reshape(nchunk, cb, Gs, 3)))
            rho = rho.reshape(nb, Gs)
            wngb = wngb.reshape(nb, Gs)
            dh = dh.reshape(nb, Gs)
            dv = dv.reshape(nb, Gs)
            rv = rv.reshape(nb, Gs, 3)
            h2, left, right, conv = hsml_update(
                hsml, left, right, wngb, dh, rho,
                float(cfg.des_num_ngb), float(cfg.max_num_ngb_deviation),
                min_gas_hsml, active, ndims=kern.ndims)
            return (it + 1, h2, left, right, rho, wngb, dh, dv, rv, conv,
                    ovf | jnp.any(ovs))

        init = (jnp.int32(0), hsml0, z, z, z, z, z, z,
                jnp.zeros(hsml0.shape + (3,), hsml0.dtype),
                jnp.zeros_like(active), jnp.zeros((), bool))
        st = jax.lax.while_loop(cond, body, init)
        _, hsml, _, _, rho, wngb, dh, dv, rv, _, ovf = st
        return hsml, rho, wngb, dh, dv, rv, ovf

    pm_update = bool(cfg.pmgrid) and pm_step

    from .mesh import make_mode_kick
    mode_kick, n_mode_extras = make_mode_kick(cfg, units, tables,
                                              soft_by_type)

    def _step(p, sph, ti_current, ti_next, time_next, pm_beg, pm_end,
              *mode_extras):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)
        gath = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)

        # ---- drift all local particles + SPH prediction (predict.c:31) ----
        p, sph = drift(cfg, p, sph, tables, ti_current, ti_next)
        if box > 0:
            p = p.replace(pos=jnp.mod(p.pos, jnp.asarray(box_t, p.pos.dtype)))

        fsoft = fsoft_by_type[p.ptype]
        aold = err_tol * p.old_acc / G
        mass = jnp.where(p.pid >= 0, p.mass, 0.0)   # padding rows are inert
        is_gas = (p.ptype == 0) & (p.pid >= 0)
        hsml_l = jnp.where(is_gas, sph.hsml, 0.0)

        # ---- replicated tree over gathered sources (forcetree.c:61) -------
        pos_f, mass_f = gath(p.pos), gath(mass)
        grav_f, fsoft_f, aold_f = gath(p.grav), gath(fsoft), gath(aold)
        hsml_f = gath(hsml_l)
        tree = build_tree(pos_f, mass_f, grav_f, fsoft_f, aold_f,
                          hsml=hsml_f, depth=depth, n_gravs=cfg.n_gravs,
                          bucket=bucket, box_size=box)
        n_tot = pos_f.shape[0]

        # ---- gravity: walk my contiguous slice of sorted targets ----------
        tgt_g = my * nloc + jnp.arange(nloc, dtype=jnp.int32)
        res = walk.static(tree, tgt_g, fcap=fcap)
        walk_ovf = res.overflow          # node/leaf/frontier caps exceeded
        acc_sorted, pot_sorted = gath(res.acc), gath(res.pot)
        nia_sorted = gath(res.ninteract.astype(acc_sorted.dtype))
        acc_full = jnp.zeros((n_tot, 3), acc_sorted.dtype) \
            .at[tree.order].set(acc_sorted)
        pot_full = jnp.zeros((n_tot,), pot_sorted.dtype) \
            .at[tree.order].set(pot_sorted)
        nia_full = jnp.zeros((n_tot,), nia_sorted.dtype) \
            .at[tree.order].set(nia_sorted)
        acc = jax.lax.dynamic_slice(acc_full, (my * nloc, 0), (nloc, 3)) * G
        pot = jax.lax.dynamic_slice(pot_full, (my * nloc,), (nloc,)) * G
        # measured work for the next domain decomposition (GravCost,
        # forcetree.c:1595 / domain.c:859-862)
        grav_cost = jax.lax.dynamic_slice(nia_full, (my * nloc,), (nloc,))
        # cosmological corrections (gravtree.c:302-358, potential.c:251-337)
        acc, amag, pot = apply_cosmo_corrections(corr, p.pos, mass, p.grav,
                                                 acc, pot)
        if pm_sharded is not None and (cfg.output_potential
                                       or cfg.compute_potential_energy):
            # long-range PM potential for the POT block / energy statistics
            # (compute_potential, potential.c:268-306)
            pot = pot + pm_sharded._potential_impl(p.pos, mass, p.grav)
        accel_pm = p.accel_pm
        if pm_sharded is not None:
            if pm_update:
                # long-range PM forces (pmforce_periodic, pm_periodic.c:204);
                # the sharded FFT pipeline, inlined in this shard_map context
                accel_pm = pm_sharded._forces_impl(p.pos, mass, p.grav)
            # OldAcc includes the PM part under PMGRID (gravtree.c:322-330)
            amag = jnp.linalg.norm(acc + accel_pm, axis=-1)
        p = p.replace(accel=acc, potential=pot, accel_pm=accel_pm,
                      old_acc=amag, grav_cost=grav_cost)

        # ---- SPH (density.c + hydra.c) on local active gas targets --------
        # sorted-index positions of MY original rows
        inv = jnp.zeros((n_tot,), jnp.int32).at[tree.order].set(
            jnp.arange(n_tot, dtype=jnp.int32))
        act_gas = is_gas & (p.ti_endstep == ti_next)
        my_sorted = inv[tgt_g]                       # [nloc] sorted indices
        tgt_flat = jnp.where(act_gas, my_sorted, -1)
        nb0 = -(-nloc // sph_group)
        cb = max(1, min(sph_chunk_blocks, nb0))
        nb = -(-nb0 // cb) * cb          # pad to a chunk multiple
        pad = nb * sph_group - nloc
        if pad:
            tgt_flat = jnp.concatenate(
                [tgt_flat, jnp.full((pad,), -1, jnp.int32)])
        tgt = tgt_flat.reshape(nb, sph_group)        # [nb, Gs]
        active = tgt >= 0
        safe = jnp.maximum(tgt, 0)

        vel_pred_all = gath(sph.vel_pred)[tree.order]
        hsml0 = tree.hsml_s[safe] * active
        vpt = vel_pred_all[safe]
        hsml_t, rho, wngb, dh, dv, rv, ovf = _density_iterate(
            tree, tgt, hsml0, vpt, vel_pred_all, active)

        # finalize (density.c:289-308)
        dhsml_fac = 1.0 / (1 + hsml_t * dh
                           / (kern.ndims * jnp.maximum(rho, 1e-37)))
        curl = jnp.sqrt(jnp.sum(rv ** 2, axis=-1)) / jnp.maximum(rho, 1e-37)
        divv = dv / jnp.maximum(rho, 1e-37)
        orig = jnp.where(active, tree.order[safe], -1)   # global original ids
        loc = jnp.where(active, orig - my * nloc, nloc)  # my local rows
        beg = p.ti_begstep[jnp.clip(loc, 0, nloc - 1)]
        end = p.ti_endstep[jnp.clip(loc, 0, nloc - 1)]
        dt_entr = (ti_next - (beg + end) // 2).astype(jnp.float32) * tbi
        ent_t = sph.entropy[jnp.clip(loc, 0, nloc - 1)]
        dent_t = sph.dt_entropy[jnp.clip(loc, 0, nloc - 1)]
        pressure = (ent_t + dent_t * dt_entr) \
            * jnp.maximum(rho, 1e-37) ** cfg.gamma

        def scat(dst, val):
            return dst.at[loc.reshape(-1)].set(val.reshape(-1), mode="drop")

        sph = sph.replace(
            hsml=jnp.where(act_gas, scat(sph.hsml, hsml_t), sph.hsml),
            density=scat(sph.density, rho),
            div_vel=scat(sph.div_vel, divv),
            curl_vel=scat(sph.curl_vel, curl),
            dhsml_density_factor=scat(sph.dhsml_density_factor, dhsml_fac),
            num_ngb=scat(sph.num_ngb, wngb),
            pressure=scat(sph.pressure, pressure))

        # ---- hmax propagation + hydro force (accel.c:60-89) ---------------
        hsml_all = gath(jnp.where(is_gas, sph.hsml, 0.0))[tree.order]
        tree = _update_node_hmax(tree._replace(hsml_s=hsml_all), depth,
                                 cfg.tree_bucket_size)
        rho_all = jnp.maximum(gath(sph.density), 1e-37)[tree.order]
        pres_all = gath(sph.pressure)[tree.order]
        f_all = gath(sph.dhsml_density_factor)[tree.order]
        csnd_all = jnp.sqrt(cfg.gamma * pres_all / rho_all)
        divv_all = gath(sph.div_vel)[tree.order]
        curl_all = gath(sph.curl_vel)[tree.order]
        dt_all = (gath(p.ti_endstep) - gath(p.ti_begstep)) \
            .astype(jnp.float32)[tree.order] * tbi

        # comoving factors (hydra.c:78-97)
        if cfg.comoving_integration:
            a = time_next
            h2 = (cfg.omega0 / a ** 3
                  + (1 - cfg.omega0 - cfg.omega_lambda) / a ** 2
                  + cfg.omega_lambda)
            hubble_a = units.hubble * jnp.sqrt(h2)
            hubble_a2 = a * a * hubble_a
            fac_mu = a ** (3 * gm1 / 2) / a
            fac_vsic_fix = hubble_a * a ** (3 * gm1)
        else:
            hubble_a2 = fac_mu = fac_vsic_fix = 1.0

        # hydro pair force scanned over block chunks (memory bound as above)
        def hchunk(args):
            tgt_c, orig_c = args
            safe_c = jnp.maximum(tgt_c, 0)
            cands = gather_p(tree, tgt_c, hsml_all[safe_c])
            out = hydro_pass(
                tree, tgt_c, cands, hsml_all, rho_all, pres_all, f_all,
                vel_pred_all, csnd_all, divv_all, curl_all, dt_all, orig_c,
                fac_mu, fac_vsic_fix, hubble_a2, cfg.art_bulk_visc_const,
                box_size=box_t, use_limiter=not cfg.no_viscosity_limiter,
                kernel=kern)
            return (*out, cands.overflow)

        nb_h, Gs_h = tgt.shape
        cb_h = max(1, min(sph_chunk_blocks, nb_h))
        nch_h = nb_h // cb_h
        hacc, dtent, maxsig, ovs_h = jax.lax.map(
            hchunk, (tgt.reshape(nch_h, cb_h, Gs_h),
                     orig.reshape(nch_h, cb_h, Gs_h)))
        hacc = hacc.reshape(nb_h, Gs_h, 3)
        dtent = dtent.reshape(nb_h, Gs_h)
        maxsig = maxsig.reshape(nb_h, Gs_h)
        ovf = ovf | jnp.any(ovs_h)
        # comoving density, no fac_egy (dead in the reference, hydra.c:89;
        # finalize per hydra.c:319)
        dtent = dtent * gm1 / (hubble_a2 * rho_all[safe] ** gm1)
        if cfg.sph_bnd_particles:
            bnd = p.pid[jnp.clip(loc, 0, nloc - 1)] == 0
            hacc = jnp.where(bnd[..., None], 0.0, hacc)
            dtent = jnp.where(bnd, 0.0, dtent)
        flat = loc.reshape(-1)
        sph = sph.replace(
            hydro_accel=sph.hydro_accel.at[flat].set(
                hacc.reshape(-1, 3), mode="drop"),
            dt_entropy=sph.dt_entropy.at[flat].set(
                dtent.reshape(-1), mode="drop"),
            max_signal_vel=sph.max_signal_vel.at[flat].set(
                maxsig.reshape(-1), mode="drop"))

        # ---- kick + sync point (timestep.c; run.c:165), with the
        # cross-shard RMS-displacement constraint (timestep.c:587-651) ----
        dt_disp = sharded_dt_displacement(cfg, units, p, time_next)
        p, sph = mode_kick(p, sph, ti_next, dt_disp, time_next,
                           mode_extras)
        new_beg = new_end = pm_beg
        if pm_update:
            # PM long-range kick over the PM midpoint window
            # (timestep.c:350-408): advance the PM window by the
            # power-of-two-floored displacement constraint, kick ALL
            # particles by accel_pm over [old midpoint, new midpoint], and
            # re-predict the gas velocities (timestep.c:392-406)
            from ..integrate.timeline import pm_window_update
            tstart, tend, new_beg, new_end = pm_window_update(
                ti_next, pm_beg, pm_end, dt_disp, float(tbi))
            dt_pmk = tables.gravkick_factor(tstart, tend)
            p = p.replace(vel=p.vel + accel_pm * dt_pmk)
            mid = (p.ti_begstep + p.ti_endstep) // 2
            dt_a = tables.gravkick_factor(p.ti_begstep, ti_next) \
                - tables.gravkick_factor(p.ti_begstep, mid)
            dt_h = tables.hydrokick_factor(p.ti_begstep, ti_next) \
                - tables.hydrokick_factor(p.ti_begstep, mid)
            dt_b = -tables.gravkick_factor(new_beg, (new_beg + new_end) // 2)
            vp = p.vel + p.accel * dt_a[:, None] \
                + sph.hydro_accel * dt_h[:, None] + accel_pm * dt_b
            sph = sph.replace(vel_pred=jnp.where(
                is_gas[:, None], vp, sph.vel_pred))
        min_end = jax.lax.pmin(jnp.min(p.ti_endstep), AXIS)
        ovf = jax.lax.pmax(ovf | walk_ovf, AXIS)
        if pm_update:
            return p, sph, min_end, ovf, new_beg, new_end
        return p, sph, min_end, ovf

    mspec = (P(),) * n_mode_extras
    if pm_update:
        step = jax.shard_map(
            _step, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(), P()) + mspec,
            out_specs=(P(AXIS), P(AXIS), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step)

    def _step_nopm(p, sph, ti_current, ti_next, time_next, *mode_extras):
        return _step(p, sph, ti_current, ti_next, time_next,
                     jnp.int32(0), jnp.int32(0), *mode_extras)

    step = jax.shard_map(
        _step_nopm, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), P()) + mspec,
        out_specs=(P(AXIS), P(AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)

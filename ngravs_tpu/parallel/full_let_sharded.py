"""LET-mode full simulation step: TreePM gravity + SPH, o(N_total)/shard.

The config-5 structure (multi-species cosmological TreePM + SPH over a
device mesh) WITHOUT the replicated-tree all_gather: per-shard memory is
O(N_local + exchange caps).  The reference's export/import bunch machinery
serves gravity and SPH identically (gravtree.c:102-285, density.c:115-285,
hydra.c:124-304); here both reduce to sender-driven essential-row
exchanges inside ONE shard_map program:

  * gravity: local octree + the LET cut/exchange + dense remote-row
    evaluation of `tree_sharded.make_let_exchange` /
    `make_let_remote_eval` (shared with the collisionless LET step);
  * SPH: a sender-driven GHOST exchange — every shard ships the gas rows
    that can interact with a receiver's domain (dist(row, gas box of r) <
    max(h_row, margin * hmax_r), the sender-driven dual of the reference's
    receiver-driven neighbor export, density.c:115-285) — in TWO rounds:
    round A (pos, vel_pred, mass, hsml) before the density iteration,
    round B (+ density, pressure term, sound speed, Balsara f2, dt) for
    the hydro pair force.  Local neighbors come from the LOCAL tree's
    candidate gather; ghost rows are evaluated densely in ec-row chunks
    with the same kernel sums (density_pass / hydra.c:353-555 pair math).

Correctness contract: the ghost margin covers smoothing-length GROWTH
during the density iteration; if any converged h exceeds margin * hmax
(the export threshold), the step sets its overflow flag — the same
static-cap + overflow-flag contract every capped structure here follows
(allocate.c:44-76 analog).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..constants import SOFTFAC_SPLINE
from ..integrate.kdk import drift
from ..integrate.timeline import timebase_interval
from ..ops.sph import (K3D, MAXITER, Kernel, _hinv_pow, density_pass,
                       hsml_update, hydro_pass, kernel_wk_dwk,
                       make_sph_gather)
from ..ops.tree import _compact_rows, build_tree
from .full_sharded import _update_node_hmax
from .mesh import AXIS, sharded_dt_displacement
from .tree_sharded import make_let_exchange, make_let_remote_eval

# ghost round-A packed row: x y z vx vy vz mass hsml
GA_F = 8
# ghost round-B packed row: x y z vx vy vz mass hsml rho pterm cs f2 dt
GB_F = 16


def make_let_full_step(cfg, units, wiring, tables, mesh,
                       n_local: int,
                       depth: int | None = None,
                       sph_group: int = 64,
                       cand_cap: int = 2048,
                       sph_frontier_cap: int = 1024,
                       expn_cap: int = 4096,
                       expp_cap: int = 8192,
                       ghost_cap: int = 4096,
                       ghost_margin: float = 1.35,
                       leaf_factor: float = 4.0,
                       ec: int = 512,
                       fcaps: dict | None = None,
                       opening: str | None = None,
                       sph_maxiter: int = MAXITER,
                       sph_chunk_blocks: int = 8,
                       pm_step: bool = True):
    """Build the jitted LET full step.  Signature/returns match
    `full_sharded.make_sharded_full_step` (two PMGRID variants selected by
    the static `pm_step`); per-shard memory is o(N_total)."""
    box = cfg.box_size if cfg.periodic else 0.0
    periodic = box > 0
    box_t = cfg.box_sizes
    depth = depth if depth is not None else cfg.tree_depth
    sph_group = min(sph_group, n_local)
    n_dev = mesh.devices.size
    G = units.G
    err_tol = cfg.err_tol_force_acc
    theta = cfg.err_tol_theta
    NG = cfg.n_gravs
    gm1 = cfg.gamma_minus1
    tbi = timebase_interval(cfg)
    fsoft_by_type = jnp.asarray(
        np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)
    soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))
    if opening is None:
        opening = "bh" if cfg.type_of_opening_criterion == 0 else "relative"
    fcaps = fcaps or {}
    kern = Kernel.twodims(cfg.box_sizes[2]) if cfg.twodims else K3D
    min_gas_hsml = cfg.min_gas_hsml_fractional * cfg.softening[0] * 2.8
    bucket = cfg.tree_bucket_size

    # --- gravity machinery (mirrors make_let_tree_step) -------------------
    pm_sharded = None
    treepm = None
    sr_cutoff = 0.0
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
        sr_cutoff = 6.0 * base_pm.asmth
        if not all(law.kernel_shortrange() is not None
                   for law, _ in wiring.unique_laws()):
            raise NotImplementedError(
                "LET TreePM needs closed-form short-range kernels for "
                "every wired law (remote rows are evaluated densely)")
    lattice_tables = None
    if periodic and not cfg.pmgrid:
        from ..ops.lattice import build_lattice_tables
        lattice_tables = build_lattice_tables(wiring, cfg.ngravs_en,
                                              cfg.box_size)
    fac_intp = (2 * (lattice_tables.shape[1] - 1) / box
                if lattice_tables is not None else 0.0)
    pm_update = bool(cfg.pmgrid) and pm_step
    inv2a = 0.5 / treepm["asmth"] if treepm is not None else 0.0

    from ..ops.walk import make_fused_walk
    walk = make_fused_walk(
        wiring, n_gravs=NG, depth=depth, bucket=bucket,
        group_size=cfg.walk_group_size, batch_blocks=cfg.walk_batch_blocks,
        chunk_cap=fcaps.get("chunk", 2048),
        frontier_cap=fcaps.get("frontier", 2048), ec=cfg.walk_ec,
        theta=theta, opening=opening, box_size=box, treepm=treepm,
        leaf_factor=leaf_factor, lattice_tables=lattice_tables)
    from ..ops.solver import apply_cosmo_corrections, cosmo_corrections
    corr = cosmo_corrections(cfg, G, units.hubble, lattice_tables)
    from .mesh import make_mode_kick
    mode_kick, n_mode_extras = make_mode_kick(cfg, units, tables,
                                              soft_by_type)
    groups = wiring.unique_laws()
    EXN = ((expn_cap + 7) // 8) * 8
    EXP = ((expp_cap + 7) // 8) * 8
    RCAP = ((EXN * NG + EXP + ec - 1) // ec) * ec
    GEX = ((ghost_cap + ec - 1) // ec) * ec

    let_exchange = make_let_exchange(
        n_dev=n_dev, NG=NG, EXN=EXN, EXP=EXP, RCAP=RCAP, theta=theta,
        opening=opening, sr_cutoff=sr_cutoff, periodic=periodic, box=box)
    let_remote_eval = make_let_remote_eval(
        wiring=wiring, groups=groups, treepm=treepm, inv2a=inv2a,
        lattice_tables=lattice_tables, fac_intp=fac_intp, ec=ec, NG=NG,
        periodic=periodic, box=box)

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

    def min_image(d):
        if not periodic:
            return d
        return d - box * jnp.round(d * (1.0 / box))

    def _pt_box_gap(pt, lo_b, hi_b):
        """per-axis gap of a point to a box (periodic-aware)."""
        g = jnp.maximum(lo_b - pt, pt - hi_b)
        if periodic:
            gp = jnp.maximum(lo_b - pt - box, pt - hi_b + box)
            gm = jnp.maximum(lo_b - pt + box, pt - hi_b - box)
            g = jnp.minimum(g, jnp.minimum(gp, gm))
        return g

    def _ghost_select(pos, is_gas, hsml, gas_lo, gas_hi, hmax_r, my):
        """[nloc, n_dev] bool: local gas row j ships to receiver r if its
        distance to r's gas box is below max(h_j, margin * hmax_r)
        (the sender-driven dual of density.c:115-285's neighbor export)."""
        d2 = jnp.zeros((pos.shape[0], n_dev), jnp.float32)
        for ax in range(3):
            ga = _pt_box_gap(pos[:, ax, None], gas_lo[None, :, ax],
                             gas_hi[None, :, ax])
            d2 = d2 + jnp.maximum(ga, 0.0) ** 2
        thr = jnp.maximum(hsml[:, None],
                          np.float32(ghost_margin) * hmax_r[None, :])
        sel = is_gas[:, None] & (d2 < thr * thr)
        return sel & (jnp.arange(n_dev) != my)[None, :]

    def _ship(sel, fields, nf):
        """Compact the selected rows per receiver, pack `fields`
        (list of [nloc] arrays, len nf), all_to_all.  Returns
        ([n_dev*GEX, nf] rows, valid [n_dev*GEX], ovf)."""
        nloc = fields[0].shape[0]
        rid, cnt = _compact_rows(
            jnp.broadcast_to(jnp.arange(nloc, dtype=jnp.int32)[:, None],
                             sel.shape).T,
            sel.T, GEX)                                    # [n_dev, GEX]
        ovf = jnp.max(cnt) > GEX
        ok = rid >= 0
        safe = jnp.maximum(rid, 0)
        cols = [jnp.where(ok, f[safe], 0.0) for f in fields]
        # validity marker: mass column strictly > 0 for live rows
        send = jnp.stack(cols, axis=-1)                    # [n_dev, GEX, nf]
        live = ok & (send[:, :, 6] > 0)                    # mass col
        send = jnp.concatenate(
            [send, live[:, :, None].astype(jnp.float32)], axis=-1)
        recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0,
                                  tiled=True).reshape(n_dev * GEX, nf + 1)
        return recv[:, :nf], recv[:, nf] > 0, ovf

    def _ghost_density(tpos, tvel, hsml, tvalid, ghosts, gvalid):
        """Dense ghost-row density sums in ec chunks: the ghost-side half
        of density_evaluate (density.c:467-599).  tpos [NT,3], ghosts
        [RG, GA_F].  Returns (rho, wngb_w, dhsml, divv, rotv[NT,3])."""
        NT = tpos.shape[0]
        nch = ghosts.shape[0] // ec

        def body(carry, sl):
            rho0, wn0, dh0, dv0, rv0 = carry
            g = jax.lax.dynamic_slice(ghosts, (sl * ec, 0), (ec, GA_F))
            gv = jax.lax.dynamic_slice(gvalid, (sl * ec,), (ec,))
            dxs = [min_image(tpos[:, d:d + 1] - g[None, :, d])
                   for d in range(3)]
            r2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2
            r = jnp.sqrt(r2)
            hinv = 1.0 / jnp.maximum(hsml, 1e-30)
            u = r * hinv[:, None]
            wk, dwk = kernel_wk_dwk(u, hinv[:, None], kern)
            inside = (u < 1.0) & gv[None, :] & tvalid[:, None]
            wk = jnp.where(inside, wk, 0.0)
            dwk = jnp.where(inside, dwk, 0.0)
            m = g[None, :, 6]
            fac = jnp.where(r > 0, m * dwk / jnp.maximum(r, 1e-30), 0.0)
            dvs = [tvel[:, d:d + 1] - g[None, :, 3 + d] for d in range(3)]
            vdotr = (dxs[0] * dvs[0] + dxs[1] * dvs[1] + dxs[2] * dvs[2])
            return (rho0 + jnp.sum(m * wk, axis=1),
                    wn0 + jnp.sum(wk, axis=1),
                    dh0 + jnp.sum(-m * (kern.ndims * hinv[:, None] * wk
                                        + u * dwk), axis=1),
                    dv0 - jnp.sum(fac * vdotr, axis=1),
                    rv0 + jnp.stack(
                        [jnp.sum(fac * (dxs[2] * dvs[1]
                                        - dxs[1] * dvs[2]), axis=1),
                         jnp.sum(fac * (dxs[0] * dvs[2]
                                        - dxs[2] * dvs[0]), axis=1),
                         jnp.sum(fac * (dxs[1] * dvs[0]
                                        - dxs[0] * dvs[1]), axis=1)],
                        axis=-1)), None

        z = jnp.zeros((NT,), jnp.float32)
        init = (z, z, z, z, jnp.zeros((NT, 3), jnp.float32))
        out, _ = jax.lax.scan(body, init,
                              np.arange(nch, dtype=np.int32))
        return out

    def _ghost_hydro(tpos, tvel, h_i, rho_i, pterm_i, cs_i, f1, dt_i,
                     tmass, tvalid, ghosts, gvalid,
                     fac_mu, fac_vsic_fix, hubble_a2):
        """Dense ghost-row hydro pair force in ec chunks: the ghost-side
        half of hydro_evaluate (hydra.c:353-555), j-quantities from the
        packed round-B ghost rows."""
        NT = tpos.shape[0]
        nch = ghosts.shape[0] // ec
        visc_const = cfg.art_bulk_visc_const

        def body(carry, sl):
            acc0, de0, ms0 = carry
            g = jax.lax.dynamic_slice(ghosts, (sl * ec, 0), (ec, GB_F))
            gv = jax.lax.dynamic_slice(gvalid, (sl * ec,), (ec,))
            dxs = [min_image(tpos[:, d:d + 1] - g[None, :, d])
                   for d in range(3)]
            r2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2
            r = jnp.sqrt(r2)
            h_j = g[None, :, 7]
            pairmask = ((r2 < h_i[:, None] ** 2) | (r2 < h_j ** 2)) \
                & gv[None, :] & tvalid[:, None]
            dvs = [tvel[:, d:d + 1] - g[None, :, 3 + d] for d in range(3)]
            vdotr = dxs[0] * dvs[0] + dxs[1] * dvs[1] + dxs[2] * dvs[2]
            vdotr2 = vdotr + hubble_a2 * r2
            hinv_i = 1.0 / jnp.maximum(h_i, 1e-30)
            _, dwk_i = kernel_wk_dwk(r * hinv_i[:, None],
                                     hinv_i[:, None], kern)
            dwk_i = jnp.where(r2 < h_i[:, None] ** 2, dwk_i, 0.0)
            hinv_j = 1.0 / jnp.maximum(h_j, 1e-30)
            _, dwk_j = kernel_wk_dwk(r * hinv_j, hinv_j, kern)
            dwk_j = jnp.where(r2 < h_j ** 2, dwk_j, 0.0)
            smass = g[None, :, 6]
            rho_j = g[None, :, 8]
            pterm_j = g[None, :, 9]        # pres_j/rho_j^2 * f_j
            cs_j = g[None, :, 10]
            f2 = g[None, :, 11]
            dt_j = g[None, :, 12]
            cs_sum = cs_i[:, None] + cs_j
            mu_ij = fac_mu * vdotr2 / jnp.maximum(r, 1e-30)
            vsig = cs_sum - 3 * mu_ij
            approaching = (vdotr2 < 0) & pairmask
            ms1 = jnp.maximum(
                ms0, jnp.max(jnp.where(pairmask, cs_sum, 0.0), axis=1))
            ms1 = jnp.maximum(
                ms1, jnp.max(jnp.where(approaching, vsig, 0.0), axis=1))
            rho_ij = 0.5 * (rho_i[:, None] + rho_j)
            visc = 0.25 * visc_const * vsig * (-mu_ij) \
                / jnp.maximum(rho_ij, 1e-37) * (f1[:, None] + f2)
            dwk_sum = dwk_i + dwk_j
            if not cfg.no_viscosity_limiter:
                dt_pair = jnp.maximum(dt_i[:, None], dt_j)
                lim_ok = (dt_pair > 0) & (dwk_sum < 0)
                m_sum = 0.5 * (tmass[:, None] + smass)
                limiter = 0.5 * fac_vsic_fix * vdotr2 / (
                    m_sum * jnp.where(lim_ok, dwk_sum, -1.0)
                    * jnp.maximum(r, 1e-30)
                    * jnp.where(dt_pair > 0, dt_pair, 1.0))
                visc = jnp.where(lim_ok, jnp.minimum(visc, limiter), visc)
            visc = jnp.where(approaching, visc, 0.0)
            hfc_visc = 0.5 * smass * visc * dwk_sum \
                / jnp.maximum(r, 1e-30)
            hfc = hfc_visc + smass * (
                pterm_i[:, None] * dwk_i + pterm_j * dwk_j) \
                / jnp.maximum(r, 1e-30)
            hfc = jnp.where(pairmask, hfc, 0.0)
            hfc_visc = jnp.where(pairmask, hfc_visc, 0.0)
            acc1 = acc0 - jnp.stack(
                [jnp.sum(hfc * dxs[d], axis=1) for d in range(3)], axis=-1)
            de1 = de0 + jnp.sum(0.5 * hfc_visc * vdotr2, axis=1)
            return (acc1, de1, ms1), None

        z = jnp.zeros((NT,), jnp.float32)
        init = (jnp.zeros((NT, 3), jnp.float32), z, z)
        out, _ = jax.lax.scan(body, init,
                              np.arange(nch, dtype=np.int32))
        return out

    def _step(p, sph, ti_current, ti_next, time_next, pm_beg, pm_end,
              *mode_extras):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)

        # ---- drift local + SPH prediction (predict.c:31) -----------------
        p, sph = drift(cfg, p, sph, tables, ti_current, ti_next)
        if box > 0:
            p = p.replace(pos=jnp.mod(p.pos,
                                      jnp.asarray(box_t, p.pos.dtype)))

        fsoft = fsoft_by_type[p.ptype]
        aold = err_tol * p.old_acc / G
        mass = jnp.where(p.pid >= 0, p.mass, 0.0)
        live = p.pid >= 0
        is_gas = (p.ptype == 0) & live
        hsml_l = jnp.where(is_gas, sph.hsml, 0.0)

        # ---- collectives: root cell, domain boxes, gas boxes, hmax -------
        big = jnp.float32(1e30)
        lo_l = jnp.min(jnp.where(live[:, None], p.pos, big), axis=0)
        hi_l = jnp.max(jnp.where(live[:, None], p.pos, -big), axis=0)
        if periodic:
            corner = jnp.zeros(3, p.pos.dtype)
            root_len = jnp.asarray(box, p.pos.dtype)
        else:
            glo = jax.lax.pmin(lo_l, AXIS)
            ghi = jax.lax.pmax(hi_l, AXIS)
            root_len = jnp.max(ghi - glo) * 1.0001 + 1e-30
            corner = (glo + ghi) / 2 - root_len / 2
        boxes_lo = jax.lax.all_gather(lo_l, AXIS)
        boxes_hi = jax.lax.all_gather(hi_l, AXIS)
        aold_min = jax.lax.all_gather(
            jnp.min(jnp.where(live, aold, big)), AXIS)
        glo_g = jnp.min(jnp.where(is_gas[:, None], p.pos, big), axis=0)
        ghi_g = jnp.max(jnp.where(is_gas[:, None], p.pos, -big), axis=0)
        gas_lo = jax.lax.all_gather(glo_g, AXIS)           # [n_dev, 3]
        gas_hi = jax.lax.all_gather(ghi_g, AXIS)
        hmax_l = jnp.max(jnp.where(is_gas, sph.hsml, 0.0))
        hmax_r = jax.lax.all_gather(hmax_l, AXIS)          # [n_dev]

        # ---- LOCAL tree over my particles only ---------------------------
        tree = build_tree(p.pos, mass, p.grav, fsoft, aold, hsml=hsml_l,
                          depth=depth, n_gravs=NG, bucket=bucket,
                          group_size=cfg.walk_group_size,
                          corner=corner, root_len=root_len)

        # ---- gravity: LET cut/exchange + local walk + remote eval --------
        recv, g_exch_ovf = let_exchange(tree, boxes_lo, boxes_hi,
                                        aold_min, my, nloc)
        ovf = g_exch_ovf
        tgt = jnp.arange(nloc, dtype=jnp.int32)
        res = walk(tree, tgt, rel=jnp.asarray(opening == "relative"))
        rx, ry, rz, rp = let_remote_eval(recv, tree.pos_s, tree.grav_s,
                                         tree.fsoft_s, tree.mass_s)
        acc_sorted = res.acc + jnp.stack([rx, ry, rz], axis=-1)
        pot_sorted = res.pot + rp

        inv = jnp.zeros((nloc,), jnp.int32).at[tree.order].set(
            jnp.arange(nloc, dtype=jnp.int32))
        acc = acc_sorted[inv] * G
        pot = pot_sorted[inv] * G
        nia = res.ninteract[inv]
        acc, amag, pot = apply_cosmo_corrections(corr, p.pos, mass, p.grav,
                                                 acc, pot)
        accel_pm = p.accel_pm
        if pm_sharded is not None:
            if pm_update:
                accel_pm = pm_sharded._forces_impl(p.pos, mass, p.grav)
            if cfg.output_potential or cfg.compute_potential_energy:
                pot = pot + pm_sharded._potential_impl(p.pos, mass, p.grav)
            amag = jnp.linalg.norm(acc + accel_pm, axis=-1)
        p = p.replace(accel=acc, potential=pot, old_acc=amag,
                      accel_pm=accel_pm,
                      grav_cost=nia.astype(p.grav_cost.dtype))

        # ---- SPH ghost exchange, round A (density inputs) ----------------
        sel = _ghost_select(p.pos, is_gas, sph.hsml, gas_lo, gas_hi,
                            hmax_r, my)
        ga_fields = [p.pos[:, 0], p.pos[:, 1], p.pos[:, 2],
                     sph.vel_pred[:, 0], sph.vel_pred[:, 1],
                     sph.vel_pred[:, 2], mass, sph.hsml]
        ghostsA, gvalidA, g_ovf = _ship(sel, ga_fields, GA_F)
        ovf = ovf | g_ovf

        # ---- density + h iteration (density.c:110-426): local candidate
        # gather on the LOCAL tree + dense ghost sums every iteration ----
        act_gas = is_gas & (p.ti_endstep == ti_next)
        my_sorted = inv[tgt]
        tgt_flat = jnp.where(act_gas, my_sorted, -1)
        nb0 = -(-nloc // sph_group)
        cb = max(1, min(sph_chunk_blocks, nb0))
        nb = -(-nb0 // cb) * cb
        pad = nb * sph_group - nloc
        if pad:
            tgt_flat = jnp.concatenate(
                [tgt_flat, jnp.full((pad,), -1, jnp.int32)])
        tgtb = tgt_flat.reshape(nb, sph_group)
        active = tgtb >= 0
        safe = jnp.maximum(tgtb, 0)

        vel_pred_all = sph.vel_pred[tree.order]            # local sorted
        hsml0 = tree.hsml_s[safe] * active
        vpt = vel_pred_all[safe]
        tposb = tree.pos_s[safe]

        z = jnp.zeros_like(hsml0)
        nchunk = nb // cb
        Gs = sph_group

        def d_cond(st):
            it, hsml, left, right, rho, wngb, dh, dv, rv, conv, ov = st
            return (it < sph_maxiter) & ~jnp.all(conv | ~active)

        def d_body(st):
            it, hsml, left, right, _, _, _, _, _, _, ov = st

            def chunk(args):
                tgt_c, hsml_c, vpt_c = args
                cands = gather_d(tree, tgt_c, hsml_c)
                r = density_pass(tree, tgt_c, hsml_c, vpt_c, cands,
                                 vel_pred_all, box_size=box_t, kernel=kern)
                return (*r, cands.overflow)

            rho, wngb, dh, dv, rv, ovs = jax.lax.map(
                chunk, (tgtb.reshape(nchunk, cb, Gs),
                        hsml.reshape(nchunk, cb, Gs),
                        vpt.reshape(nchunk, cb, Gs, 3)))
            rho = rho.reshape(nb, Gs)
            wngb = wngb.reshape(nb, Gs)
            dh = dh.reshape(nb, Gs)
            dv = dv.reshape(nb, Gs)
            rv = rv.reshape(nb, Gs, 3)
            # ghost term (dense, ec chunks) — flattened targets
            grho, gwn, gdh, gdv, grv = _ghost_density(
                tposb.reshape(nb * Gs, 3), vpt.reshape(nb * Gs, 3),
                hsml.reshape(nb * Gs), active.reshape(nb * Gs),
                ghostsA, gvalidA)
            rho = rho + grho.reshape(nb, Gs)
            dh = dh + gdh.reshape(nb, Gs)
            dv = dv + gdv.reshape(nb, Gs)
            rv = rv + grv.reshape(nb, Gs, 3)
            hinv = 1.0 / jnp.maximum(hsml, 1e-30)
            hinv3_t, _ = _hinv_pow(hinv, kern)
            wngb = wngb + kern.norm * gwn.reshape(nb, Gs) \
                / jnp.maximum(hinv3_t, 1e-37)
            h2, left, right, conv = hsml_update(
                hsml, left, right, wngb, dh, rho,
                float(cfg.des_num_ngb), float(cfg.max_num_ngb_deviation),
                min_gas_hsml, active, ndims=kern.ndims)
            return (it + 1, h2, left, right, rho, wngb, dh, dv, rv, conv,
                    ov | jnp.any(ovs))

        init = (jnp.int32(0), hsml0, z, z, z, z, z, z,
                jnp.zeros(hsml0.shape + (3,), hsml0.dtype),
                jnp.zeros_like(active), jnp.zeros((), bool))
        st = jax.lax.while_loop(d_cond, d_body, init)
        _, hsml_t, _, _, rho, wngb, dh, dv, rv, _, d_ovf = st
        ovf = ovf | d_ovf
        # ghost-margin contract: converged h must stay within the export
        # threshold or remote neighbors may have been missed
        h_margin_ovf = (jnp.max(jnp.where(active, hsml_t, 0.0))
                        > np.float32(ghost_margin)
                        * jnp.maximum(hmax_l, 1e-30))
        ovf = ovf | h_margin_ovf

        dhsml_fac = 1.0 / (1 + hsml_t * dh
                           / (kern.ndims * jnp.maximum(rho, 1e-37)))
        curl = jnp.sqrt(jnp.sum(rv ** 2, axis=-1)) \
            / jnp.maximum(rho, 1e-37)
        divv = dv / jnp.maximum(rho, 1e-37)
        orig = jnp.where(active, tree.order[safe], -1)     # local rows
        loc = jnp.where(active, orig, nloc)
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

        # ---- hmax propagation + hydro (accel.c:60-89) --------------------
        hsml_all = jnp.where(is_gas, sph.hsml, 0.0)[tree.order]
        tree = _update_node_hmax(tree._replace(hsml_s=hsml_all), depth,
                                 bucket)
        rho_all = jnp.maximum(sph.density, 1e-37)[tree.order]
        pres_all = sph.pressure[tree.order]
        f_all = sph.dhsml_density_factor[tree.order]
        csnd_all = jnp.sqrt(cfg.gamma * pres_all / rho_all)
        divv_all = sph.div_vel[tree.order]
        curl_all = sph.curl_vel[tree.order]
        dt_all = (p.ti_endstep - p.ti_begstep) \
            .astype(jnp.float32)[tree.order] * tbi

        if cfg.comoving_integration:
            a = time_next
            h2c = (cfg.omega0 / a ** 3
                   + (1 - cfg.omega0 - cfg.omega_lambda) / a ** 2
                   + cfg.omega_lambda)
            hubble_a = units.hubble * jnp.sqrt(h2c)
            hubble_a2 = a * a * hubble_a
            fac_mu = a ** (3 * gm1 / 2) / a
            fac_vsic_fix = hubble_a * a ** (3 * gm1)
        else:
            hubble_a2 = fac_mu = fac_vsic_fix = 1.0

        # ---- ghost exchange, round B (hydro inputs; same selection with
        # the POST-iteration h so h_j-side pairs stay covered) ------------
        csnd_lcl = jnp.sqrt(cfg.gamma * sph.pressure
                            / jnp.maximum(sph.density, 1e-37))
        f1_lcl = jnp.abs(sph.div_vel) / (
            jnp.abs(sph.div_vel) + sph.curl_vel
            + 0.0001 * csnd_lcl / fac_mu
            / jnp.maximum(sph.hsml, 1e-30))
        pterm_lcl = sph.pressure / jnp.maximum(sph.density, 1e-37) ** 2 \
            * sph.dhsml_density_factor
        dt_lcl = (p.ti_endstep - p.ti_begstep).astype(jnp.float32) * tbi
        selB = _ghost_select(p.pos, is_gas, sph.hsml, gas_lo, gas_hi,
                             hmax_r, my)
        gb_fields = [p.pos[:, 0], p.pos[:, 1], p.pos[:, 2],
                     sph.vel_pred[:, 0], sph.vel_pred[:, 1],
                     sph.vel_pred[:, 2], mass, sph.hsml,
                     jnp.maximum(sph.density, 1e-37), pterm_lcl,
                     csnd_lcl, f1_lcl, dt_lcl,
                     jnp.zeros_like(mass), jnp.zeros_like(mass),
                     jnp.zeros_like(mass)]
        ghostsB, gvalidB, gb_ovf = _ship(selB, gb_fields, GB_F)
        ovf = ovf | gb_ovf

        # ---- hydro pair force: local candidates + dense ghosts -----------
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

        hacc, dtent, maxsig, ovs_h = jax.lax.map(
            hchunk, (tgtb.reshape(nchunk, cb, Gs),
                     orig.reshape(nchunk, cb, Gs)))
        hacc = hacc.reshape(nb, Gs, 3)
        dtent = dtent.reshape(nb, Gs)
        maxsig = maxsig.reshape(nb, Gs)
        ovf = ovf | jnp.any(ovs_h)

        h_ib = hsml_all[safe]
        f1_b = jnp.abs(divv_all[safe]) / (
            jnp.abs(divv_all[safe]) + curl_all[safe]
            + 0.0001 * csnd_all[safe] / fac_mu
            / jnp.maximum(h_ib, 1e-30))
        pterm_b = pres_all[safe] / jnp.maximum(rho_all[safe], 1e-37) ** 2 \
            * f_all[safe]
        gacc, gde, gms = _ghost_hydro(
            tposb.reshape(nb * Gs, 3), vpt.reshape(nb * Gs, 3),
            h_ib.reshape(nb * Gs), rho_all[safe].reshape(nb * Gs),
            pterm_b.reshape(nb * Gs), csnd_all[safe].reshape(nb * Gs),
            f1_b.reshape(nb * Gs), dt_all[safe].reshape(nb * Gs),
            tree.mass_s[safe].reshape(nb * Gs),
            active.reshape(nb * Gs), ghostsB, gvalidB,
            fac_mu, fac_vsic_fix, hubble_a2)
        hacc = hacc + gacc.reshape(nb, Gs, 3)
        dtent = dtent + gde.reshape(nb, Gs)
        maxsig = jnp.maximum(maxsig, gms.reshape(nb, Gs))

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

        # ---- kick + sync point (timestep.c; run.c:165) -------------------
        if os.environ.get("NGRAVS_LET_DEBUG"):
            jax.debug.print(
                "LET ovf sources: grav_exch={g} walk={w} ghostA={a} "
                "dens_gather={d} h_margin={h} ghostB={b} hydro_gather={y}",
                g=g_exch_ovf, w=res.overflow, a=g_ovf, d=d_ovf,
                h=h_margin_ovf, b=gb_ovf, y=jnp.any(ovs_h))

        dt_disp = sharded_dt_displacement(cfg, units, p, time_next)
        p, sph = mode_kick(p, sph, ti_next, dt_disp, time_next,
                           mode_extras)
        new_beg = new_end = pm_beg
        if pm_update:
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
            dt_b = -tables.gravkick_factor(new_beg,
                                           (new_beg + new_end) // 2)
            vp = p.vel + p.accel * dt_a[:, None] \
                + sph.hydro_accel * dt_h[:, None] + accel_pm * dt_b
            sph = sph.replace(vel_pred=jnp.where(
                is_gas[:, None], vp, sph.vel_pred))
        min_end = jax.lax.pmin(jnp.min(p.ti_endstep), AXIS)
        ovf = jax.lax.pmax(ovf | res.overflow, AXIS)
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

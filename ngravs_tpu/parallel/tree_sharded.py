"""Sharded Barnes-Hut gravity over the device mesh (Phase 5 scale-out).

The TPU-native replacement for the reference's distributed tree machinery
(domain decomposition + pseudo-particle exchange + export/import bunches,
domain.c / forcetree.c:345-431,766-819 / gravtree.c:102-285):

  reference mechanism                      -> here
  -------------------------------------------------------------------
  Peano-Hilbert domain decomposition       -> global Morton sort; shards own
  (domain.c:62-165)                           contiguous key ranges
  pseudo-particle moment exchange          -> one tiled `all_gather` of the
  (forcetree.c:766-819)                       drifted source set over ICI;
                                              every shard builds the identical
                                              octree (replicated-tree design)
  export/import bunch loop                 -> each shard walks only its own
  (gravtree.c:102-285)                        contiguous slice of
                                              Morton-sorted targets
  MPI_Allreduce(min Ti_endstep, run.c:165) -> lax.pmin inside shard_map

Design note: with the tree replicated, the walk (the dominant cost,
O(N log N) pair math) parallelizes perfectly over targets — contiguous
Morton-slice targets also maximize frontier overlap within a shard.  The
build (cheap segment-sums over a sort) is duplicated per device; the two
all_gathers move 2 x 32B/particle per step over ICI, negligible against the
walk at any N that fits HBM (~10^8 on v5e).  This is the same trade the
reference makes for its *top* tree (replicated on every rank,
domain.c:933-1165) pushed down to the full tree, which HBM capacity allows
and which removes every per-particle message round-trip.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..constants import SOFTFAC_SPLINE
from ..integrate.kdk import kick
from ..ops.tree import _compact_rows, build_tree, make_tree_forces
from ..ops.walk import _row_repeat
from .mesh import AXIS, sharded_dt_displacement


def make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                           n_local: int,
                           depth: int | None = None,
                           group_size: int | None = None,
                           node_list_cap: int = 4096,
                           leaf_list_cap: int = 4096,
                           fcap: int = 65536,
                           opening: str | None = None,
                           leaf_factor: float = 4.0,
                           pm_step: bool = True):
    """Build a jitted full simulation step over the mesh with tree forces:
    drift(all) -> all_gather sources -> replicated tree build -> per-shard
    static walk of the local target slice -> kick -> pmin sync point.

    `n_local` is the per-shard particle count (static).  Returns
    step(p, ti_current, ti_next, time_next) -> (p, min_endstep, overflow).

    Under PMGRID the walk is the Rcut-truncated short-range walk and the
    long-range force lives on its own integer timeline (timestep.c:350-408),
    with two program variants selected by the static `pm_step` flag exactly
    as in make_sharded_full_step: pm_step=True recomputes the sharded-FFT
    PM force and applies the midpoint-window PM kick, with signature
    step(p, ti_current, ti_next, time_next, pm_beg, pm_end) ->
    (p, min_endstep, overflow, pm_beg', pm_end'); pm_step=False holds
    p.accel_pm (base signature).
    """
    box = cfg.box_size if cfg.periodic else 0.0
    depth = depth if depth is not None else cfg.tree_depth
    group = group_size if group_size is not None else min(
        cfg.tree_group_size, max(64, 1 << (n_local - 1).bit_length()))
    fsoft_by_type = jnp.asarray(
        np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)
    soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))
    G = units.G
    err_tol = cfg.err_tol_force_acc
    if opening is None:
        opening = "bh" if cfg.type_of_opening_criterion == 0 else "relative"
    n_dev = mesh.devices.size
    from ..integrate.timeline import timebase_interval
    tbi = timebase_interval(cfg)

    # --- gravity: short-range (TreePM) or full tree walk -----------------
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
    pm_update = bool(cfg.pmgrid) and pm_step

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
        bucket=cfg.tree_bucket_size, depth=depth,
        theta=cfg.err_tol_theta, opening=opening, box_size=box,
        block_batch=max(1, min(8, n_local // group)),
        leaf_factor=leaf_factor, lattice_tables=lattice_tables,
        treepm=treepm)
    from ..ops.solver import apply_cosmo_corrections, cosmo_corrections
    corr = cosmo_corrections(cfg, G, units.hubble, lattice_tables)
    from .mesh import make_mode_kick
    mode_kick, n_mode_extras = make_mode_kick(cfg, units, tables,
                                              soft_by_type)

    def _step(p, ti_current, ti_next, time_next, pm_beg, pm_end,
              *mode_extras):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)

        # drift all local particles to the sync point (predict.c:31)
        dd = tables.drift_factor(ti_current, ti_next)
        p = p.replace(pos=p.pos + p.vel * dd)
        if box > 0:
            p = p.replace(pos=jnp.mod(p.pos, box))

        fsoft = fsoft_by_type[p.ptype]
        aold = err_tol * p.old_acc / G      # walk works in G=1 units
        mass = jnp.where(p.pid >= 0, p.mass, 0.0)  # padding rows are inert

        # source replication over ICI (pseudo-particle exchange analog)
        gath = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)
        pos_f, mass_f = gath(p.pos), gath(mass)
        grav_f, fsoft_f, aold_f = gath(p.grav), gath(fsoft), gath(aold)

        # identical replicated build on every shard (forcetree.c:61)
        tree = build_tree(pos_f, mass_f, grav_f, fsoft_f, aold_f,
                          depth=depth, n_gravs=cfg.n_gravs,
                          bucket=cfg.tree_bucket_size, box_size=box)

        # walk my contiguous slice of the Morton-sorted target list
        tgt = my * nloc + jnp.arange(nloc, dtype=jnp.int32)
        res = walk.static(tree, tgt, fcap=fcap)

        # return results to owner shards: gather sorted accelerations,
        # unsort via tree.order, slice my original-index range
        acc_sorted = gath(res.acc)                       # [N,3] sorted order
        pot_sorted = gath(res.pot)
        nia_sorted = gath(res.ninteract.astype(acc_sorted.dtype))
        n_tot = acc_sorted.shape[0]
        acc_full = jnp.zeros((n_tot, 3), acc_sorted.dtype) \
            .at[tree.order].set(acc_sorted)
        pot_full = jnp.zeros((n_tot,), pot_sorted.dtype) \
            .at[tree.order].set(pot_sorted)
        nia_full = jnp.zeros((n_tot,), nia_sorted.dtype) \
            .at[tree.order].set(nia_sorted)
        acc = jax.lax.dynamic_slice(acc_full, (my * nloc, 0), (nloc, 3)) * G
        pot = jax.lax.dynamic_slice(pot_full, (my * nloc,), (nloc,)) * G
        # cosmological corrections (gravtree.c:302-358, potential.c:251-337)
        acc, amag, pot = apply_cosmo_corrections(corr, p.pos, mass, p.grav,
                                                 acc, pot)
        accel_pm = p.accel_pm
        if pm_sharded is not None:
            if pm_update:
                # long-range PM forces (pmforce_periodic, pm_periodic.c:204)
                accel_pm = pm_sharded._forces_impl(p.pos, mass, p.grav)
            if cfg.output_potential or cfg.compute_potential_energy:
                # long-range PM potential (potential.c:268-306)
                pot = pot + pm_sharded._potential_impl(p.pos, mass, p.grav)
            # OldAcc includes the PM part under PMGRID (gravtree.c:322-330)
            amag = jnp.linalg.norm(acc + accel_pm, axis=-1)
        p = p.replace(accel=acc, potential=pot, accel_pm=accel_pm,
                      old_acc=amag,
                      # measured work for the next decomposition
                      # (GravCost, forcetree.c:1595 / domain.c:859-862)
                      grav_cost=jax.lax.dynamic_slice(
                          nia_full, (my * nloc,), (nloc,)))

        # kick the active set (timestep.c) — purely local, masked, with
        # the cross-shard RMS-displacement constraint (timestep.c:587-651)
        # and the FLEXSTEPS / PSEUDOSYMMETRIC / MAKEGLASS special modes
        dt_disp = sharded_dt_displacement(cfg, units, p, time_next)
        p, _ = mode_kick(p, None, ti_next, dt_disp, time_next, mode_extras)
        new_beg = new_end = pm_beg
        if pm_update:
            # PM long-range kick over the PM midpoint window
            # (timestep.c:350-408)
            from ..integrate.timeline import pm_window_update
            tstart, tend, new_beg, new_end = pm_window_update(
                ti_next, pm_beg, pm_end, dt_disp, float(tbi))
            dt_pmk = tables.gravkick_factor(tstart, tend)
            p = p.replace(vel=p.vel + accel_pm * dt_pmk)
        min_end = jax.lax.pmin(jnp.min(p.ti_endstep), AXIS)
        ovf = jax.lax.pmax(res.overflow, AXIS)
        if pm_update:
            return p, min_end, ovf, new_beg, new_end
        return p, min_end, ovf

    mspec = (P(),) * n_mode_extras
    if pm_update:
        step = jax.shard_map(
            _step, mesh=mesh,
            in_specs=(P(AXIS), P(), P(), P(), P(), P()) + mspec,
            out_specs=(P(AXIS), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step)

    def _step_nopm(p, ti_current, ti_next, time_next, *mode_extras):
        return _step(p, ti_current, ti_next, time_next,
                     jnp.int32(0), jnp.int32(0), *mode_extras)

    step = jax.shard_map(
        _step_nopm, mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P()) + mspec,
        out_specs=(P(AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def reshard_by_morton(p, mesh, box: float = 0.0):
    """Domain decomposition analog (domain.c:62 + peano.c:36): globally sort
    particles by Morton key and hand each shard a contiguous, equally-sized
    key range — shards become spatially compact, which maximizes tree-walk
    frontier sharing within a shard.

    Non-gas only (the runner keeps gas at the head of the arrays); sorts the
    whole pytree.  Implemented as gather + replicated argsort + local slice:
    O(N) replicated memory, one collective, deterministic.
    """
    from ..ops.morton import morton_keys2, sort_by_keys2

    def _reshard(p):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)
        gath = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)
        pf = jax.tree.map(gath, p)
        if box > 0:
            corner = jnp.zeros(3, pf.pos.dtype)
            inv_len = 1.0 / box
        else:
            lo = jnp.min(pf.pos, axis=0)
            hi = jnp.max(pf.pos, axis=0)
            root_len = jnp.max(hi - lo) * 1.0001 + 1e-30
            corner = (lo + hi) / 2 - root_len / 2
            inv_len = 1.0 / root_len
        khi, klo = morton_keys2(pf.pos, corner, inv_len, 10)
        order = sort_by_keys2(khi, klo)
        mine = jax.lax.dynamic_slice(order, (my * nloc,), (nloc,))
        return jax.tree.map(lambda a: a[mine], pf)

    fn = jax.shard_map(_reshard, mesh=mesh, in_specs=(P(AXIS),),
                       out_specs=P(AXIS), check_vma=False)
    return jax.jit(fn)(p)


def reshard_by_cost(p, mesh, sph=None, alloc_factor: float = 1.25,
                    box: float = 0.0, dt_inv=None):
    """Work-balanced domain decomposition (domain_sumCost + domain_findSplit,
    domain.c:347,823-877): globally Morton-sort, then hand each shard a
    CONTIGUOUS key range whose measured work sum  w_i = 1 + GravCost_i
    (optionally x 1/dt_i, domain.c:859-862) is as equal as possible.

    Static shapes force equal per-shard capacities, so capacity is
    ceil(N/n_dev * alloc_factor) (PartAllocFactor, allocate.c:103) and
    shards whose range is shorter carry inert padding rows (mass 0,
    pid -1, endstep past the horizon, hsml 0) — the same over-allocation
    trade the reference makes per rank.  Ranges longer than the capacity
    are clamped (the overflow spills to the next shard, like maxload
    clamping in domain_findSplit, domain.c:108,414-460).

    Host-orchestrated like the reference's decomposition; returns
    (p', sph') re-sharded over `mesh` with n_local = capacity.
    """
    from .domain_native import morton_argsort_host, weighted_split_host

    n_dev = mesh.devices.size
    pos = np.asarray(jax.device_get(p.pos), np.float32)
    if box > 0:
        corner = np.zeros(3)
        inv_len = 1.0 / box
    else:
        lo = pos.min(axis=0).astype(np.float64)
        hi = pos.max(axis=0).astype(np.float64)
        root_len = (hi - lo).max() * 1.0001 + 1e-30
        corner = (lo + hi) / 2 - root_len / 2
        inv_len = 1.0 / root_len
    # native (C++/OpenMP) key + sort + split kernels; numpy fallback
    order = morton_argsort_host(pos, corner, inv_len)
    n = order.shape[0]

    w = 1.0 + np.asarray(jax.device_get(p.grav_cost), np.float64)
    if dt_inv is not None:
        w *= np.asarray(jax.device_get(dt_inv), np.float64)
    w = np.where(np.asarray(jax.device_get(p.pid)) >= 0, w, 0.0)[order]
    cap = int(math.ceil(n / n_dev * alloc_factor))
    bounds = weighted_split_host(w, n_dev, cap)

    host = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), p)
    host_s = jax.tree.map(lambda a: a[order], host)
    sph_s = None
    if sph is not None:
        sph_s = jax.tree.map(
            lambda a: np.asarray(jax.device_get(a))[order], sph)

    def _block(tree_host, k):
        lo_b, hi_b = bounds[k], bounds[k + 1]
        m = hi_b - lo_b

        def _pad(a):
            out = np.zeros((cap,) + a.shape[1:], a.dtype)
            out[:m] = a[lo_b:hi_b]
            return out
        blk = jax.tree.map(_pad, tree_host)
        return blk, m

    pblocks, sblocks = [], []
    for k in range(n_dev):
        blk, m = _block(host_s, k)
        # inert padding (mesh.shard_particles convention)
        blk = blk.replace(
            pid=np.where(np.arange(cap) < m, blk.pid, -1),
            mass=np.where(np.arange(cap) < m, blk.mass, 0.0).astype(
                blk.mass.dtype),
            ti_endstep=np.where(np.arange(cap) < m, blk.ti_endstep,
                                np.int32(2 ** 30)).astype(np.int32))
        pblocks.append(blk)
        if sph_s is not None:
            sblk, _ = _block(sph_s, k)
            sblk = sblk.replace(
                hsml=np.where(np.arange(cap) < m, sblk.hsml, 0.0).astype(
                    sblk.hsml.dtype))
            sblocks.append(sblk)

    from jax.sharding import NamedSharding, PartitionSpec as P2
    sharding = NamedSharding(mesh, P2(AXIS))
    pcat = jax.tree.map(lambda *xs: jax.device_put(
        jnp.asarray(np.concatenate(xs)), sharding), *pblocks)
    scat = None
    if sblocks:
        scat = jax.tree.map(lambda *xs: jax.device_put(
            jnp.asarray(np.concatenate(xs)), sharding), *sblocks)
    return pcat, scat


def make_let_exchange(*, n_dev, NG, EXN, EXP, RCAP, theta, opening,
                      sr_cutoff, periodic, box):
    """Builder for the sender-driven LET cut + all_to_all exchange
    (forcetree.c:345-431/766-819 + gravtree.c:102-285 rebuilt sender-
    driven; shared by the collisionless LET step and the full
    TreePM+SPH LET step).

    Returns exchange(tree, boxes_lo, boxes_hi, aold_min, my, nloc) ->
    (recv [n_dev*RCAP, 8] packed source rows, ovf bool).  Row fields:
    x, y, z, mass, maxsoft, count, grav(bitcast), tag(bitcast; -2 node
    monopole, -3 raw particle, -1 dead)."""

    def _box_gap(lo_a, hi_a, lo_b, hi_b):
        g = jnp.maximum(lo_b - hi_a, lo_a - hi_b)
        if periodic:
            gp = jnp.maximum(lo_b - hi_a - box, lo_a - hi_b + box)
            gm = jnp.maximum(lo_b - hi_a + box, lo_a - hi_b - box)
            g = jnp.minimum(g, jnp.minimum(gp, gm))
        return g

    def exchange(tree, boxes_lo, boxes_hi, aold_min, my, nloc):
        # ---- sender-driven LET cut --------------------------------------
        m_tot = jnp.sum(tree.node_mass, axis=-1)           # [M]
        cl = tree.root_len * (2.0 ** -tree.node_level.astype(jnp.float32))
        half = 0.5 * cl[:, None]
        d2 = jnp.zeros((m_tot.shape[0], n_dev), jnp.float32)
        inter = jnp.ones((m_tot.shape[0], n_dev), bool)
        for ax in range(3):
            ga = _box_gap(tree.node_center[:, ax, None] - half,
                          tree.node_center[:, ax, None] + half,
                          boxes_lo[None, :, ax], boxes_hi[None, :, ax])
            d2 = d2 + jnp.maximum(ga, 0.0) ** 2
            inter = inter & (ga < 0.1 * cl[:, None])
        open_bh = (cl * cl)[:, None] > d2 * (theta * theta)
        openable = open_bh | inter                         # [M, n_dev]
        if opening == "relative":
            open_rel = (m_tot * cl * cl)[:, None] \
                > d2 * d2 * aold_min[None, :]
            openable = openable | open_rel
        valid = tree.node_pcount > 0
        par = jnp.maximum(tree.node_parent, 0)
        par_open = jnp.where((tree.node_parent >= 0)[:, None],
                             openable[par], True)
        exp_mono = valid[:, None] & ~openable & par_open
        exp_leaf = valid[:, None] & tree.node_terminal[:, None] & openable
        # never export to myself (the local walk covers it)
        notme = (jnp.arange(n_dev) != my)[None, :]
        exp_mono = exp_mono & notme
        exp_leaf = exp_leaf & notme
        if sr_cutoff > 0:
            # TreePM: the short-range factor is identically zero beyond
            # the transition cutoff — rows past it never ship
            # (forcetree.c:1828-1862 box discard, but sender-driven)
            within = d2 < np.float32(sr_cutoff * sr_cutoff)
            exp_mono = exp_mono & within
            exp_leaf = exp_leaf & within

        # ---- compact per receiver + pack rows ---------------------------
        nid_m, cnt_m = _compact_rows(
            jnp.broadcast_to(jnp.arange(m_tot.shape[0], dtype=jnp.int32)
                             [:, None], exp_mono.shape).T,
            exp_mono.T, EXN)                               # [n_dev, EXN]
        nid_l, cnt_l = _compact_rows(
            jnp.broadcast_to(jnp.arange(m_tot.shape[0], dtype=jnp.int32)
                             [:, None], exp_leaf.shape).T,
            exp_leaf.T, EXN)
        ovf = (jnp.max(cnt_m) > EXN) | (jnp.max(cnt_l) > EXN)

        bcf = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)
        neg1f = np.array(-1, np.int32).view(np.float32)
        safe_m = jnp.maximum(nid_m, 0)
        rows_m = []
        for g in range(NG):
            mg = tree.node_mass[safe_m, g]                 # [n_dev, EXN]
            okg = (nid_m >= 0) & (mg > 0)
            row = jnp.stack(
                [tree.node_cm[safe_m, g, 0], tree.node_cm[safe_m, g, 1],
                 tree.node_cm[safe_m, g, 2], jnp.where(okg, mg, 0.0),
                 tree.node_maxsoft[safe_m],
                 jnp.maximum(tree.node_count[safe_m, g], 1.0),
                 jnp.broadcast_to(bcf(jnp.full((1,), g, jnp.int32)),
                                  mg.shape),
                 jnp.where(okg, bcf(jnp.full((1,), -2, jnp.int32)), neg1f)],
                axis=-1)                                   # [n_dev, EXN, 8]
            rows_m.append(row)
        rows_m = jnp.concatenate(rows_m, axis=1)           # [n_dev, EXN*NG]

        # leaf particle expansion: ranges (start, pcount<=bucket)
        st_l = jnp.where(nid_l >= 0,
                         tree.node_start[jnp.maximum(nid_l, 0)], 0)
        pc_l = jnp.where(nid_l >= 0,
                         tree.node_pcount[jnp.maximum(nid_l, 0)], 0)
        cum = jnp.cumsum(pc_l, axis=1)
        tot_p = cum[:, -1]
        ovf = ovf | (jnp.max(tot_p) > EXP)
        rep = _row_repeat(st_l - (cum - pc_l), pc_l, EXP)
        piota = np.arange(EXP, dtype=np.int32)
        pidx = rep + piota[None, :]
        plive = piota[None, :] < tot_p[:, None]
        pidx = jnp.where(plive, jnp.minimum(pidx, nloc - 1), 0)
        prow = jnp.stack(
            [tree.pos_s[pidx, 0], tree.pos_s[pidx, 1], tree.pos_s[pidx, 2],
             jnp.where(plive, tree.mass_s[pidx], 0.0),
             tree.fsoft_s[pidx], jnp.ones_like(tree.mass_s[pidx]),
             bcf(tree.grav_s[pidx]),
             jnp.where(plive, bcf(jnp.full((1,), -3, jnp.int32)), neg1f)],
            axis=-1)                                       # [n_dev, EXP, 8]

        send = jnp.concatenate([rows_m, prow], axis=1)
        pad = RCAP - send.shape[1]
        if pad:
            padrow = jnp.zeros((n_dev, pad, 8), jnp.float32) \
                .at[:, :, 7].set(neg1f)
            send = jnp.concatenate([send, padrow], axis=1)
        recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0,
                                  tiled=True).reshape(n_dev * RCAP, 8)
        return recv, ovf

    return exchange


def make_let_remote_eval(*, wiring, groups, treepm, inv2a, lattice_tables,
                         fac_intp, ec, NG, periodic, box):
    """Builder for the dense remote-row gravity evaluation of LET rows
    (the import half of gravtree.c:102-285; closed-form TreePM truncation
    forcetree.c:1958-2027; optional Ewald lattice pass
    forcetree.c:2077-2432).

    Returns eval(recv [R, 8], tpos [n,3], tgrav, tsoft, tmass) ->
    (rx, ry, rz, rp) accumulated per target row."""

    def min_image(d):
        if not periodic:
            return d
        return d - box * jnp.round(d * (1.0 / box))

    def remote_eval(recv, tpos, tgrav, tsoft, tmass):
        nloc = tpos.shape[0]
        n_chunks = recv.shape[0] // ec

        def chunk_body(carry, sl):
            ax0, ay0, az0, ap0 = carry
            src = jax.lax.dynamic_slice(recv, (sl * ec, 0), (ec, 8))
            sg = jax.lax.bitcast_convert_type(src[:, 6], jnp.int32)
            sid = jax.lax.bitcast_convert_type(src[:, 7], jnp.int32)
            v = (sid != -1)[None, :]
            dx = min_image(src[None, :, 0] - tpos[:, 0:1])
            dy = min_image(src[None, :, 1] - tpos[:, 1:2])
            dz = min_image(src[None, :, 2] - tpos[:, 2:3])
            r2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(r2)
            h = jnp.maximum(tsoft[:, None], src[None, :, 4])
            sm = src[None, :, 3]
            sc = src[None, :, 5] if wiring.accumulator else 1.0
            fac = jnp.zeros_like(r)
            pk = jnp.zeros_like(r)
            multi = len(groups) > 1

            def law_fp(law):
                if treepm is None:
                    return (law.force_factor(tmass[:, None], sm, r2, r, h,
                                             sc),
                            law.potential_factor(tmass[:, None], sm, r2,
                                                 r, h, sc))
                # closed-form TreePM truncation (forcetree.c:1958-2027)
                u = r * inv2a
                sf, sp = law.kernel_shortrange()
                unsoft = law.accel(tmass[:, None], sm, r2, r, sc) * sf(u) \
                    / jnp.maximum(r, 1e-37)
                soft = law.spline(tmass[:, None], sm, h, r, sc)
                inside = u < 3.0
                f_k = jnp.where(inside,
                                jnp.where(r >= h, unsoft, soft), 0.0)
                punsoft = -law.potential(tmass[:, None], sm, r2, r, sc) \
                    * sp(u)
                psoft = law.spline_pot(tmass[:, None], sm, h, r, sc)
                p_k = jnp.where(inside,
                                jnp.where(r >= h, punsoft, psoft), 0.0)
                return f_k, p_k

            for law, slots in groups:
                if multi:
                    mk = None
                    for (i, j) in slots:
                        mij = (tgrav[:, None] == i) & (sg[None, :] == j)
                        mk = mij if mk is None else (mk | mij)
                f_k, p_k = law_fp(law)
                fac = jnp.where(mk, f_k, fac) if multi else f_k
                pk = jnp.where(mk, p_k, pk) if multi else p_k
            fac = jnp.where(v, fac, 0.0)
            ax_s = jnp.sum(fac * dx, axis=1)
            ay_s = jnp.sum(fac * dy, axis=1)
            az_s = jnp.sum(fac * dz, axis=1)
            ap_s = jnp.sum(jnp.where(v, pk, 0.0), axis=1)
            if lattice_tables is not None:
                # periodic lattice (Ewald) correction on the remote rows —
                # same second pass the local walk applies
                # (forcetree.c:2077-2432)
                from ..ops.lattice import lattice_correction
                pidx = (tgrav[:, None] * NG
                        + sg[None, :]).astype(jnp.int32)
                fcx, fcy, fcz, pc = lattice_correction(
                    lattice_tables, fac_intp, dx, dy, dz, pidx)
                smv = jnp.where(v, sm, 0.0)
                ax_s = ax_s + jnp.sum(smv * fcx, axis=1)
                ay_s = ay_s + jnp.sum(smv * fcy, axis=1)
                az_s = az_s + jnp.sum(smv * fcz, axis=1)
                ap_s = ap_s + jnp.sum(smv * pc, axis=1)
            return (ax0 + ax_s, ay0 + ay_s, az0 + az_s,
                    ap0 + ap_s), None

        z = jnp.zeros((nloc,), jnp.float32)
        (rx, ry, rz, rp), _ = jax.lax.scan(
            chunk_body, (z, z, z, z), np.arange(n_chunks, dtype=np.int32))
        return rx, ry, rz, rp

    return remote_eval


def make_let_tree_step(cfg, units, wiring, tables, mesh,
                       n_local: int,
                       depth: int | None = None,
                       expn_cap: int = 4096,
                       expp_cap: int = 8192,
                       ec: int = 512,
                       fcaps: dict | None = None,
                       opening: str | None = None,
                       pm_step: bool = True):
    """LET-mode sharded gravity step: per-shard memory o(N_total).

    The reference's locally-essential-tree machinery (pseudo-particle
    moments forcetree.c:345-431,766-819 + the export/import bunch loop
    gravtree.c:102-285) rebuilt TPU-first as ONE sender-driven exchange:

      1. every shard builds an octree over its OWN particles only, on the
         shared global root cell (pmin/pmax collectives);
      2. for every receiver shard r, the sender walks its own node arrays
         DENSELY ([M_local, n_dev] masks, no pointer chasing) and exports
         the *locally essential* cut: a node is exported as a monopole
         row iff the receiver's domain box cannot open it but could open
         its parent (both opening rules + the intersect rule, evaluated
         conservatively against r's whole bounding box); opened terminal
         nodes export their raw particles.  Chain monotonicity of the
         criteria guarantees the cut partitions the sender's mass.
      3. one all_to_all ships the packed rows; the receiver adds them as
         direct sources for ALL its targets (any row acceptable for the
         whole domain box is acceptable for every target block in it) on
         top of the exact fused walk over its local tree.

    No shard ever holds another shard's particle set — unlike the
    replicated-tree path (make_sharded_tree_step), which all_gathers all
    N_total particles and builds the identical octree everywhere.

    Collisionless; pure-tree (vacuum) or TreePM (the sharded-FFT mesh
    carries the periodicity; the short-range exchange only ships rows
    within the transition cutoff and evaluates them with the closed-form
    truncated factors of forcetree.c:1958-2027).  Under PMGRID two
    program variants exist selected by `pm_step`, exactly like
    make_sharded_tree_step.  Returns step(p, ti_current, ti_next,
    time_next[, pm_beg, pm_end]) -> (p, min_endstep, overflow
    [, pm_beg', pm_end']).
    """
    from ..ops.walk import make_fused_walk

    box = cfg.box_size if cfg.periodic else 0.0
    periodic = box > 0
    # periodic pure-tree: Ewald lattice-correction tables
    # (begrun.c:47-49: lattice_init when PERIODIC && !PMGRID).  The local
    # walk applies its lattice pass (forcetree.c:2077) and the remote LET
    # rows get the same correction in the dense eval below — the LET cut
    # partitions every sender's mass, so local rows + remote rows form
    # the complete interaction set the correction expects.
    lattice_tables = None
    if periodic and not cfg.pmgrid:
        from ..ops.lattice import build_lattice_tables
        lattice_tables = build_lattice_tables(wiring, cfg.ngravs_en,
                                              cfg.box_size)
    depth = depth if depth is not None else cfg.tree_depth
    n_dev = mesh.devices.size
    G = units.G
    err_tol = cfg.err_tol_force_acc
    theta = cfg.err_tol_theta
    NG = cfg.n_gravs
    fsoft_by_type = jnp.asarray(
        np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)
    soft_by_type = jnp.asarray(np.array(cfg.softening, np.float32))
    if opening is None:
        opening = "bh" if cfg.type_of_opening_criterion == 0 else "relative"
    fcaps = fcaps or {}
    from ..integrate.timeline import timebase_interval
    tbi = timebase_interval(cfg)
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
        # short-range factors vanish beyond u = r/(2 asmth) = 3
        # (forcetree.c:1962-2026): rows past the cutoff need not ship
        sr_cutoff = 6.0 * base_pm.asmth
        if not all(law.kernel_shortrange() is not None
                   for law, _ in wiring.unique_laws()):
            raise NotImplementedError(
                "LET TreePM needs closed-form short-range kernels for "
                "every wired law (remote rows are evaluated densely)")
    pm_update = bool(cfg.pmgrid) and pm_step
    inv2a = 0.5 / treepm["asmth"] if treepm is not None else 0.0
    walk = make_fused_walk(
        wiring, n_gravs=NG, depth=depth, bucket=cfg.tree_bucket_size,
        group_size=cfg.walk_group_size, batch_blocks=cfg.walk_batch_blocks,
        ent_cap=fcaps.get("ent", 2048), chunk_cap=fcaps.get("chunk", 2048),
        mono_cap=fcaps.get("mono", 1024),
        frontier_cap=fcaps.get("frontier", 2048), ec=cfg.walk_ec,
        theta=theta, opening=opening, box_size=box, treepm=treepm,
        lattice_tables=lattice_tables)
    from ..ops.solver import apply_cosmo_corrections, cosmo_corrections
    corr = cosmo_corrections(cfg, G, units.hubble, lattice_tables)
    fac_intp = (2 * (lattice_tables.shape[1] - 1) / box
                if lattice_tables is not None else 0.0)
    from .mesh import make_mode_kick
    mode_kick, n_mode_extras = make_mode_kick(cfg, units, tables,
                                              soft_by_type)
    groups = wiring.unique_laws()
    EXN = ((expn_cap + 7) // 8) * 8
    EXP = ((expp_cap + 7) // 8) * 8
    RCAP = ((EXN * NG + EXP + ec - 1) // ec) * ec

    let_exchange = make_let_exchange(
        n_dev=n_dev, NG=NG, EXN=EXN, EXP=EXP, RCAP=RCAP, theta=theta,
        opening=opening, sr_cutoff=sr_cutoff, periodic=periodic, box=box)
    let_remote_eval = make_let_remote_eval(
        wiring=wiring, groups=groups, treepm=treepm, inv2a=inv2a,
        lattice_tables=lattice_tables, fac_intp=fac_intp, ec=ec, NG=NG,
        periodic=periodic, box=box)

    def _step(p, ti_current, ti_next, time_next, pm_beg, pm_end,
              *mode_extras):
        nloc = p.pos.shape[0]
        my = jax.lax.axis_index(AXIS)
        dd = tables.drift_factor(ti_current, ti_next)
        p = p.replace(pos=p.pos + p.vel * dd)
        if box > 0:
            p = p.replace(pos=jnp.mod(p.pos, box))

        fsoft = fsoft_by_type[p.ptype]
        aold = err_tol * p.old_acc / G
        mass = jnp.where(p.pid >= 0, p.mass, 0.0)

        # ---- shared global root cell + receiver domain boxes ------------
        live = p.pid >= 0
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
        boxes_lo = jax.lax.all_gather(lo_l, AXIS)          # [n_dev, 3]
        boxes_hi = jax.lax.all_gather(hi_l, AXIS)
        aold_min = jax.lax.all_gather(
            jnp.min(jnp.where(live, aold, big)), AXIS)     # [n_dev]

        # ---- LOCAL tree over my particles only --------------------------
        tree = build_tree(p.pos, mass, p.grav, fsoft, aold,
                          depth=depth, n_gravs=NG,
                          bucket=cfg.tree_bucket_size,
                          group_size=cfg.walk_group_size,
                          corner=corner, root_len=root_len)

        # ---- sender-driven LET cut + exchange (make_let_exchange) ---
        recv, ovf = let_exchange(tree, boxes_lo, boxes_hi, aold_min,
                                 my, nloc)

        # ---- local exact walk + dense remote-row evaluation -------------
        tgt = jnp.arange(nloc, dtype=jnp.int32)
        res = walk(tree, tgt, rel=jnp.asarray(opening == "relative"))
        acc_sorted = res.acc
        pot_sorted = res.pot
        nia_sorted = res.ninteract

        rx, ry, rz, rp = let_remote_eval(recv, tree.pos_s, tree.grav_s,
                                         tree.fsoft_s, tree.mass_s)
        acc_sorted = acc_sorted + jnp.stack([rx, ry, rz], axis=-1)
        pot_sorted = pot_sorted + rp

        # unsort to local order, scale by G, corrections, kick
        inv = jnp.zeros((nloc,), jnp.int32).at[tree.order].set(
            jnp.arange(nloc, dtype=jnp.int32))
        acc = acc_sorted[inv] * G
        pot = pot_sorted[inv] * G
        nia = nia_sorted[inv]
        acc, amag, pot = apply_cosmo_corrections(corr, p.pos, mass, p.grav,
                                                 acc, pot)
        accel_pm = p.accel_pm
        if pm_sharded is not None:
            if pm_update:
                # long-range PM forces (pmforce_periodic, pm_periodic.c:204)
                accel_pm = pm_sharded._forces_impl(p.pos, mass, p.grav)
            if cfg.output_potential or cfg.compute_potential_energy:
                pot = pot + pm_sharded._potential_impl(p.pos, mass, p.grav)
            # OldAcc includes the PM part under PMGRID (gravtree.c:322-330)
            amag = jnp.linalg.norm(acc + accel_pm, axis=-1)
        p = p.replace(accel=acc, potential=pot, old_acc=amag,
                      accel_pm=accel_pm,
                      grav_cost=nia.astype(p.grav_cost.dtype))
        dt_disp = sharded_dt_displacement(cfg, units, p, time_next)
        p, _ = mode_kick(p, None, ti_next, dt_disp, time_next, mode_extras)
        new_beg = new_end = pm_beg
        if pm_update:
            # PM long-range kick over the PM midpoint window
            # (timestep.c:350-408)
            from ..integrate.timeline import pm_window_update
            tstart, tend, new_beg, new_end = pm_window_update(
                ti_next, pm_beg, pm_end, dt_disp, float(tbi))
            dt_pmk = tables.gravkick_factor(tstart, tend)
            p = p.replace(vel=p.vel + accel_pm * dt_pmk)
        min_end = jax.lax.pmin(jnp.min(p.ti_endstep), AXIS)
        ovf = jax.lax.pmax(ovf | res.overflow, AXIS)
        if pm_update:
            return p, min_end, ovf, new_beg, new_end
        return p, min_end, ovf

    mspec = (P(),) * n_mode_extras
    if pm_update:
        step = jax.shard_map(
            _step, mesh=mesh,
            in_specs=(P(AXIS), P(), P(), P(), P(), P()) + mspec,
            out_specs=(P(AXIS), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(step)

    def _step_nopm(p, ti_current, ti_next, time_next, *mode_extras):
        return _step(p, ti_current, ti_next, time_next,
                     jnp.int32(0), jnp.int32(0), *mode_extras)

    step = jax.shard_map(
        _step_nopm, mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P()) + mspec,
        out_specs=(P(AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)

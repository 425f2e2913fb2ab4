"""Fused single-dispatch Barnes-Hut walk: traverse -> flat list -> Pallas eval.

The production force path of the framework, replacing the host-paced
two-phase walk of `tree.py` for single-chip runs.  Rebuild of the
reference's hot loop `force_treeevaluate[_shortrange]` (forcetree.c:1244,
1623) as ONE traceable program per force pass, so it can run inside
device-resident multi-step segments (no host round trips — on a tunneled
TPU every sync costs tens of milliseconds).

Three stages, all shapes static, all demand adaptivity via learned caps:

 1. **Traverse** — level-synchronous compact-list expansion for a batch
    of B Morton-contiguous target blocks (the same conservative
    block-opening rules as tree.py: a node accepted for the block
    satisfies the per-target criterion of forcetree.c:1437-1473 for
    every member).  A static Python loop over tree levels; each level is
    ONE set of wide vectorized ops over the compacted (block, node)
    visit list.  Emits (node, gravity) entries and (block, chunk0,
    nchunk) leaf-hit ranges into batch-global compact lists.

 2. **Flatten** — per-block lists are packed into ONE flat generalized
    source buffer `[C*Ec, 8]` (block-major, each block's rows padded to a
    multiple of the eval chunk Ec), plus a `[C]` block-id per chunk.  All
    gathers from the packed source table happen here, once, at demand-
    proportional volume.

 3. **Eval** — a Pallas kernel with a 1-D grid over flat chunks: chunk c
    loads `[8, Ec]` source rows (contiguous DMA), the targets of block
    `blk[c]` (scalar-prefetch-routed BlockSpec), computes the `[G, Ec]`
    pair tile on the VPU, and accumulates into the block's output, which
    stays resident in VMEM across the chunks of one block (revisited
    output block).  Compute skips chunks past the true demand, making the
    pass demand-proportional end to end.

Total work = sum over blocks of (accepted rows x G) pair evaluations —
the TPU analog of Gadget's per-particle interaction count
(forcetree.c:1595), reported per target for GravCost/timings parity.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.wiring import GravityWiring
from .morton import MAX_DEPTH
from .tree import Octree, level_caps

INT32_MAX = np.int32(2**31 - 1)

# packed source-row columns (bitcast int32 in 6/7)
FX, FY, FZ, FMASS, FSOFT, FCOUNT, IGRAV, IGID = 0, 1, 2, 3, 4, 5, 6, 7


def _p2(x, minimum: int = 8) -> int:
    return max(minimum, 1 << int(math.ceil(math.log2(max(int(x), 1)))))


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedWalkResult(NamedTuple):
    acc: jnp.ndarray        # [Nt, 3] sorted-target order
    pot: jnp.ndarray        # [Nt]
    ninteract: jnp.ndarray  # [Nt] rows accepted for the target's block
    overflow: jnp.ndarray   # scalar bool — any cap exceeded
    max_ent: jnp.ndarray    # scalar int32 peak per-BATCH node entries
    max_chunk: jnp.ndarray  # scalar int32 peak per-BATCH leaf chunks
    max_rows: jnp.ndarray   # scalar int32 peak per-batch flat chunks
    max_frontier: jnp.ndarray  # scalar int32 peak per-batch frontier


def source_table_layout(n: int, m: int, n_gravs: int, leaf_factor: float):
    """Row layout of the packed generalized-source table (leaf-particle
    chunks, then per-(node,gravity) monopole rows, then 8 null + 8 junk)."""
    cap2 = _rup(max(int(n * leaf_factor) + 8, n), 8)
    nstart = cap2
    rows = cap2 + _rup(m * n_gravs, 8) + 16
    null_row = rows - 16
    return cap2, nstart, rows, null_row


@functools.partial(jax.jit, static_argnames=("n_gravs", "leaf_factor",
                                             "accumulator"))
def pack_source_table(tree: Octree, n_gravs: int, leaf_factor: float,
                      accumulator: bool = False):
    """[R, 8] packed sources: x, y, z, mass, soft, count, grav, gid
    (6/7 bitcast int32).  Leaf particles live in aligned 8-row chunks
    (256-byte contiguous gathers); node monopoles one row per gravity."""
    n = tree.pos_s.shape[0]
    m = tree.node_mass.shape[0]
    cap2, nstart, rows, null_row = source_table_layout(
        n, m, n_gravs, leaf_factor)
    bc = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.int32),
                                                jnp.float32)
    neg1f = np.array(-1, np.int32).view(np.float32)

    prow = jnp.stack(
        [tree.pos_s[:, 0], tree.pos_s[:, 1], tree.pos_s[:, 2],
         tree.mass_s, tree.fsoft_s, jnp.ones_like(tree.mass_s),
         bc(tree.grav_s), bc(np.arange(n, dtype=np.int32))], axis=1)

    cm = tree.node_cm.reshape(m * n_gravs, 3)
    nmass = tree.node_mass.reshape(m * n_gravs)
    if accumulator:
        ncount = jnp.maximum(tree.node_count.reshape(m * n_gravs), 1.0)
    else:
        ncount = jnp.ones_like(nmass)
    nsoft = jnp.repeat(tree.node_maxsoft, n_gravs)
    ngrav = np.tile(np.arange(n_gravs, dtype=np.int32), m)
    nrow = jnp.stack(
        [cm[:, 0], cm[:, 1], cm[:, 2], nmass, nsoft, ncount,
         bc(ngrav), bc(np.full((m * n_gravs,), -2, np.int32))], axis=1)

    tbl = jnp.asarray(np.zeros((rows, 8), np.float32)).at[:, IGID].set(neg1f)
    lr = jnp.where(tree.leaf_row < cap2, tree.leaf_row, rows - 8)
    tbl = tbl.at[lr].set(prow, mode="drop")
    tbl = jax.lax.dynamic_update_slice(tbl, nrow, (nstart, 0))
    tbl = tbl.at[rows - 16:, IGID].set(neg1f)
    tbl = tbl.at[rows - 16:, FMASS].set(0.0)
    return tbl


@functools.partial(jax.jit, static_argnames=("n_gravs",))
def pack_walk_table(tree: Octree, n_gravs: int):
    """[M, 8+4*NG] traversal rows: center xyz, flags, child0, nchild,
    chunk0, nchunk, then per-gravity (cm xyz, mass).  flags layout:
    bit0 terminal, bits 1..NG per-gravity mass>0, bits 8..12 node level
    (informational; the level-synchronous traversal knows the level
    statically)."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    flags = tree.node_terminal.astype(jnp.int32)
    for g in range(n_gravs):
        flags = flags | ((tree.node_mass[:, g] > 0).astype(jnp.int32)
                         << (1 + g))
    flags = flags | (tree.node_level << 8)
    cols = [tree.node_center[:, 0], tree.node_center[:, 1],
            tree.node_center[:, 2], bc(flags),
            bc(tree.node_child0), bc(tree.node_nchild),
            bc(tree.node_chunk0), bc(tree.node_nchunk)]
    for g in range(n_gravs):
        cols += [tree.node_cm[:, g, 0], tree.node_cm[:, g, 1],
                 tree.node_cm[:, g, 2], tree.node_mass[:, g]]
    return jnp.stack(cols, axis=1)


def make_fused_walk(wiring: GravityWiring, n_gravs: int, *,
                    depth: int, bucket: int = 32,
                    group_size: int = 64,
                    batch_blocks: int = 128,
                    ent_cap: int = 2048,
                    chunk_cap: int = 1024,
                    flat_chunks_cap: int = 4096,
                    frontier_cap: int = 1 << 17,
                    ec: int = 512,
                    theta: float = 0.5,
                    opening: str = "relative",
                    box_size: float = 0.0,
                    leaf_factor: float = 2.0,
                    want_pot: bool = True,
                    lattice_tables=None,
                    treepm: dict | None = None,
                    use_pallas: bool | None = None,
                    interpret: bool = False,
                    stage_limit: int = 3):
    """Build the fused walk.  Returns fn(tree, tgt_sorted, rel) ->
    FusedWalkResult — fully traceable (usable under jit / while_loop /
    shard_map).  All caps are static; exceeding any sets .overflow and the
    caller re-tunes (the analog of Gadget growing TreeAllocFactor on "too
    many nodes", forcetree.c:3176).

    `treepm`: dict(sr_ftab, sr_ptab, asmth, rcut) enables the short-range
    walk (Rcut discard forcetree.c:1828-1862 + tabulated/closed-form
    truncation :1958-2027).
    """
    G = group_size
    NG = n_gravs
    B = batch_blocks
    EC = ec
    CCAP = flat_chunks_cap

    assert G % 8 == 0 and EC % 128 == 0
    periodic = box_size > 0
    groups = wiring.unique_laws()
    single_law = len(groups) == 1
    use_count = wiring.accumulator

    rcut = 0.0
    tpm_tuple = None
    inv2a = 0.0
    if treepm is not None:
        tpm_tuple = (treepm["sr_ftab"], treepm["sr_ptab"],
                     float(treepm["asmth"]),
                     int(treepm["sr_ftab"].shape[-1]))
        rcut = float(treepm["rcut"])
        inv2a = 0.5 / float(treepm["asmth"])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" or interpret
    if use_pallas and treepm is not None:
        if any(law.kernel_shortrange() is None for law, _ in groups):
            use_pallas = False

    fac_intp = (2 * (lattice_tables.shape[1] - 1) / box_size
                if lattice_tables is not None else 0.0)

    def min_image(d):
        if not periodic:
            return d
        return d - box_size * jnp.round(d * (1.0 / box_size))

    def _bbox_gap(point, lo_b, hi_b):
        g = jnp.maximum(lo_b - point, point - hi_b)
        if periodic:
            gp = jnp.maximum(lo_b - point - box_size,
                             point + box_size - hi_b)
            gm = jnp.maximum(lo_b - point + box_size,
                             point - box_size - hi_b)
            g = jnp.minimum(g, jnp.minimum(gp, gm))
        return g

    # ------------------------------------------------------------------
    # Stage 1: traversal for one batch of B blocks (same opening logic as
    # tree.py's _t_queue; see that docstring for the criteria citations).
    #
    # LEVEL-SYNCHRONOUS SCATTER-FREE traversal: a static Python loop over
    # the <= depth-1 tree levels; each level processes the compacted
    # (block, node) visit list in ONE set of wide vectorized ops.  TPU
    # scatters serialize at ~element/cycle (profiled: the scatter-based
    # appends were >95%% of traversal time at N=1e6), so NOTHING here
    # scatters:
    #  - accepted (node,gravity) entries and terminal (block, chunk0,
    #    nchunk) leaf-hit RANGES are emitted as per-level candidate
    #    arrays (dead slots carry the blk=B sentinel) that are
    #    concatenated and grouped by ONE lax.sort at the end — sorts are
    #    ~100x cheaper than the equivalent scatter on TPU;
    #  - opened children compact into the next level's visit list by
    #    cumsum + searchsorted INVERSION (destination slot j gathers its
    #    source), i.e. gathers instead of scatter.
    # Ranges (not per-chunk ids) mean oversized depth-capped leaves need
    # no continuation revisits; flatten expands them.
    # ------------------------------------------------------------------
    def _traverse(tree, wtab, layout, tpos, tgid, taold, rel, n_static: int):
        V = frontier_cap            # per-level visit list cap
        init_lvl = min(2, depth)
        caps_l = level_caps(n_static, depth)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        off0 = int(offs_l[init_lvl])

        cap2, nstart, rows, null_row = layout
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        # static constants stay numpy: trace-time eager jnp ops each pay a
        # device round trip (+~1 s first-time compile on a tunneled TPU);
        # np literals embed into the jaxpr for free
        garange = np.arange(NG, dtype=np.int32)
        biota = np.arange(B, dtype=np.int32)
        big = np.float32(1e30)

        ovf = tree.n_chunk_rows > cap2

        tvalid = tgid >= 0
        blk_ok = jnp.any(tvalid, axis=1)
        lo_b = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)
        hi_b = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
        aold_b = jnp.min(jnp.where(tvalid, taold, big), axis=1)

        # per-level candidate lists, concatenated + sorted at the end
        ent_vals, ent_blks = [], []
        rng_c0s, rng_ncs, rng_blks = [], [], []
        e_tot = jnp.asarray(np.int32(0))
        c_tot = jnp.asarray(np.int32(0))
        r_tot = jnp.asarray(np.int32(0))

        if n_sh:
            # shallow real leaves (above the init level) go straight to
            # exact summation: one range per (block, shallow leaf)
            s_blk = jnp.repeat(jnp.where(blk_ok, biota, -1), n_sh)
            s_node = np.tile(np.arange(n_sh, dtype=np.int32), B)
            swn = wtab[s_node]
            s_nch = bc(swn[:, 7])
            ok = (s_blk >= 0) & (s_nch > 0)
            rng_c0s.append(bc(swn[:, 6]))
            rng_ncs.append(jnp.where(ok, s_nch, 0))
            rng_blks.append(jnp.where(ok, s_blk, B))
            r_tot = jnp.sum(ok.astype(jnp.int32))
            c_tot = jnp.sum(jnp.where(ok, s_nch, 0))

        # initial visit list: every live block x every init-level node
        W0 = B * n_init
        vblk = jnp.repeat(jnp.where(blk_ok, biota, -1), n_init)
        vnode = jnp.asarray(np.tile(
            off0 + np.arange(n_init, dtype=np.int32), B))
        v_n = jnp.asarray(np.int32(W0))
        fmax = jnp.asarray(np.int32(W0))

        import os as _os
        _maxlvl = int(_os.environ.get("NGRAVS_TRAV_LVLS", depth + 1))
        for lvl in range(init_lvl, min(depth, init_lvl + _maxlvl - 1) + 1):
            W = int(vblk.shape[0])
            wiota = np.arange(W, dtype=np.int32)
            live = wiota < v_n
            fblk = jnp.where(live, vblk, -1)
            fnode = jnp.where(live, vnode, 0)

            valid = fblk >= 0
            wn = wtab[fnode]
            fb = jnp.maximum(fblk, 0)
            lo = lo_b[fb]
            hi = hi_b[fb]
            aold_min = aold_b[fb]
            center = wn[:, 0:3]
            flags = bc(wn[:, 3])
            cell_len = tree.root_len * np.float32(2.0 ** -lvl)
            valid = valid & ((flags & 255) != 0)
            terminal = (flags & 1) > 0
            nch = bc(wn[:, 7])
            # nodes of the complete shallow levels under a real shallow
            # leaf carry moments but no chunks; the preamble already
            # summed those leaves directly — never re-count them
            valid = valid & ~(terminal & (nch == 0))
            cg = wn[:, 8:8 + 4 * NG].reshape(W, NG, 4)
            cm = cg[..., 0:3]
            m_g = cg[..., 3]

            d = jnp.maximum(
                _bbox_gap(cm, lo[:, None, :], hi[:, None, :]), 0.0)
            r2g = jnp.sum(d * d, axis=-1)
            r2min = jnp.min(jnp.where(m_g > 0, r2g, big), axis=-1)
            mtot = jnp.sum(m_g, axis=-1)

            open_bh = cell_len * cell_len > r2min * (theta * theta)
            open_rel = (mtot * cell_len * cell_len
                        > r2min * r2min * aold_min)
            must_open = jnp.where(rel, open_rel, open_bh)
            gap = _bbox_gap(center, lo, hi)
            intersects = jnp.all(gap < 0.6 * cell_len, axis=-1)
            must_open = must_open | intersects

            if rcut > 0:
                beyond = jnp.any(gap - 0.5 * cell_len > rcut, axis=-1)
                valid = valid & ~beyond

            accept = valid & ~must_open
            rest = valid & must_open
            leaf_here = rest & terminal
            expand = rest & ~terminal

            # entry candidates: [W, NG] rows, dead slots -> blk B
            gbits = jnp.where(
                accept[:, None],
                (flags[:, None] >> (1 + garange)) & 1, 0)
            e_ok = gbits > 0
            ent_vals.append(nstart + fnode[:, None] * NG + garange)
            ent_blks.append(jnp.where(
                e_ok, jnp.broadcast_to(fb[:, None], (W, NG)), B))
            e_tot = e_tot + jnp.sum(gbits)

            # leaf-hit range candidates (expanded to chunk ids in flatten)
            rng_c0s.append(bc(wn[:, 6]))
            rng_ncs.append(jnp.where(leaf_here, nch, 0))
            rng_blks.append(jnp.where(leaf_here, fb, B))
            nch_leaf = jnp.sum(jnp.where(leaf_here, nch, 0))
            r_tot = r_tot + jnp.sum(leaf_here.astype(jnp.int32))
            c_tot = c_tot + nch_leaf

            if lvl == depth:
                break  # depth-level nodes are terminal by construction

            # compact opened children into the next level's list via
            # cumsum + searchsorted inversion (gathers, no scatter)
            Wn = min(V, B * caps_l[lvl + 1], 8 * W)
            ncc = jnp.where(expand, bc(wn[:, 5]), 0)
            x_run = jnp.cumsum(ncc)
            total = x_run[-1]
            jiota = np.arange(Wn, dtype=np.int32)
            src = jnp.searchsorted(x_run, jiota, side="right") \
                .astype(jnp.int32)
            src = jnp.minimum(src, W - 1)
            k = jiota - (x_run[src] - ncc[src])
            inside = jiota < total
            vblk = jnp.where(inside, fblk[src], -1)
            vnode = jnp.where(inside, bc(wn[:, 4])[src] + k, 0)
            v_n = jnp.minimum(total, Wn)
            fmax = jnp.maximum(fmax, total)
            ovf = ovf | (total > Wn)

        # entry/range lists are exact-width (sums of level widths): they
        # cannot overflow; ent_cap/chunk_cap survive only as demand hints

        # group per block: ONE stable multi-operand sort by block id
        # (junk blk=B sorts last); widths are exact sums of level widths
        ent_blk = jnp.concatenate([a.reshape(-1) for a in ent_blks])
        ent_val = jnp.concatenate([a.reshape(-1) for a in ent_vals])
        ent_blk, ent_val = jax.lax.sort((ent_blk, ent_val), num_keys=1)
        rng_blk = jnp.concatenate(rng_blks)
        rng_c0 = jnp.concatenate(rng_c0s)
        rng_nc = jnp.concatenate(rng_ncs)
        rng_blk, rng_c0, rng_nc = jax.lax.sort(
            (rng_blk, rng_c0, rng_nc), num_keys=1)
        return (ent_val, ent_blk, rng_c0, rng_nc, rng_blk,
                e_tot, c_tot, r_tot, ovf, fmax)

    # ------------------------------------------------------------------
    # Stage 2: flatten one batch's lists into the chunked source buffer.
    # SCATTER-FREE: every flat slot GATHERS its source (per-block
    # boundaries from searchsorted over the block-sorted lists; leaf-hit
    # ranges expanded by a second searchsorted over their cumsum), then
    # ONE row gather from the packed source table.
    # ------------------------------------------------------------------
    def _flatten(gsrc, layout, ent_val, ent_blk, rng_c0, rng_nc, rng_blk,
                 e_tot, c_tot, blk_live):
        cap2, nstart, rows, null_row = layout
        null_chunk = null_row // 8
        max_chunk_id = cap2 // 8
        EW = int(ent_blk.shape[0])
        RW = int(rng_blk.shape[0])
        bp1 = np.arange(B + 1, dtype=np.int32)

        # per-block entry counts / first-index from sorted-list boundaries
        ebnd = jnp.searchsorted(ent_blk, bp1).astype(jnp.int32)   # [B+1]
        ne = ebnd[1:] - ebnd[:-1]
        starts_e = ebnd[:-1]
        # per-block chunk counts: prefix sums of range lengths at the
        # block boundaries of the sorted range list
        rbnd = jnp.searchsorted(rng_blk, bp1).astype(jnp.int32)
        nc_r = jnp.where(rng_blk < B, rng_nc, 0)
        cumnc = jnp.cumsum(nc_r)                                  # [RW]
        cumnc0 = jnp.concatenate(
            [jnp.asarray(np.zeros((1,), np.int32)), cumnc])
        nc = cumnc0[rbnd[1:]] - cumnc0[rbnd[:-1]]
        bstart = cumnc0[rbnd[:-1]]             # global chunk rank start

        ne8 = _rup_t(ne)                       # node rows padded to 8
        rows_b = ne8 + 8 * nc
        n_ck = (rows_b + EC - 1) // EC
        n_ck = jnp.where(blk_live, jnp.maximum(n_ck, 1), n_ck)
        ck_off = jnp.cumsum(n_ck) - n_ck       # exclusive, ascending
        c_used = jnp.sum(n_ck)
        ovf = c_used > CCAP

        # block id per flat chunk: blk[c] = rightmost b with ck_off[b]<=c
        carang = np.arange(CCAP, dtype=np.int32)
        blk_ids = jnp.searchsorted(ck_off, carang, side="right") \
            .astype(jnp.int32) - 1
        blk_ids = jnp.clip(blk_ids, 0, B - 1)
        # tail chunks (c >= c_used) keep the last valid block id so the
        # kernel never re-initializes a finished output block
        last_blk = blk_ids[jnp.maximum(c_used - 1, 0)]
        blk_ids = jnp.where(carang < c_used, blk_ids, last_blk)

        # chunk-granularity source ids [CCAP * EC/8]
        ec8 = EC // 8
        siota = np.arange(CCAP * ec8, dtype=np.int32)
        c_s = siota // ec8
        b_s = blk_ids[c_s]
        row8 = (c_s - ck_off[b_s]) * ec8 + siota % ec8
        crank = row8 - ne8[b_s] // 8           # chunk rank within block
        is_chunk = (crank >= 0) & (crank < nc[b_s]) & (c_s < c_used)
        grank = jnp.clip(bstart[b_s] + crank, 0, None)
        ri = jnp.minimum(
            jnp.searchsorted(cumnc, grank, side="right").astype(jnp.int32),
            RW - 1)
        chid = rng_c0[ri] + grank - (cumnc[ri] - nc_r[ri])
        chid = jnp.where(chid < max_chunk_id, chid, null_chunk)
        fchk = jnp.where(is_chunk, chid, -1)

        # row-granularity source rows: entry region of each block gathers
        # from the sorted entry list; chunk region from fchk expansion
        jiota = np.arange(CCAP * EC, dtype=np.int32)
        c_j = jiota // EC
        b_j = blk_ids[c_j]
        rowb = (c_j - ck_off[b_j]) * EC + jiota % EC
        is_ent = (rowb >= 0) & (rowb < ne[b_j]) & (c_j < c_used)
        erow = ent_val[jnp.clip(starts_e[b_j] + rowb, 0, EW - 1)]
        frow = jnp.where(is_ent, erow, null_row)
        j8 = np.arange(8, dtype=np.int32)
        fexp = (fchk[:, None] * 8 + j8).reshape(-1)
        frow = jnp.where(fexp >= 0, fexp, frow)

        fsrc = gsrc[frow]                      # ONE gather, [CCAP*EC, 8]

        # transposed chunk layout for lane-contiguous kernel loads
        fsrc_t = fsrc.reshape(CCAP, EC, 8).transpose(0, 2, 1)  # [C, 8, Ec]
        return fsrc_t, blk_ids, c_used, rows_b, ovf

    def _rup_t(x):
        return ((x + 7) // 8) * 8

    # ------------------------------------------------------------------
    # Stage 3: the pair-evaluation kernel.
    # ------------------------------------------------------------------
    def law_factors(law, tmass, smass, r2, r, h, scount):
        """Pair force/potential factors; closed-form TreePM truncation
        (forcetree.c:1958-2027) when treepm is active."""
        if tpm_tuple is None:
            fac = law.force_factor(tmass, smass, r2, r, h, scount)
            pot = law.potential_factor(tmass, smass, r2, r, h, scount) \
                if want_pot else None
            return fac, pot
        u = r * inv2a
        sf, sp = law.kernel_shortrange()
        unsoft = law.accel(tmass, smass, r2, r, scount) * sf(u) \
            / jnp.maximum(r, 1e-37)
        soft = law.spline(tmass, smass, h, r, scount)
        inside = u < 3.0
        fac = jnp.where(inside, jnp.where(r >= h, unsoft, soft), 0.0)
        pot = None
        if want_pot:
            punsoft = -law.potential(tmass, smass, r2, r, scount) * sp(u)
            psoft = law.spline_pot(tmass, smass, h, r, scount)
            pot = jnp.where(inside, jnp.where(r >= h, punsoft, psoft), 0.0)
        return fac, pot

    def _pair_mask(pair_slots, tg, sg):
        m = None
        for (i, j) in pair_slots:
            mij = (tg == i) & (sg == j)
            m = mij if m is None else (m | mij)
        return m

    def _tile_math(tx, ty, tz, tm, tgv, tf, tgid_c, sp_chunk):
        """[G,1] target columns vs [1,Ec] source rows -> per-pair factors.
        Shared by the Pallas kernel body and the XLA fallback."""
        sx = sp_chunk[FX:FX + 1, :]
        sy = sp_chunk[FY:FY + 1, :]
        sz = sp_chunk[FZ:FZ + 1, :]
        smass = sp_chunk[FMASS:FMASS + 1, :]
        ssoft = sp_chunk[FSOFT:FSOFT + 1, :]

        dx = min_image(sx - tx)
        dy = min_image(sy - ty)
        dz = min_image(sz - tz)
        r2 = dx * dx + dy * dy + dz * dz
        r = jnp.sqrt(r2)
        h = jnp.maximum(tf, ssoft)
        scount = sp_chunk[FCOUNT:FCOUNT + 1, :] if use_count else 1.0
        return dx, dy, dz, r2, r, h, smass, scount

    def _dispatch(tgv, sgv, tm, smass, r2, r, h, scount):
        if single_law:
            return law_factors(groups[0][0], tm, smass, r2, r, h, scount)
        fac = jnp.zeros_like(r2)
        pot = jnp.zeros_like(r2) if want_pot else None
        for law, slots in groups:
            mk = _pair_mask(slots, tgv, sgv)
            f_k, p_k = law_factors(law, tm, smass, r2, r, h, scount)
            fac = jnp.where(mk, f_k, fac)
            if want_pot:
                pot = jnp.where(mk, p_k, pot)
        return fac, pot

    def _kernel(blk_ids, nck, fsrc_ref, tpack_ref, out_ref):
        c = pl.program_id(0)
        prev = blk_ids[jnp.maximum(c - 1, 0)]
        first = (c == 0) | (blk_ids[c] != prev)

        @pl.when(first)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(c < nck[0])
        def _():
            sp_chunk = fsrc_ref[0]                    # [8, Ec]
            t = tpack_ref[0]                          # [G, 8]
            tx = t[:, FX:FX + 1]
            ty = t[:, FY:FY + 1]
            tz = t[:, FZ:FZ + 1]
            tm = t[:, FMASS:FMASS + 1]
            tf = t[:, FSOFT:FSOFT + 1]
            tgv = pltpu.bitcast(t[:, IGRAV:IGRAV + 1], jnp.int32)
            tgid = pltpu.bitcast(t[:, IGID:IGID + 1], jnp.int32)
            sgv = pltpu.bitcast(sp_chunk[IGRAV:IGRAV + 1, :], jnp.int32)
            sgid = pltpu.bitcast(sp_chunk[IGID:IGID + 1, :], jnp.int32)

            dx, dy, dz, r2, r, h, smass, scount = _tile_math(
                tx, ty, tz, tm, tgv, tf, tgid, sp_chunk)
            fac, pot = _dispatch(tgv, sgv, tm, smass, r2, r, h, scount)
            valid = (sgid != -1) & (tgid >= 0) & (sgid != tgid)
            fac = jnp.where(valid, fac, 0.0)

            ax = jnp.sum(fac * dx, axis=1, keepdims=True)
            ay = jnp.sum(fac * dy, axis=1, keepdims=True)
            az = jnp.sum(fac * dz, axis=1, keepdims=True)
            if want_pot:
                pp = jnp.sum(jnp.where(valid, pot, 0.0), axis=1,
                             keepdims=True)
            else:
                pp = jnp.zeros_like(ax)
            nv = jnp.sum(jnp.where(valid, 1.0, 0.0), axis=1, keepdims=True)
            delta = jnp.concatenate(
                [ax, ay, az, pp, nv,
                 jnp.zeros((ax.shape[0], 3), ax.dtype)], axis=1)
            out_ref[0] = out_ref[0] + delta

    def _eval_pallas(fsrc_t, blk_ids, c_used, tpack):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(CCAP,),
            in_specs=[
                pl.BlockSpec((1, 8, EC), lambda c, blk, nck: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, 8),
                             lambda c, blk, nck: (blk[c], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, 8),
                                   lambda c, blk, nck: (blk[c], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, G, 8), jnp.float32),
            interpret=interpret,
        )(blk_ids, c_used.reshape(1).astype(jnp.int32), fsrc_t, tpack)
        return out

    def _eval_xla(fsrc_t, blk_ids, c_used, tpack):
        """Traced fallback with the same flat layout (CPU tests, and
        TreePM laws without a closed-form short-range kernel: uses the
        f64-tabulated transition tables instead)."""
        from .shortrange import longrange_force_factor, longrange_pot_factor

        def chunk_math(spc, blk):
            t = tpack[blk]                           # [G, 8]
            tx = t[:, FX:FX + 1]
            ty = t[:, FY:FY + 1]
            tz = t[:, FZ:FZ + 1]
            tm = t[:, FMASS:FMASS + 1]
            tf = t[:, FSOFT:FSOFT + 1]
            bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            tgv = bc(t[:, IGRAV:IGRAV + 1])
            tgid = bc(t[:, IGID:IGID + 1])
            sgv = bc(spc[IGRAV:IGRAV + 1, :])
            sgid = bc(spc[IGID:IGID + 1, :])
            dx, dy, dz, r2, r, h, smass, scount = _tile_math(
                tx, ty, tz, tm, tgv, tf, tgid, spc)
            if tpm_tuple is not None:
                sr_ftab, sr_ptab, asmth, ntab = tpm_tuple
                pair_full = tgv * NG + sgv
                lr, inside = longrange_force_factor(sr_ftab, asmth, ntab,
                                                    r, pair_full)
                lrp, _ = longrange_pot_factor(sr_ptab, asmth, ntab, r,
                                              pair_full)
                pair_idx = jnp.asarray(wiring.pair_index_matrix())
                pair_of = pair_idx[tgv, sgv]
                fac = jnp.zeros_like(r)
                pot = jnp.zeros_like(r) if want_pot else None
                for k, (law, _) in enumerate(groups):
                    f_k = law.force_factor_tpm(tm, smass, r2, r, h,
                                               scount, lr)
                    fac = f_k if single_law else \
                        jnp.where(pair_of == k, f_k, fac)
                    if want_pot:
                        p_k = law.potential_factor_tpm(tm, smass, r2, r, h,
                                                       scount, lrp)
                        pot = p_k if single_law else \
                            jnp.where(pair_of == k, p_k, pot)
                fac = jnp.where(inside, fac, 0.0)
                if want_pot:
                    pot = jnp.where(inside, pot, 0.0)
            else:
                fac, pot = _dispatch(tgv, sgv, tm, smass, r2, r, h, scount)
            valid = (sgid != -1) & (tgid >= 0) & (sgid != tgid)
            fac = jnp.where(valid, fac, 0.0)
            return jnp.stack(
                [jnp.sum(fac * dx, axis=1), jnp.sum(fac * dy, axis=1),
                 jnp.sum(fac * dz, axis=1),
                 (jnp.sum(jnp.where(valid, pot, 0.0), axis=1)
                  if want_pot else np.zeros((G,), np.float32)),
                 jnp.sum(jnp.where(valid, 1.0, 0.0), axis=1)],
                axis=-1)                              # [G, 5]

        def chunk_fn(carry, xs):
            out = carry
            spc, blk, cidx = xs
            # chunks past the demand are genuinely skipped (lax.cond), so
            # the fallback's cost is demand-proportional like the kernel's
            delta = jax.lax.cond(
                cidx < c_used,
                lambda: chunk_math(spc, blk),
                lambda: np.zeros((G, 5), np.float32))
            out = out.at[blk, :, :5].add(delta)
            return out, None

        out0 = jnp.asarray(np.zeros((B, G, 8), np.float32))
        cidx = np.arange(CCAP, dtype=np.int32)
        out, _ = jax.lax.scan(chunk_fn, out0, (fsrc_t, blk_ids, cidx))
        return out

    def _lattice_pass(fsrc_t, blk_ids, c_used, tpack):
        """Periodic lattice (Ewald) correction over the same flat list
        (the reference's second walk, forcetree.c:2077-2432)."""
        from .lattice import lattice_correction

        def chunk_math(spc, blk):
            t = tpack[blk]
            bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            tgv = bc(t[:, IGRAV:IGRAV + 1])
            tgid = bc(t[:, IGID:IGID + 1])
            sgv = bc(spc[IGRAV:IGRAV + 1, :])
            sgid = bc(spc[IGID:IGID + 1, :])
            dx = min_image(spc[FX:FX + 1, :] - t[:, FX:FX + 1])
            dy = min_image(spc[FY:FY + 1, :] - t[:, FY:FY + 1])
            dz = min_image(spc[FZ:FZ + 1, :] - t[:, FZ:FZ + 1])
            pidx = tgv * NG + sgv
            fcx, fcy, fcz, pc = lattice_correction(
                lattice_tables, fac_intp, dx, dy, dz, pidx)
            valid = (sgid != -1) & (tgid >= 0) & (sgid != tgid)
            sm = jnp.where(valid, spc[FMASS:FMASS + 1, :], 0.0)
            return jnp.stack(
                [jnp.sum(sm * fcx, axis=1), jnp.sum(sm * fcy, axis=1),
                 jnp.sum(sm * fcz, axis=1),
                 (jnp.sum(sm * pc, axis=1) if want_pot
                  else np.zeros((G,), np.float32)),
                 np.zeros((G,), np.float32)], axis=-1)

        def chunk_fn(carry, xs):
            out = carry
            spc, blk, cidx = xs
            delta = jax.lax.cond(
                cidx < c_used,
                lambda: chunk_math(spc, blk),
                lambda: np.zeros((G, 5), np.float32))
            out = out.at[blk, :, :5].add(delta)
            return out, None

        out0 = jnp.asarray(np.zeros((B, G, 8), np.float32))
        cidx = np.arange(CCAP, dtype=np.int32)
        out, _ = jax.lax.scan(chunk_fn, out0, (fsrc_t, blk_ids, cidx))
        return out

    # ------------------------------------------------------------------
    # Composition.
    # ------------------------------------------------------------------
    rel_true = np.bool_(True)
    rel_false = np.bool_(False)
    rel_default = rel_true if opening == "relative" else rel_false

    def fused_forces(tree: Octree, tgt_sorted: jnp.ndarray,
                     opening_override: str | None = None,
                     rel=None) -> FusedWalkResult:
        """Forces on sorted-order target indices (-1 padding).  One traced
        program; batches run under lax.map (device-resident loop)."""
        if rel is None:
            rel = rel_default if opening_override is None else \
                (rel_true if opening_override == "relative" else rel_false)
        n = tree.pos_s.shape[0]
        m = tree.node_mass.shape[0]
        layout = source_table_layout(n, m, NG, leaf_factor)
        gsrc = pack_source_table(tree, NG, leaf_factor,
                                 accumulator=wiring.accumulator)
        wtab = pack_walk_table(tree, NG)

        nt = int(tgt_sorted.shape[0])
        nb0 = (nt + G - 1) // G
        nbatch = (nb0 + B - 1) // B
        nbp = nbatch * B
        pad = nbp * G - nt
        tgt = jnp.concatenate(
            [tgt_sorted, np.full((pad,), -1, np.int32)]) if pad \
            else tgt_sorted
        tgt_b = tgt.reshape(nbp, G)
        safe = jnp.maximum(tgt_b, 0)
        bcf = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)
        tgid = jnp.where(tgt_b >= 0, safe, -1)
        tpack_all = jnp.stack(
            [tree.pos_s[safe, 0], tree.pos_s[safe, 1], tree.pos_s[safe, 2],
             tree.mass_s[safe], tree.fsoft_s[safe],
             jnp.zeros_like(tree.mass_s[safe]),
             bcf(tree.grav_s[safe]), bcf(tgid)], axis=-1)  # [nbp, G, 8]
        taold_all = tree.aold_s[safe]

        def batch_fn(bi):
            tp = jax.lax.dynamic_slice_in_dim(tpack_all, bi * B, B, axis=0)
            ta = jax.lax.dynamic_slice_in_dim(taold_all, bi * B, B, axis=0)
            tpos = tp[..., 0:3]
            tg = jax.lax.bitcast_convert_type(tp[..., IGID], jnp.int32)
            (ent_val, ent_blk, rng_c0, rng_nc, rng_blk, e_tot, c_tot,
             r_tot, ovf1, fmax) = _traverse(
                tree, wtab, layout, tpos, tg, ta, rel, n)
            if stage_limit <= 1:   # profiling aid: traversal only
                out = jnp.asarray(np.zeros((B, G, 8), np.float32)) \
                    .at[0, 0, 0].add((e_tot + c_tot).astype(jnp.float32))
                nia = jnp.asarray(np.zeros((B, G), np.int32))
                return out, nia, ovf1, jnp.stack(
                    [e_tot, c_tot, jnp.zeros_like(e_tot), fmax])
            blk_live = jnp.any(tg >= 0, axis=1)
            fsrc_t, blk_ids, c_used, rows_b, ovf2 = _flatten(
                gsrc, layout, ent_val, ent_blk, rng_c0, rng_nc, rng_blk,
                e_tot, c_tot, blk_live)
            c_eff = jnp.minimum(c_used, CCAP)
            if stage_limit <= 2:   # profiling aid: traversal + flatten
                out = jnp.asarray(np.zeros((B, G, 8), np.float32)) \
                    .at[0, 0, 0].add(jnp.sum(fsrc_t[:, FMASS]))
                nia = jnp.broadcast_to(rows_b[:, None],
                                       (B, G)).astype(jnp.int32)
                stats = jnp.stack([e_tot, c_tot, c_used, fmax])
                return out, nia, ovf1 | ovf2, stats
            if use_pallas:
                out = _eval_pallas(fsrc_t, blk_ids, c_eff, tp)
            else:
                out = _eval_xla(fsrc_t, blk_ids, c_eff, tp)
            if lattice_tables is not None:
                out = out + _lattice_pass(fsrc_t, blk_ids, c_eff, tp)
            # per-target interaction count = the block's accepted rows
            nia = jnp.broadcast_to(rows_b[:, None], (B, G)).astype(jnp.int32)
            stats = jnp.stack([e_tot, c_tot, c_used, fmax])
            return out, nia, ovf1 | ovf2, stats

        if nbatch == 1:
            out, nia, ovf, stats = batch_fn(jnp.int32(0))
            outs, nias = out[None], nia[None]
            ovfs, statss = ovf[None], stats[None]
        else:
            outs, nias, ovfs, statss = jax.lax.map(
                batch_fn, np.arange(nbatch, dtype=np.int32))
        out_all = outs.reshape(nbp * G, 8)[:nt]
        nia_all = nias.reshape(nbp * G)[:nt]
        ovf = jnp.any(ovfs)
        stats = jnp.max(statss, axis=0)
        return FusedWalkResult(
            acc=out_all[:, 0:3], pot=out_all[:, 3],
            ninteract=nia_all, overflow=ovf,
            max_ent=stats[0], max_chunk=stats[1],
            max_rows=stats[2], max_frontier=stats[3])

    fused_forces.group_size = G
    fused_forces.batch_blocks = B
    return fused_forces

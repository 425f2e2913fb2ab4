"""Fused single-dispatch Barnes-Hut walk: traverse -> row lists -> Pallas eval.

The production force path of the framework, replacing the host-paced
two-phase walk of `tree.py` for single-chip runs.  Rebuild of the
reference's hot loop `force_treeevaluate[_shortrange]` (forcetree.c:1244,
1623) as ONE traceable program per force pass, so it can run inside
device-resident multi-step segments (no host round trips — on a tunneled
TPU every sync costs tens of milliseconds).

v3 layout (round 3): everything is **per-block row-major** `[B, ...]` —
one row per Morton-contiguous target block.  The round-2 design kept
batch-global compacted lists, which required two giant `lax.sort`s to
group entries by block and a full-capacity flatten gather; profiled on
the chip those were 99.5% of the force pass.  Per-block rows make the
block id an array coordinate, so grouping is free:

 1. **Traverse** — level-synchronous frontier expansion, one frontier
    `[B, F_l]` per tree level (live-prefix per row).  The opening rules
    are the same conservative block tests as before (a node accepted for
    the block satisfies the per-target criterion of forcetree.c:1437-1473
    for every member).  Child expansion is a per-row `repeat` (cumsum +
    batched scatter of run starts — no sorts, no searchsorted over
    global lists).  Each level records (node id, accepted, leaf-chunk
    range) per slot; the per-level records are simply concatenated along
    the row axis.

 2. **Flatten** — two per-row compactions (cumsum + row scatter) produce
    the accepted-monopole list `[B, E]` and the leaf-chunk list `[B, CL]`;
    from those, one gather builds the per-block eval row-id list `[B, R]`
    (monopole rows first, then leaf-particle rows, live prefix), and ONE
    row gather from the packed source table materializes the eval input
    `[B, C, 8, Ec]`.  All volumes are per-block caps learned from
    measured demand — no batch-global capacity is ever materialized.

 3. **Eval** — a Pallas kernel with a (B, C) grid: step (b, c) loads
    source chunk `[8, Ec]` (contiguous), the targets of block b, computes
    the `[G, Ec]` pair tile on the VPU, and accumulates into the block's
    output, which stays resident in VMEM across the chunks of one block
    (revisited output block).  Chunks past the block's true demand
    (`c >= nck[b]`, scalar-prefetched) are skipped.

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
    max_ent: jnp.ndarray    # scalar int32 peak per-BLOCK accepted nodes
    max_chunk: jnp.ndarray  # scalar int32 peak per-BLOCK leaf chunks
    max_rows: jnp.ndarray   # scalar int32 peak per-block eval chunks
    max_frontier: jnp.ndarray  # [depth+1] int32 peak per-level frontier


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


def _row_repeat(vals, repeats, total: int):
    """Batched `jnp.repeat(vals[b], repeats[b], total_repeat_length=total)`
    per row — cumsum + row scatter of run starts, no sorts."""
    def one(v, r):
        return jnp.repeat(v, r, total_repeat_length=total)
    return jax.vmap(one)(vals, repeats)


def normalize_frontier_caps(frontier_caps, depth: int):
    """Per-level frontier caps as a tuple[depth+1]; int -> clamped 8^l."""
    if isinstance(frontier_caps, (int, np.integer)):
        return tuple(min(int(frontier_caps), 8 ** min(lvl, 10))
                     for lvl in range(depth + 1))
    caps = tuple(int(c) for c in frontier_caps)
    assert len(caps) == depth + 1, (len(caps), depth)
    return caps


def make_fused_walk(wiring: GravityWiring, n_gravs: int, *,
                    depth: int, bucket: int = 32,
                    group_size: int = 64,
                    batch_blocks: int = 128,
                    ent_cap: int = 2048,
                    chunk_cap: int = 512,
                    frontier_cap=2048,
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
    shard_map).  All caps are static **per-block** quantities; exceeding
    any sets .overflow and the caller re-tunes (the analog of Gadget
    growing TreeAllocFactor on "too many nodes", forcetree.c:3176).

    `ent_cap`: accepted monopole nodes per block; `chunk_cap`: leaf 8-row
    chunks per block; `frontier_cap`: per-level frontier slots per block
    (int, or a per-level tuple learned from demand).

    `treepm`: dict(sr_ftab, sr_ptab, asmth, rcut) enables the short-range
    walk (Rcut discard forcetree.c:1828-1862 + tabulated/closed-form
    truncation :1958-2027).
    """
    G = group_size
    NG = n_gravs
    B = batch_blocks
    EC = ec
    E = _rup(ent_cap, 8)
    CL = _rup(chunk_cap, 8)
    R = _rup(E * NG + CL * 8, EC)
    C = R // EC
    fcaps_l = normalize_frontier_caps(frontier_cap, depth)

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
    # LEVEL-SYNCHRONOUS per-block-row traversal: a static Python loop
    # over the <= depth-1 tree levels; each level processes one frontier
    # array [B, F_l] (live prefix per row) with wide vectorized ops.
    # Nothing crosses block rows, so no sorts and no block-boundary
    # searches exist anywhere; the only "irregular" ops are per-row
    # cumsums, one batched scatter per compaction, and row gathers.
    # ------------------------------------------------------------------
    def _traverse(tree, wtab, layout, tpos, tgid, taold, rel, n_static: int):
        init_lvl = min(2, depth)
        caps_l = level_caps(n_static, depth)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        off0 = int(offs_l[init_lvl])

        cap2, nstart, rows, null_row = layout
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        # static constants stay numpy: trace-time eager jnp ops each pay a
        # device round trip; np literals embed into the jaxpr for free
        big = np.float32(1e30)
        biota = np.arange(B, dtype=np.int32)

        ovf = tree.n_chunk_rows > cap2

        tvalid = tgid >= 0
        blk_ok = jnp.any(tvalid, axis=1)
        lo_b = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)
        hi_b = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
        aold_b = jnp.min(jnp.where(tvalid, taold, big), axis=1)

        # per-level records, concatenated along axis 1 at the end
        ids_ls, acc_ls, nc_ls, c0_ls = [], [], [], []
        lvl_live = [jnp.zeros((), jnp.int32)] * (depth + 1)

        if n_sh:
            # shallow real leaves (above the init level) go straight to
            # exact summation: one range per (block, shallow leaf)
            s_node = np.arange(n_sh, dtype=np.int32)
            swn = wtab[s_node]                      # [n_sh, 16]
            s_nch = bc(swn[:, 7])
            s_ok = blk_ok[:, None] & (s_nch > 0)[None, :]
            ids_ls.append(jnp.broadcast_to(s_node[None, :], (B, n_sh)))
            acc_ls.append(jnp.zeros((B, n_sh), bool))
            nc_ls.append(jnp.where(s_ok, s_nch[None, :], 0))
            c0_ls.append(jnp.broadcast_to(bc(swn[:, 6])[None, :],
                                          (B, n_sh)))

        # initial frontier: every live block x every init-level node
        F = min(n_init, fcaps_l[init_lvl])
        fnode = jnp.broadcast_to(
            off0 + np.arange(F, dtype=np.int32)[None, :], (B, F))
        nlive = jnp.where(blk_ok, np.int32(min(n_init, F)), 0)
        ovf = ovf | (n_init > F)

        for lvl in range(init_lvl, depth + 1):
            F = int(fnode.shape[1])
            fiota = np.arange(F, dtype=np.int32)
            live = fiota[None, :] < nlive[:, None]          # [B, F]
            lvl_live[lvl] = jnp.max(nlive)

            wn = wtab[jnp.where(live, fnode, 0)]            # [B, F, 8+4NG]
            flags = bc(wn[:, :, 3])
            valid = live & ((flags & 255) != 0)
            terminal = (flags & 1) > 0
            nch = bc(wn[:, :, 7])
            # nodes of the complete shallow levels under a real shallow
            # leaf carry moments but no chunks; the preamble already
            # summed those leaves directly — never re-count them
            valid = valid & ~(terminal & (nch == 0))
            center = wn[:, :, 0:3]
            cg = wn[:, :, 8:8 + 4 * NG].reshape(B, F, NG, 4)
            cm = cg[..., 0:3]
            m_g = cg[..., 3]
            cell_len = tree.root_len * np.float32(2.0 ** -lvl)

            d = jnp.maximum(
                _bbox_gap(cm, lo_b[:, None, None, :],
                          hi_b[:, None, None, :]), 0.0)
            r2g = jnp.sum(d * d, axis=-1)
            r2min = jnp.min(jnp.where(m_g > 0, r2g, big), axis=-1)
            mtot = jnp.sum(m_g, axis=-1)

            open_bh = cell_len * cell_len > r2min * (theta * theta)
            open_rel = (mtot * cell_len * cell_len
                        > r2min * r2min * aold_b[:, None])
            must_open = jnp.where(rel, open_rel, open_bh)
            gap = _bbox_gap(center, lo_b[:, None, :], hi_b[:, None, :])
            intersects = jnp.all(gap < 0.6 * cell_len, axis=-1)
            must_open = must_open | intersects

            if rcut > 0:
                beyond = jnp.any(gap - 0.5 * cell_len > rcut, axis=-1)
                valid = valid & ~beyond

            accept = valid & ~must_open
            rest = valid & must_open
            leaf_here = rest & terminal
            expand = rest & ~terminal

            ids_ls.append(fnode)
            acc_ls.append(accept)
            nc_ls.append(jnp.where(leaf_here, nch, 0))
            c0_ls.append(bc(wn[:, :, 6]))

            if lvl == depth:
                break  # depth-level nodes are terminal by construction

            # expand children into the next frontier: per-row repeat of
            # (child0, exclusive-cumsum) runs — child ranges are ascending
            # and disjoint, so nextnode = child0[run] + offset-in-run
            Fn = min(fcaps_l[lvl + 1], caps_l[lvl + 1], 8 * F)
            ncc = jnp.where(expand, bc(wn[:, :, 5]), 0)
            cum = jnp.cumsum(ncc, axis=1)
            total = cum[:, -1]
            cumex = cum - ncc
            child0 = bc(wn[:, :, 4])
            rep_c0 = _row_repeat(child0, ncc, Fn)
            rep_cx = _row_repeat(cumex, ncc, Fn)
            niota = np.arange(Fn, dtype=np.int32)
            fnode = jnp.where(niota[None, :] < total[:, None],
                              rep_c0 + (niota[None, :] - rep_cx), 0)
            nlive = jnp.minimum(total, Fn)
            ovf = ovf | jnp.any(total > Fn)

        ids = jnp.concatenate(ids_ls, axis=1)
        acc = jnp.concatenate(acc_ls, axis=1)
        ncs = jnp.concatenate(nc_ls, axis=1)
        c0s = jnp.concatenate(c0_ls, axis=1)
        return ids, acc, ncs, c0s, ovf, jnp.stack(lvl_live)

    # ------------------------------------------------------------------
    # Stage 2: flatten the per-block records into the eval row-id list
    # and gather the eval source buffer.  Two per-row compactions
    # (cumsum + batched scatter), one chunk expansion (per-row repeat),
    # one combining gather, one source-table row gather.
    # ------------------------------------------------------------------
    def _flatten(gsrc, wtab, layout, ids, acc, ncs, c0s):
        cap2, nstart, rows, null_row = layout
        null_chunk = null_row // 8
        max_chunk_id = cap2 // 8
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        rows2 = np.arange(B, dtype=np.int32)[:, None]

        # accepted-monopole list [B, E]
        apos = jnp.cumsum(acc.astype(jnp.int32), axis=1)
        nacc = apos[:, -1]
        aidx = jnp.where(acc, apos - 1, E)
        mono = jnp.full((B, E), -1, jnp.int32) \
            .at[rows2, aidx].set(ids, mode="drop")
        ovf = jnp.any(nacc > E)

        # leaf-chunk ranges -> compacted (c0, nc) [B, CL] -> chunk ids
        rv = ncs > 0
        rpos = jnp.cumsum(rv.astype(jnp.int32), axis=1)
        ridx = jnp.where(rv, rpos - 1, CL)
        c0c = jnp.zeros((B, CL), jnp.int32) \
            .at[rows2, ridx].set(c0s, mode="drop")
        ncr = jnp.zeros((B, CL), jnp.int32) \
            .at[rows2, ridx].set(ncs, mode="drop")
        cum_r = jnp.cumsum(ncr, axis=1)
        # true demand from the uncompacted records (scatter drops can
        # truncate cum_r when ranges exceed CL — never under-report)
        cl = jnp.sum(ncs, axis=1)
        ovf = ovf | jnp.any(cl > CL) | jnp.any(rpos[:, -1] > CL)
        rep_c0 = _row_repeat(c0c, ncr, CL)
        rep_cx = _row_repeat(cum_r - ncr, ncr, CL)
        ciota = np.arange(CL, dtype=np.int32)
        chid = rep_c0 + (ciota[None, :] - rep_cx)
        chid = jnp.where(ciota[None, :] < cl[:, None], chid, null_chunk)
        chid = jnp.where(chid < max_chunk_id, chid, null_chunk)

        # per-block eval row ids [B, R]: monopole rows then leaf rows
        flags_i = bc(wtab[:, 3])
        gb = flags_i[jnp.maximum(mono, 0)]               # [B, E]
        garange = np.arange(NG, dtype=np.int32)
        hasg = ((gb[..., None] >> (1 + garange)) & 1) > 0
        hasg = hasg & (mono[..., None] >= 0)
        mrows = jnp.where(hasg, nstart + mono[..., None] * NG + garange,
                          null_row).reshape(B, E * NG)
        j8 = np.arange(8, dtype=np.int32)
        crows = (chid[..., None] * 8 + j8).reshape(B, CL * 8)

        jiota = np.arange(R, dtype=np.int32)
        off = (nacc * NG)[:, None]                        # [B, 1]
        in_mono = jiota[None, :] < off
        mi = jnp.minimum(jiota[None, :], E * NG - 1)
        ci = jnp.clip(jiota[None, :] - off, 0, CL * 8 - 1)
        rowids = jnp.where(
            in_mono,
            jnp.take_along_axis(mrows, mi * jnp.ones((B, 1), jnp.int32),
                                axis=1),
            jnp.take_along_axis(crows, ci, axis=1))
        used = nacc * NG + cl * 8
        rowids = jnp.where(jiota[None, :] < used[:, None], rowids, null_row)

        fsrc = gsrc[rowids]                               # [B, R, 8]
        fsrc_t = fsrc.reshape(B, C, EC, 8).transpose(0, 1, 3, 2)
        nck = jnp.clip((used + EC - 1) // EC, 0, C)
        return fsrc_t, nck, used, nacc, cl, ovf

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

    def _kernel(nck, fsrc_ref, tpack_ref, out_ref):
        b = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(c < nck[b])
        def _():
            sp_chunk = fsrc_ref[0, 0]                 # [8, Ec]
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

    def _eval_pallas(fsrc_t, nck, tpack):
        out = pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, C),
                in_specs=[
                    pl.BlockSpec((1, 1, 8, EC),
                                 lambda b, c, nck: (b, c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G, 8),
                                 lambda b, c, nck: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, G, 8),
                                       lambda b, c, nck: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, G, 8), jnp.float32),
            interpret=interpret,
        )(nck.astype(jnp.int32), fsrc_t, tpack)
        return out

    def _chunk_scan(chunk_math, fsrc_t, nck, tpack):
        """XLA fallback scaffolding: scan the [B, C] chunk grid, skipping
        chunks past each block's demand (demand-proportional like the
        kernel)."""
        fsrc_f = fsrc_t.reshape(B * C, 8, EC)
        blk = np.repeat(np.arange(B, dtype=np.int32), C)
        cin = np.tile(np.arange(C, dtype=np.int32), B)

        def chunk_fn(carry, xs):
            out = carry
            spc, b, ci = xs
            delta = jax.lax.cond(
                ci < nck[b],
                lambda: chunk_math(spc, b),
                lambda: np.zeros((G, 5), np.float32))
            out = out.at[b, :, :5].add(delta)
            return out, None

        out0 = jnp.asarray(np.zeros((B, G, 8), np.float32))
        out, _ = jax.lax.scan(chunk_fn, out0, (fsrc_f, blk, cin))
        return out

    def _eval_xla(fsrc_t, nck, tpack):
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

        return _chunk_scan(chunk_math, fsrc_t, nck, tpack)

    def _lattice_pass(fsrc_t, nck, tpack):
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

        return _chunk_scan(chunk_math, fsrc_t, nck, tpack)

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
            ids, acc, ncs, c0s, ovf1, lvl_live = _traverse(
                tree, wtab, layout, tpos, tg, ta, rel, n)
            if stage_limit <= 1:   # profiling aid: traversal only
                out = jnp.asarray(np.zeros((B, G, 8), np.float32)) \
                    .at[0, 0, 0].add(
                        jnp.sum(acc).astype(jnp.float32)
                        + jnp.sum(ncs).astype(jnp.float32))
                nia = jnp.asarray(np.zeros((B, G), np.int32))
                return (out, nia, ovf1,
                        jnp.stack([jnp.sum(acc), jnp.sum(ncs),
                                   jnp.zeros((), jnp.int32)]), lvl_live)
            fsrc_t, nck, used, nacc, cl, ovf2 = _flatten(
                gsrc, wtab, layout, ids, acc, ncs, c0s)
            stats = jnp.stack([jnp.max(nacc), jnp.max(cl), jnp.max(nck)])
            if stage_limit <= 2:   # profiling aid: traversal + flatten
                out = jnp.asarray(np.zeros((B, G, 8), np.float32)) \
                    .at[0, 0, 0].add(jnp.sum(fsrc_t[:, :, FMASS]))
                nia = jnp.broadcast_to(used[:, None],
                                       (B, G)).astype(jnp.int32)
                return out, nia, ovf1 | ovf2, stats, lvl_live
            if use_pallas:
                out = _eval_pallas(fsrc_t, nck, tp)
            else:
                out = _eval_xla(fsrc_t, nck, tp)
            if lattice_tables is not None:
                out = out + _lattice_pass(fsrc_t, nck, tp)
            # per-target interaction count = the block's accepted rows
            nia = jnp.broadcast_to(used[:, None], (B, G)).astype(jnp.int32)
            return out, nia, ovf1 | ovf2, stats, lvl_live

        if nbatch == 1:
            out, nia, ovf, stats, lvl = batch_fn(jnp.int32(0))
            outs, nias = out[None], nia[None]
            ovfs, statss, lvls = ovf[None], stats[None], lvl[None]
        else:
            outs, nias, ovfs, statss, lvls = jax.lax.map(
                batch_fn, np.arange(nbatch, dtype=np.int32))
        out_all = outs.reshape(nbp * G, 8)[:nt]
        nia_all = nias.reshape(nbp * G)[:nt]
        ovf = jnp.any(ovfs)
        stats = jnp.max(statss, axis=0)
        lvl_max = jnp.max(lvls, axis=0)
        return FusedWalkResult(
            acc=out_all[:, 0:3], pot=out_all[:, 3],
            ninteract=nia_all, overflow=ovf,
            max_ent=stats[0], max_chunk=stats[1],
            max_rows=stats[2], max_frontier=lvl_max)

    fused_forces.group_size = G
    fused_forces.batch_blocks = B
    fused_forces.frontier_caps = fcaps_l
    return fused_forces

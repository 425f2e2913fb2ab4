"""Fused single-dispatch Barnes-Hut walk with inline monopole evaluation.

The production force path of the framework, replacing the host-paced
two-phase walk of `tree.py` for single-chip runs.  Rebuild of the
reference's hot loop `force_treeevaluate[_shortrange]` (forcetree.c:1244,
1623) as ONE traceable program per force pass, so it can run inside
device-resident multi-step segments (no host round trips — on a tunneled
TPU every sync costs tens of milliseconds).

v4 layout (round 3): **evaluate monopoles while traversing**.  Profiling
on the chip showed the v3 walk spent 99.5% of a force pass building and
gathering interaction *lists* (per-level sorts / full-capacity flatten
gathers / take_along_axis at max-over-block caps) and 0.5% evaluating
them; every irregular XLA op (gather/scatter/sort) on this hardware runs
at ~1e8 rows/s while dense VPU math runs at ~5e9 pair-interactions/s.
The v4 design removes the monopole lists entirely:

 1. **Traverse + evaluate** — level-synchronous frontier expansion, one
    frontier `[B, F_l]` per tree level (live prefix per row).  The walk
    table row of every frontier node (gathered once per visit) carries
    everything the pair force needs — per-gravity CM, mass, count, max
    softening — so nodes passing the acceptance test are evaluated
    **immediately** as a dense `[B, F, G]` tile against the block's
    targets and accumulated into `[B, G, 3]`; nothing is ever written to
    an interaction list.  Opening tests use per-SUBGROUP target bounding
    boxes (S sub-boxes of G/S targets each): a node is opened iff some
    subgroup requires it, which keeps Morton-straddling blocks (whose
    full-block bbox spans distant clumps) from opening the entire tree.
    Criteria are the same conservative per-block forms of
    forcetree.c:1437-1473 (both BH and relative), Rcut discard for
    TreePM (forcetree.c:1828-1862), and the "intersects" rule forcing
    open for nodes overlapping the target box.

 2. **Leaf lists** — only *leaf chunks* (8-row aligned particle blocks of
    opened bucket nodes) still go through a list: per-block compaction
    (cumsum + one dropping scatter), per-row run expansion to chunk ids,
    and ONE chunk-granular gather `[B, CL, 64]` from the packed source
    table (256-byte contiguous rows).

 3. **Leaf evaluation** — a dense masked `[B, CL*8, G]` pair tile
    against the block targets, scanned in slices to bound the live
    temporary, on the VPU; identical physics dispatch to the monopole
    tile (unique-law loop with broadcast gravity masks — never a traced
    2-D index gather).

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
    max_ent: jnp.ndarray    # scalar int32 peak per-BLOCK leaf records
    max_chunk: jnp.ndarray  # scalar int32 peak per-BLOCK leaf chunks
    max_rows: jnp.ndarray   # scalar int32 peak per-block monopole rows
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


def walk_table_width(n_gravs: int, accumulator: bool) -> int:
    """Columns of the traversal/eval walk table, padded to a multiple
    of 8 for efficient row gathers."""
    w = 9 + 4 * n_gravs + (n_gravs if accumulator else 0)
    return _rup(w, 8)


@functools.partial(jax.jit, static_argnames=("n_gravs", "accumulator"))
def pack_walk_table(tree: Octree, n_gravs: int, accumulator: bool = False):
    """[M, W] traversal+eval rows: center xyz, flags, child0, nchild,
    chunk0, nchunk, maxsoft, then per-gravity (cm xyz, mass)
    [, per-gravity count].  flags layout: bit0 terminal, bits 1..NG
    per-gravity mass>0, bits 8..12 node level (informational)."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    flags = tree.node_terminal.astype(jnp.int32)
    for g in range(n_gravs):
        flags = flags | ((tree.node_mass[:, g] > 0).astype(jnp.int32)
                         << (1 + g))
    flags = flags | (tree.node_level << 8)
    cols = [tree.node_center[:, 0], tree.node_center[:, 1],
            tree.node_center[:, 2], bc(flags),
            bc(tree.node_child0), bc(tree.node_nchild),
            bc(tree.node_chunk0), bc(tree.node_nchunk),
            tree.node_maxsoft]
    for g in range(n_gravs):
        cols += [tree.node_cm[:, g, 0], tree.node_cm[:, g, 1],
                 tree.node_cm[:, g, 2], tree.node_mass[:, g]]
    if accumulator:
        for g in range(n_gravs):
            cols.append(jnp.maximum(tree.node_count[:, g], 1.0))
    w = walk_table_width(n_gravs, accumulator)
    while len(cols) < w:
        cols.append(jnp.zeros_like(tree.node_maxsoft))
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
                    stage_limit: int = 3,
                    subgroups: int = 4):
    """Build the fused walk.  Returns fn(tree, tgt_sorted, rel) ->
    FusedWalkResult — fully traceable (usable under jit / while_loop /
    shard_map).  All caps are static **per-block** quantities; exceeding
    any sets .overflow and the caller re-tunes (the analog of Gadget
    growing TreeAllocFactor on "too many nodes", forcetree.c:3176).

    `ent_cap`: per-block leaf RECORDS (opened bucket nodes);
    `chunk_cap`: per-block leaf 8-row chunks; `frontier_cap`: per-level
    frontier slots per block (int, or a per-level tuple learned from
    demand).  `ec` slices the dense eval loops (live-temporary bound).

    `treepm`: dict(sr_ftab, sr_ptab, asmth, rcut) enables the short-range
    walk (Rcut discard forcetree.c:1828-1862 + closed-form/tabulated
    truncation :1958-2027).
    """
    G = group_size
    NG = n_gravs
    B = batch_blocks
    S = subgroups
    GS = G // S
    E = _rup(ent_cap, 8)          # leaf records per block
    CL = _rup(chunk_cap, 8)       # leaf chunks per block
    EVK = max(128, ec // 4)       # dense-eval slice length (sources)

    assert G % S == 0 and G % 8 == 0
    periodic = box_size > 0
    groups = wiring.unique_laws()
    single_law = len(groups) == 1
    use_count = wiring.accumulator
    W = walk_table_width(NG, use_count)
    fcaps_l = normalize_frontier_caps(frontier_cap, depth)

    rcut = 0.0
    tpm_tuple = None
    inv2a = 0.0
    if treepm is not None:
        tpm_tuple = (treepm["sr_ftab"], treepm["sr_ptab"],
                     float(treepm["asmth"]),
                     int(treepm["sr_ftab"].shape[-1]))
        rcut = float(treepm["rcut"])
        inv2a = 0.5 / float(treepm["asmth"])
    closed_form = treepm is None or all(
        law.kernel_shortrange() is not None for law, _ in groups)

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
    # Physics dispatch (shared by monopole and leaf tiles).
    # All operands broadcast over an arbitrary tile shape; `sg` may be a
    # static int (monopole NG-unrolled loop) or a traced array (leaves).
    # ------------------------------------------------------------------
    def law_factors(law, tmass, smass, r2, r, h, scount, pair_full=None):
        """Pair force/potential factors; closed-form TreePM truncation
        (forcetree.c:1958-2027) when treepm is active."""
        if tpm_tuple is None:
            fac = law.force_factor(tmass, smass, r2, r, h, scount)
            pot = law.potential_factor(tmass, smass, r2, r, h, scount) \
                if want_pot else None
            return fac, pot
        if closed_form:
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
                pot = jnp.where(inside,
                                jnp.where(r >= h, punsoft, psoft), 0.0)
            return fac, pot
        # tabulated transition (f64-built tables; XLA gather — slow on
        # TPU, retained for laws without a closed-form kernel)
        from .shortrange import longrange_force_factor, longrange_pot_factor
        sr_ftab, sr_ptab, asmth, ntab = tpm_tuple
        lr, inside = longrange_force_factor(sr_ftab, asmth, ntab, r,
                                            pair_full)
        fac = law.force_factor_tpm(tmass, smass, r2, r, h, scount, lr)
        fac = jnp.where(inside, fac, 0.0)
        pot = None
        if want_pot:
            lrp, _ = longrange_pot_factor(sr_ptab, asmth, ntab, r,
                                          pair_full)
            pot = law.potential_factor_tpm(tmass, smass, r2, r, h,
                                           scount, lrp)
            pot = jnp.where(inside, pot, 0.0)
        return fac, pot

    def dispatch(tg, sg, tm, sm, r2, r, h, scount):
        """Evaluate the law matrix over a tile.  `sg` static int or
        array; dispatch by broadcast equality masks (never gathers)."""
        pair_full = None
        if tpm_tuple is not None and not closed_form:
            pair_full = (tg * NG + sg).astype(jnp.int32)
        if single_law:
            return law_factors(groups[0][0], tm, sm, r2, r, h, scount,
                               pair_full)
        fac = jnp.zeros_like(r2)
        pot = jnp.zeros_like(r2) if want_pot else None
        for law, slots in groups:
            if isinstance(sg, int):
                tslots = sorted({i for (i, j) in slots if j == sg})
                if not tslots:
                    continue
                mk = None
                for i in tslots:
                    mij = (tg == i)
                    mk = mij if mk is None else (mk | mij)
            else:
                mk = None
                for (i, j) in slots:
                    mij = (tg == i) & (sg == j)
                    mk = mij if mk is None else (mk | mij)
            f_k, p_k = law_factors(law, tm, sm, r2, r, h, scount, pair_full)
            fac = jnp.where(mk, f_k, fac)
            if want_pot:
                pot = jnp.where(mk, p_k, pot)
        return fac, pot

    def pair_tile(tpos, tgrav, tsoft, tmass, spos, sgrav, ssoft, smass,
                  scount, valid):
        """Dense pair evaluation: targets [..., G] vs sources [..., K]
        broadcast to a [..., K, G] tile.  Returns (ax, ay, az, pot)
        accumulated over the K axis -> [..., G]."""
        dx = min_image(spos[0] - tpos[0])
        dy = min_image(spos[1] - tpos[1])
        dz = min_image(spos[2] - tpos[2])
        r2 = dx * dx + dy * dy + dz * dz
        r = jnp.sqrt(r2)
        h = jnp.maximum(tsoft, ssoft)
        fac, pot = dispatch(tgrav, sgrav, tmass, smass, r2, r, h, scount)
        fac = jnp.where(valid, fac, 0.0)
        ax = jnp.sum(fac * dx, axis=-2)
        ay = jnp.sum(fac * dy, axis=-2)
        az = jnp.sum(fac * dz, axis=-2)
        if want_pot:
            pp = jnp.sum(jnp.where(valid, pot, 0.0), axis=-2)
        else:
            pp = jnp.zeros_like(ax)
        return ax, ay, az, pp

    # ------------------------------------------------------------------
    # The traversal + inline monopole evaluation for one batch of B
    # blocks.  Level-synchronous per-block-row frontiers [B, F_l] (live
    # prefix per row); opening rules per forcetree.c:1437-1473 with
    # per-subgroup bounding boxes.  Accepted nodes are evaluated on the
    # spot from the walk-table row already in registers.
    # ------------------------------------------------------------------
    def _walk_batch(tree, wtab, gsrc, gsrc8, layout, tp, ta, rel,
                    n_static: int):
        init_lvl = min(2, depth)
        caps_l = level_caps(n_static, depth, bucket=bucket)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        off0 = int(offs_l[init_lvl])

        cap2, nstart, rows, null_row = layout
        # gsrc8 = leaf chunks + one null chunk appended at cap2//8
        null_chunk = cap2 // 8
        max_chunk_id = cap2 // 8
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        big = np.float32(1e30)

        tpos = tp[..., 0:3]                               # [B, G, 3]
        tgid = bc(tp[..., IGID])                          # [B, G]
        tgrav = bc(tp[..., IGRAV])
        tsoft = tp[..., FSOFT]
        tvalid = tgid >= 0
        blk_ok = jnp.any(tvalid, axis=1)

        # per-subgroup bounding boxes + relative-criterion aold minima
        tpos_s = tpos.reshape(B, S, GS, 3)
        tval_s = tvalid.reshape(B, S, GS)
        lo_b = jnp.min(jnp.where(tval_s[..., None], tpos_s, big), axis=2)
        hi_b = jnp.max(jnp.where(tval_s[..., None], tpos_s, -big), axis=2)
        sub_ok = jnp.any(tval_s, axis=2)                  # [B, S]
        lo_b = jnp.where(sub_ok[..., None], lo_b, big)
        hi_b = jnp.where(sub_ok[..., None], hi_b, -big)
        aold_s = jnp.min(jnp.where(tval_s, ta.reshape(B, S, GS), big),
                         axis=2)                          # [B, S]

        # target columns for pair tiles: [B, 1, G]
        tx = tpos[:, None, :, 0]
        ty = tpos[:, None, :, 1]
        tz = tpos[:, None, :, 2]
        tgrav_t = tgrav[:, None, :]
        tsoft_t = tsoft[:, None, :]
        tmass_t = tp[:, None, :, FMASS]
        tgid_t = tgid[:, None, :]

        acc_x = jnp.zeros((B, G), jnp.float32)
        acc_y = jnp.zeros((B, G), jnp.float32)
        acc_z = jnp.zeros((B, G), jnp.float32)
        acc_p = jnp.zeros((B, G), jnp.float32)
        nia_mono = jnp.zeros((B,), jnp.int32)

        ovf = tree.n_chunk_rows > cap2

        # leaf-record lists (c0, nchunk) per block, filled by compaction
        nc_ls, c0_ls = [], []
        # accepted-monopole record lists, kept ONLY for the periodic
        # lattice-correction pass (the primary force is inline)
        mid_ls, mgb_ls = [], []
        lvl_live = [jnp.zeros((), jnp.int32)] * (depth + 1)

        def eval_mono(wn, accept_g, state):
            """Accepted monopoles of one frontier slice: dense
            [B, F, G] tile per source gravity (static NG unroll)."""
            acc_x, acc_y, acc_z, acc_p, nia = state
            if stage_limit < 2:
                nia = nia + jnp.sum(
                    jnp.sum(accept_g, axis=-1).astype(jnp.int32), axis=1)
                return acc_x, acc_y, acc_z, acc_p, nia
            msoft = wn[:, :, 8:9]                        # [B, F, 1]
            for g in range(NG):
                a_g = accept_g[:, :, g]                  # [B, F]
                cg = wn[:, :, 9 + 4 * g: 13 + 4 * g]
                spos = (cg[:, :, 0, None], cg[:, :, 1, None],
                        cg[:, :, 2, None])               # [B, F, 1]
                smass = cg[:, :, 3, None]
                if use_count:
                    scount = wn[:, :, 9 + 4 * NG + g, None]
                else:
                    scount = 1.0
                ax, ay, az, pp = pair_tile(
                    (tx, ty, tz), tgrav_t, tsoft_t, tmass_t,
                    spos, g, msoft, smass,
                    scount, a_g[:, :, None] & tvalid[:, None, :])
                acc_x = acc_x + ax
                acc_y = acc_y + ay
                acc_z = acc_z + az
                if want_pot:
                    acc_p = acc_p + pp
            nia = nia + jnp.sum(
                jnp.sum(accept_g, axis=-1).astype(jnp.int32), axis=1)
            return acc_x, acc_y, acc_z, acc_p, nia

        if n_sh:
            # shallow real leaves (above the init level) go straight to
            # exact summation: one range per (block, shallow leaf)
            s_node = np.arange(n_sh, dtype=np.int32)
            swn = wtab[s_node]                           # [n_sh, W]
            s_nch = bc(swn[:, 7])
            s_ok = blk_ok[:, None] & (s_nch > 0)[None, :]
            nc_ls.append(jnp.where(s_ok, s_nch[None, :], 0))
            c0_ls.append(jnp.broadcast_to(bc(swn[:, 6])[None, :],
                                          (B, n_sh)))

        # initial frontier: every live block x every init-level node
        F = min(n_init, fcaps_l[init_lvl])
        fnode = jnp.broadcast_to(
            off0 + np.arange(F, dtype=np.int32)[None, :], (B, F))
        nlive = jnp.where(blk_ok, np.int32(min(n_init, F)), 0)
        ovf = ovf | (n_init > F)

        mono_state = (acc_x, acc_y, acc_z, acc_p, nia_mono)

        for lvl in range(init_lvl, depth + 1):
            F = int(fnode.shape[1])
            fiota = np.arange(F, dtype=np.int32)
            live = fiota[None, :] < nlive[:, None]          # [B, F]
            lvl_live[lvl] = jnp.max(nlive)

            wn = wtab[jnp.where(live, fnode, 0)]            # [B, F, W]
            flags = bc(wn[:, :, 3])
            valid = live & ((flags & 255) != 0)
            terminal = (flags & 1) > 0
            nch = bc(wn[:, :, 7])
            # nodes of the complete shallow levels under a real shallow
            # leaf carry moments but no chunks; the preamble already
            # summed those leaves directly — never re-count them
            valid = valid & ~(terminal & (nch == 0))
            center = wn[:, :, 0:3]
            cg = wn[:, :, 9:9 + 4 * NG].reshape(B, F, NG, 4)
            cm = cg[..., 0:3]
            m_g = cg[..., 3]
            cell_len = tree.root_len * np.float32(2.0 ** -lvl)

            # per-subgroup opening tests, accumulated [B, F, S] with
            # explicit loops over (gravity, axis) to bound live temps
            r2min = jnp.full((B, F, S), big)
            for g in range(NG):
                d2 = jnp.zeros((B, F, S), jnp.float32)
                for ax in range(3):
                    dd = jnp.maximum(
                        _bbox_gap(cm[:, :, None, g, ax],
                                  lo_b[:, None, :, ax],
                                  hi_b[:, None, :, ax]), 0.0)
                    d2 = d2 + dd * dd
                r2min = jnp.minimum(
                    r2min, jnp.where(m_g[:, :, None, g] > 0, d2, big))
            mtot = jnp.sum(m_g, axis=-1)                    # [B,F]

            open_bh = cell_len * cell_len > r2min * (theta * theta)
            open_rel = (mtot[:, :, None] * cell_len * cell_len
                        > r2min * r2min * aold_s[:, None, :])
            must_open_s = jnp.where(rel, open_rel, open_bh)
            inter = jnp.ones((B, F, S), bool)
            byd = jnp.zeros((B, F, S), bool) if rcut > 0 else None
            for ax in range(3):
                gx = _bbox_gap(center[:, :, None, ax], lo_b[:, None, :, ax],
                               hi_b[:, None, :, ax])
                inter = inter & (gx < 0.6 * cell_len)
                if rcut > 0:
                    byd = byd | (gx - 0.5 * cell_len > rcut)
            must_open_s = must_open_s | inter
            if rcut > 0:
                valid = valid & ~jnp.all(byd, axis=-1)
            must_open = jnp.any(must_open_s & sub_ok[:, None, :], axis=-1)

            accept = valid & ~must_open
            rest = valid & must_open
            leaf_here = rest & terminal
            expand = rest & ~terminal

            # inline monopole evaluation of accepted nodes
            hasg = ((flags[..., None] >>
                     (1 + np.arange(NG, dtype=np.int32))) & 1) > 0
            mono_state = eval_mono(wn, accept[..., None] & hasg, mono_state)

            nc_ls.append(jnp.where(leaf_here, nch, 0))
            c0_ls.append(bc(wn[:, :, 6]))
            if lattice_tables is not None:
                mid_ls.append(jnp.where(accept, fnode, -1))
                mgb_ls.append(jnp.where(accept, flags, 0))

            if lvl == depth:
                break  # depth-level nodes are terminal by construction

            # expand children into the next frontier with ONE per-row
            # repeat: fnode = rep(child0 - cumex) + iota, since child
            # ranges are ascending and disjoint (nextnode = child0[run]
            # + offset-in-run and offset-in-run = iota - cumex[run])
            Fn = min(fcaps_l[lvl + 1], caps_l[lvl + 1], 8 * F)
            ncc = jnp.where(expand, bc(wn[:, :, 5]), 0)
            cum = jnp.cumsum(ncc, axis=1)
            total = cum[:, -1]
            cumex = cum - ncc
            child0 = bc(wn[:, :, 4])
            rep = _row_repeat(child0 - cumex, ncc, Fn)
            niota = np.arange(Fn, dtype=np.int32)
            fnode = jnp.where(niota[None, :] < total[:, None],
                              rep + niota[None, :], 0)
            nlive = jnp.minimum(total, Fn)
            ovf = ovf | jnp.any(total > Fn)

        acc_x, acc_y, acc_z, acc_p, nia_mono = mono_state
        ncs = jnp.concatenate(nc_ls, axis=1)
        c0s = jnp.concatenate(c0_ls, axis=1)

        # ------------------------------------------------------------
        # Leaf lists: compact (c0, nc) records -> expand to chunk ids.
        # ------------------------------------------------------------
        rows2 = np.arange(B, dtype=np.int32)[:, None]
        rv = ncs > 0
        rpos = jnp.cumsum(rv.astype(jnp.int32), axis=1)
        nrec = rpos[:, -1]
        ridx = jnp.where(rv, rpos - 1, E)
        c0c = jnp.zeros((B, E), jnp.int32) \
            .at[rows2, ridx].set(c0s, mode="drop")
        ncr = jnp.zeros((B, E), jnp.int32) \
            .at[rows2, ridx].set(ncs, mode="drop")
        cum_r = jnp.cumsum(ncr, axis=1)
        cl = jnp.sum(ncs, axis=1)
        ovf = ovf | jnp.any(nrec > E) | jnp.any(cl > CL)
        # single-repeat run expansion: chid = rep(c0 - cumex) + iota
        rep = _row_repeat(c0c - (cum_r - ncr), ncr, CL)
        ciota = np.arange(CL, dtype=np.int32)
        chid = rep + ciota[None, :]
        chid = jnp.where(ciota[None, :] < cl[:, None], chid, null_chunk)
        chid = jnp.where(chid < max_chunk_id, chid, null_chunk)

        nia = nia_mono + cl * 8
        stats = jnp.stack([jnp.max(nrec), jnp.max(cl), jnp.max(nia_mono)])

        if stage_limit < 3:
            out = jnp.stack([acc_x, acc_y, acc_z, acc_p], axis=-1)
            nia_t = jnp.broadcast_to(nia[:, None], (B, G)).astype(jnp.int32)
            return out, nia_t, ovf, stats, jnp.stack(lvl_live)

        # ------------------------------------------------------------
        # Leaf evaluation: chunk-granular gather + dense masked tile,
        # scanned in slices of EVK/8 chunks to bound the live temporary.
        # ------------------------------------------------------------
        KC = EVK // 8      # chunks per slice
        nslice = CL // KC if CL % KC == 0 else CL // KC + 1
        CLp = nslice * KC
        if CLp != CL:
            chid_p = jnp.concatenate(
                [chid, jnp.full((B, CLp - CL), null_chunk, jnp.int32)],
                axis=1)
        else:
            chid_p = chid

        def leaf_slice(state, ch_slice):
            ax0, ay0, az0, ap0 = state
            src = gsrc8[ch_slice]                    # [B, KC, 8, 8]
            src = src.reshape(B, KC * 8, 8)
            sgid = bc(src[:, :, IGID])
            sgrav = bc(src[:, :, IGRAV])
            v = (sgid[:, :, None] != -1) & (tgid_t >= 0) \
                & (sgid[:, :, None] != tgid_t)
            scount = src[:, :, FCOUNT, None] if use_count else 1.0
            ax, ay, az, pp = pair_tile(
                (tx, ty, tz), tgrav_t, tsoft_t, tmass_t,
                (src[:, :, FX, None], src[:, :, FY, None],
                 src[:, :, FZ, None]),
                sgrav[:, :, None], src[:, :, FSOFT, None],
                src[:, :, FMASS, None], scount, v)
            return (ax0 + ax, ay0 + ay, az0 + az, ap0 + pp), None

        # demand-bounded slice loop: only ceil(max-demand/KC) slices of
        # the static chunk-list cap are gathered and evaluated (the caps
        # are max-over-run; per-batch demand is usually far smaller)
        ns_live = (jnp.max(cl) + KC - 1) // KC

        def leaf_cond(c):
            return c[0] < ns_live

        def leaf_body(c):
            s, st = c
            ch_slice = jax.lax.dynamic_slice_in_dim(chid_p, s * KC, KC,
                                                    axis=1)
            st, _ = leaf_slice(st, ch_slice)
            return (s + 1, st)

        _, (acc_x, acc_y, acc_z, acc_p) = jax.lax.while_loop(
            leaf_cond, leaf_body,
            (jnp.int32(0), (acc_x, acc_y, acc_z, acc_p)))

        if lattice_tables is not None:
            # periodic lattice (Ewald) correction, the reference's second
            # walk (forcetree.c:2077-2432): applied to the SAME accepted
            # interaction set — leaf particle rows and accepted monopole
            # rows (recorded per level above, compacted here).
            from .lattice import lattice_correction

            def lat_tile(src):
                """Lattice correction of source rows [B, K, 8]."""
                sgid = bc(src[:, :, IGID])
                sgrav = bc(src[:, :, IGRAV])
                v = (sgid[:, :, None] != -1) & (tgid_t >= 0) \
                    & (sgid[:, :, None] != tgid_t)
                dx = min_image(src[:, :, FX, None] - tx)
                dy = min_image(src[:, :, FY, None] - ty)
                dz = min_image(src[:, :, FZ, None] - tz)
                pidx = (tgrav_t * NG + sgrav[:, :, None]).astype(jnp.int32)
                fcx, fcy, fcz, pc = lattice_correction(
                    lattice_tables, fac_intp, dx, dy, dz, pidx)
                sm = jnp.where(v, src[:, :, FMASS, None], 0.0)
                return (jnp.sum(sm * fcx, axis=-2),
                        jnp.sum(sm * fcy, axis=-2),
                        jnp.sum(sm * fcz, axis=-2),
                        jnp.sum(sm * pc, axis=-2))

            def lat_leaf_body(c):
                s, (ax0, ay0, az0, ap0) = c
                ch_slice = jax.lax.dynamic_slice_in_dim(chid_p, s * KC, KC,
                                                        axis=1)
                src = gsrc8[ch_slice].reshape(B, KC * 8, 8)
                ax, ay, az, pp = lat_tile(src)
                return (s + 1, (ax0 + ax, ay0 + ay, az0 + az, ap0 + pp))

            _, (acc_x, acc_y, acc_z, acc_p) = jax.lax.while_loop(
                lambda c: c[0] < ns_live, lat_leaf_body,
                (jnp.int32(0), (acc_x, acc_y, acc_z, acc_p)))

            # compact accepted-monopole records -> row ids -> gather
            EM = _rup(E * 4, 8)
            mids = jnp.concatenate(mid_ls, axis=1)
            mgbs = jnp.concatenate(mgb_ls, axis=1)
            mv = mids >= 0
            mpos = jnp.cumsum(mv.astype(jnp.int32), axis=1)
            ovf = ovf | jnp.any(mpos[:, -1] > EM)
            midx = jnp.where(mv, mpos - 1, EM)
            midc = jnp.full((B, EM), -1, jnp.int32) \
                .at[rows2, midx].set(mids, mode="drop")
            mgbc = jnp.zeros((B, EM), jnp.int32) \
                .at[rows2, midx].set(mgbs, mode="drop")
            garange = np.arange(NG, dtype=np.int32)
            mhas = (((mgbc[..., None] >> (1 + garange)) & 1) > 0) \
                & (midc[..., None] >= 0)
            mrows = jnp.where(mhas, nstart + midc[..., None] * NG + garange,
                              null_row).reshape(B, EM * NG)

            def lat_mono_slice(state, sl):
                ax0, ay0, az0, ap0 = state
                src = gsrc[sl]                       # [B, EVK, 8]
                ax, ay, az, pp = lat_tile(src)
                return (ax0 + ax, ay0 + ay, az0 + az, ap0 + pp), None

            MK = EVK
            nms = (EM * NG + MK - 1) // MK
            mpad = nms * MK - EM * NG
            if mpad:
                mrows = jnp.concatenate(
                    [mrows, jnp.full((B, mpad), null_row, jnp.int32)],
                    axis=1)
            mrows_s = mrows.reshape(B, nms, MK).transpose(1, 0, 2)
            (acc_x, acc_y, acc_z, acc_p), _ = jax.lax.scan(
                lat_mono_slice, (acc_x, acc_y, acc_z, acc_p), mrows_s)

        out = jnp.stack([acc_x, acc_y, acc_z, acc_p], axis=-1)
        nia_t = jnp.broadcast_to(nia[:, None], (B, G)).astype(jnp.int32)
        return out, nia_t, ovf, stats, jnp.stack(lvl_live)

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
        program.  Targets are processed by TREE-ALIGNED blocks (the
        tree's group-node blocks, <= G consecutive sorted particles in
        one cell) so block bounding boxes are tight tree cells; only
        blocks containing a requested target are walked, in batches of B
        under a dynamic-trip-count while_loop (device-resident)."""
        if rel is None:
            rel = rel_default if opening_override is None else \
                (rel_true if opening_override == "relative" else rel_false)
        n = tree.pos_s.shape[0]
        m = tree.node_mass.shape[0]
        assert tree.blk_start.shape[0] > 0
        layout = source_table_layout(n, m, NG, leaf_factor)
        cap2, _, rows_t, null_row = layout
        gsrc = pack_source_table(tree, NG, leaf_factor,
                                 accumulator=wiring.accumulator)
        # chunked leaf view + one null chunk appended at id cap2//8
        gsrc8 = jnp.concatenate(
            [gsrc[:cap2], gsrc[null_row:null_row + 8]]
        ).reshape(cap2 // 8 + 1, 8, 8)
        wtab = pack_walk_table(tree, NG, wiring.accumulator)

        nt = int(tgt_sorted.shape[0])
        NGRP = int(tree.blk_start.shape[0])
        bcf = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)

        # [N, 8] packed target rows (gid column patched per block)
        tpack_tbl = jnp.stack(
            [tree.pos_s[:, 0], tree.pos_s[:, 1], tree.pos_s[:, 2],
             tree.mass_s, tree.fsoft_s, jnp.zeros_like(tree.mass_s),
             bcf(tree.grav_s), bcf(np.arange(n, dtype=np.int32))], axis=-1)

        # active blocks: any member requested
        act = jnp.zeros((n,), jnp.bool_) \
            .at[jnp.where(tgt_sorted >= 0, tgt_sorted, n)] \
            .set(True, mode="drop")
        blk_act = jax.ops.segment_max(act.astype(jnp.int32), tree.pblk,
                                      NGRP) > 0
        blk_act = blk_act & (tree.blk_cnt > 0)
        bpos = jnp.cumsum(blk_act.astype(jnp.int32))
        nact = bpos[-1]
        bidx = jnp.where(blk_act, bpos - 1, NGRP)
        blk_ids = jnp.full((NGRP + B,), -1, jnp.int32) \
            .at[bidx].set(np.arange(NGRP, dtype=np.int32), mode="drop")
        nbatch = (nact + B - 1) // B
        ovf0 = tree.n_blocks > NGRP

        giota = np.arange(G, dtype=np.int32)

        def body(carry):
            bi, accbuf, niabuf, ovf, stats, lvls = carry
            ids = jax.lax.dynamic_slice_in_dim(blk_ids, bi * B, B)
            vb = ids >= 0
            ids0 = jnp.maximum(ids, 0)
            st = tree.blk_start[ids0]
            cnt = jnp.where(vb, tree.blk_cnt[ids0], 0)
            slots = st[:, None] + giota[None, :]            # [B, G]
            in_blk = giota[None, :] < cnt[:, None]
            safe = jnp.minimum(jnp.where(in_blk, slots, 0), n - 1)
            tp = tpack_tbl[safe]
            tp = tp.at[:, :, IGID].set(
                bcf(jnp.where(in_blk, slots, -1)))
            ta = tree.aold_s[safe]
            out, nia_t, ovf1, stats1, lvl1 = _walk_batch(
                tree, wtab, gsrc, gsrc8, layout, tp, ta, rel, n)
            rows = jnp.where(in_blk, slots, n).reshape(-1)
            accbuf = accbuf.at[rows].set(out.reshape(-1, 4), mode="drop")
            niabuf = niabuf.at[rows].set(nia_t.reshape(-1), mode="drop")
            return (bi + 1, accbuf, niabuf, ovf | ovf1,
                    jnp.maximum(stats, stats1), jnp.maximum(lvls, lvl1))

        carry0 = (jnp.int32(0),
                  jnp.zeros((n, 4), jnp.float32),
                  jnp.zeros((n,), jnp.int32),
                  ovf0,
                  jnp.zeros((3,), jnp.int32),
                  jnp.zeros((depth + 1,), jnp.int32))
        _, accbuf, niabuf, ovf, stats, lvl_max = jax.lax.while_loop(
            lambda c: c[0] < nbatch, body, carry0)

        tsafe = jnp.maximum(tgt_sorted, 0)
        tlive = (tgt_sorted >= 0)[:, None]
        out_all = jnp.where(tlive, accbuf[tsafe], 0.0)
        nia_all = jnp.where(tgt_sorted >= 0, niabuf[tsafe], 0)
        return FusedWalkResult(
            acc=out_all[:, 0:3], pot=out_all[:, 3],
            ninteract=nia_all, overflow=ovf,
            max_ent=stats[0], max_chunk=stats[1],
            max_rows=stats[2], max_frontier=lvl_max)

    fused_forces.group_size = G
    fused_forces.batch_blocks = B
    fused_forces.frontier_caps = fcaps_l
    return fused_forces

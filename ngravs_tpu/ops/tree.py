"""Barnes-Hut octree: TPU-native build and vectorized walk.

Rebuild of the reference's `forcetree.c` (build :61-763, walks :1244-2076)
redesigned for XLA:

 * **Build** (`build_tree`): particles are Morton-sorted; every tree level is
   the set of occupied cells of a uniform grid at that depth, materialized with
   `jnp.unique(size=...)` + `segment_sum` moment reductions.  Per-gravity-type
   monopoles (mass, CM, particle count — the ngravs extension of
   forcetree.c:499-701 / allvars.h:642-647) come out of one segmented
   reduction per level.  No pointer insertion, no serial loops.

 * **Walk** (`tree_forces`): targets are processed in Morton-contiguous blocks
   (cfg.tree_group_size).  Each block runs a level-synchronous frontier
   traversal: at every level the frontier's nodes are tested against the
   block's bounding box with the opening criteria of forcetree.c:1437-1473
   (geometric BH or the relative criterion, made conservative for the block);
   accepted nodes append to a node interaction list, terminal ("bucket")
   nodes that must open append to a leaf list, the rest expand their children
   into the next frontier.  Lists are compacted left with int sorts so all
   shapes stay static.  The physics is then two dense tile evaluations —
   [targets x nodes] multipoles and [targets x leaf-particles] exact pairs —
   that map straight onto the VPU/MXU, replacing the per-particle
   sibling/nextnode pointer chase.

Opening a node for the whole block is *conservative*: the block test uses the
minimum possible distance from any target in the block to the node, so every
accepted node satisfies the reference's per-target criterion for every target
in the block; forces are never less accurate than the reference's.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wiring import GravityWiring
from .morton import (MAX_DEPTH, decode_center, level_key2, morton_keys2,
                     sort_by_keys2)

INT32_MAX = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Tree structure
# ---------------------------------------------------------------------------

class Octree(NamedTuple):
    """Linearized multi-level octree (levels concatenated; static offsets).

    Per-node arrays (length M = sum of per-level caps; invalid/padding nodes
    have pcount == 0):
    """
    # geometry
    corner: jnp.ndarray       # [3] root cell corner
    root_len: jnp.ndarray     # scalar root cell side
    node_center: jnp.ndarray  # [M,3]
    node_level: jnp.ndarray   # [M] int32
    # per-gravity monopoles (ngravs: allvars.h:642-647)
    node_cm: jnp.ndarray      # [M,NG,3]
    node_mass: jnp.ndarray    # [M,NG]
    node_count: jnp.ndarray   # [M,NG] particle count per gravity (accumulator)
    node_maxsoft: jnp.ndarray  # [M] max force-softening of members
    node_hmax: jnp.ndarray    # [M] max SPH smoothing length of members
    # particle range in Morton-sorted order
    node_start: jnp.ndarray   # [M] int32
    node_pcount: jnp.ndarray  # [M] int32
    node_terminal: jnp.ndarray  # [M] bool (bucket leaf: walk stops here)
    # children (flat indices into node arrays); nchild == 0 at depth limit
    node_child0: jnp.ndarray  # [M] int32
    node_nchild: jnp.ndarray  # [M] int32
    # sorted particle data
    order: jnp.ndarray        # [N] sorted -> original index
    pos_s: jnp.ndarray        # [N,3]
    mass_s: jnp.ndarray       # [N]
    grav_s: jnp.ndarray       # [N] int32
    fsoft_s: jnp.ndarray      # [N]
    aold_s: jnp.ndarray       # [N] ErrTolForceAcc * OldAcc (relative criterion)
    hsml_s: jnp.ndarray       # [N] SPH smoothing length (0 for non-gas)
    khi_s: jnp.ndarray        # [N] sorted dual Morton keys (for refresh)
    klo_s: jnp.ndarray        # [N]

    @property
    def n_nodes(self) -> int:
        return self.node_level.shape[0]


def level_caps(n: int, depth: int, max_nodes: int | None = None):
    """Static per-level node caps: occupied cells <= min(8^l, N)."""
    caps = []
    for lvl in range(depth + 1):
        c = min(8**lvl, n)
        if max_nodes is not None:
            c = min(c, max_nodes)
        caps.append(c)
    return caps


@functools.partial(jax.jit,
                   static_argnames=("depth", "n_gravs", "bucket", "box_size"))
def build_tree(pos, mass, grav, fsoft, aold, hsml=None,
               depth: int = 8, n_gravs: int = 1, bucket: int = 32,
               box_size: float = 0.0) -> Octree:
    """Construct the octree (force_treebuild, forcetree.c:61-763).

    For periodic runs pass box_size > 0: the root cell is the box itself
    (positions must already be wrapped).  Otherwise the root is the particle
    bounding cube (domain_findExtent, domain.c:882).
    """
    assert depth <= MAX_DEPTH
    n = pos.shape[0]
    if box_size > 0:
        corner = jnp.zeros(3, pos.dtype)
        root_len = jnp.asarray(box_size, pos.dtype)
    else:
        lo = jnp.min(pos, axis=0)
        hi = jnp.max(pos, axis=0)
        root_len = jnp.max(hi - lo) * 1.0001 + 1e-30
        corner = (lo + hi) / 2 - root_len / 2
    inv_len = 1.0 / root_len

    if hsml is None:
        hsml = jnp.zeros_like(mass)
    khi, klo = morton_keys2(pos, corner, inv_len, depth)
    order = sort_by_keys2(khi, klo)
    khi_s, klo_s = khi[order], klo[order]
    pos_s, mass_s = pos[order], mass[order]
    grav_s = grav[order].astype(jnp.int32)
    fsoft_s, aold_s = fsoft[order], aold[order]
    hsml_s = hsml[order]

    caps = level_caps(n, depth)
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    centers, levels, cms, masses, counts, maxsofts = [], [], [], [], [], []
    starts, pcounts, terminals, child0s, nchilds = [], [], [], [], []
    hmaxs = []
    prev = None  # (start_padded, pcount, cap) of the previous level

    mpos = mass_s[:, None] * pos_s
    arange_n = jnp.arange(n, dtype=jnp.int32)

    for lvl in range(depth + 1):
        cap = caps[lvl]
        hk, lk = level_key2(khi_s, klo_s, depth, lvl)
        # occupied cells = runs in the (already sorted) level keys; no sort
        # and no searchsorted: rank every particle by run-start cumsum
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (hk[1:] != hk[:-1]) | (lk[1:] != lk[:-1])])
        seg = jnp.cumsum(is_new).astype(jnp.int32) - 1       # particle->node
        sidx = jnp.where(is_new, seg, cap)
        uniq_h = jnp.full((cap,), INT32_MAX, jnp.int32) \
            .at[sidx].set(hk, mode="drop")
        uniq_l = jnp.full((cap,), INT32_MAX, jnp.int32) \
            .at[sidx].set(lk, mode="drop")
        # padding start = n so child ranges can be found by searchsorted
        start = jnp.full((cap,), n, jnp.int32) \
            .at[sidx].set(arange_n, mode="drop")
        pcount = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), seg, cap)
        valid = pcount > 0
        sid = seg * n_gravs + grav_s
        nseg = cap * n_gravs
        m_g = jax.ops.segment_sum(mass_s, sid, nseg).reshape(cap, n_gravs)
        mx_g = jax.ops.segment_sum(mpos, sid, nseg).reshape(cap, n_gravs, 3)
        c_g = jax.ops.segment_sum(jnp.ones_like(mass_s), sid,
                                  nseg).reshape(cap, n_gravs)
        msoft = jax.ops.segment_max(fsoft_s, seg, cap)
        msoft = jnp.where(valid, msoft, 0.0)
        mhmax = jax.ops.segment_max(hsml_s, seg, cap)
        mhmax = jnp.where(valid, mhmax, 0.0)

        cell_len = root_len / (1 << lvl)
        center = decode_center(jnp.where(valid, uniq_h, 0),
                               jnp.where(valid, uniq_l, 0),
                               depth, lvl, corner, root_len)
        cm = jnp.where(m_g[..., None] > 0, mx_g / jnp.maximum(m_g[..., None], 1e-37),
                       center[:, None, :])
        terminal = (pcount <= bucket) | (lvl == depth)
        terminal = terminal & valid

        if prev is not None:
            # children of the previous level cover exactly the same particle
            # range: find them by range position, no key arithmetic
            # (start arrays are ascending with padding at n)
            p_start, p_pcount, p_cap = prev
            lo_c = jnp.searchsorted(start, p_start).astype(jnp.int32)
            hi_c = jnp.searchsorted(
                start, p_start + jnp.maximum(p_pcount, 1)).astype(jnp.int32)
            child0s.append(offsets[lvl] + lo_c)
            nchilds.append(hi_c - lo_c)

        centers.append(center)
        levels.append(jnp.full((cap,), lvl, jnp.int32))
        cms.append(cm)
        masses.append(m_g)
        counts.append(c_g)
        maxsofts.append(msoft)
        hmaxs.append(mhmax)
        starts.append(jnp.where(valid, start, 0))
        pcounts.append(pcount)
        terminals.append(terminal)
        prev = (start, pcount, cap)

    # deepest level has no children
    child0s.append(jnp.zeros((caps[depth],), jnp.int32))
    nchilds.append(jnp.zeros((caps[depth],), jnp.int32))

    return Octree(
        corner=corner, root_len=root_len,
        node_center=jnp.concatenate(centers),
        node_level=jnp.concatenate(levels),
        node_cm=jnp.concatenate(cms),
        node_mass=jnp.concatenate(masses),
        node_count=jnp.concatenate(counts),
        node_maxsoft=jnp.concatenate(maxsofts),
        node_hmax=jnp.concatenate(hmaxs),
        node_start=jnp.concatenate(starts),
        node_pcount=jnp.concatenate(pcounts),
        node_terminal=jnp.concatenate(terminals),
        node_child0=jnp.concatenate(child0s),
        node_nchild=jnp.concatenate(nchilds),
        order=order, pos_s=pos_s, mass_s=mass_s, grav_s=grav_s,
        fsoft_s=fsoft_s, aold_s=aold_s, hsml_s=hsml_s,
        khi_s=khi_s, klo_s=klo_s,
    )


@functools.partial(jax.jit,
                   static_argnames=("depth", "n_gravs", "bucket"))
def refresh_tree(tree: Octree, pos, mass, grav, fsoft, aold, hsml,
                 depth: int, n_gravs: int, bucket: int) -> Octree:
    """Re-aggregate node moments on the cached tree structure.

    The TPU analog of Gadget's dynamic tree updates between rebuilds
    (predict.c:83-90, force_update_pseudoparticles): cell assignment and
    children stay frozen (exactly as the reference does not re-insert
    particles until the next domain decomposition), but per-gravity CMs,
    masses, counts, softening/hmax maxima and the sorted particle fields are
    recomputed from the CURRENT positions — no argsort, no key generation,
    ~half the cost of a full build."""
    n = pos.shape[0]
    order = tree.order
    pos_s, mass_s = pos[order], mass[order]
    grav_s = grav[order].astype(jnp.int32)
    fsoft_s, aold_s, hsml_s = fsoft[order], aold[order], hsml[order]
    mpos = mass_s[:, None] * pos_s
    caps = level_caps(n, depth)
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    cms, masses, counts, maxsofts, hmaxs = [], [], [], [], []
    for lvl in range(depth + 1):
        cap = caps[lvl]
        hk, lk = level_key2(tree.khi_s, tree.klo_s, depth, lvl)
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (hk[1:] != hk[:-1]) | (lk[1:] != lk[:-1])])
        seg = jnp.cumsum(is_new).astype(jnp.int32) - 1
        sid = seg * n_gravs + grav_s
        nseg = cap * n_gravs
        m_g = jax.ops.segment_sum(mass_s, sid, nseg).reshape(cap, n_gravs)
        mx_g = jax.ops.segment_sum(mpos, sid, nseg).reshape(cap, n_gravs, 3)
        c_g = jax.ops.segment_sum(jnp.ones_like(mass_s), sid,
                                  nseg).reshape(cap, n_gravs)
        msoft = jnp.where(tree.node_pcount[offsets[lvl]:offsets[lvl + 1]] > 0,
                          jax.ops.segment_max(fsoft_s, seg, cap), 0.0)
        mh = jnp.where(tree.node_pcount[offsets[lvl]:offsets[lvl + 1]] > 0,
                       jax.ops.segment_max(hsml_s, seg, cap), 0.0)
        center = tree.node_center[offsets[lvl]:offsets[lvl + 1]]
        cm = jnp.where(m_g[..., None] > 0,
                       mx_g / jnp.maximum(m_g[..., None], 1e-37),
                       center[:, None, :])
        cms.append(cm)
        masses.append(m_g)
        counts.append(c_g)
        maxsofts.append(msoft)
        hmaxs.append(mh)

    return tree._replace(
        node_cm=jnp.concatenate(cms),
        node_mass=jnp.concatenate(masses),
        node_count=jnp.concatenate(counts),
        node_maxsoft=jnp.concatenate(maxsofts),
        node_hmax=jnp.concatenate(hmaxs),
        pos_s=pos_s, mass_s=mass_s, grav_s=grav_s,
        fsoft_s=fsoft_s, aold_s=aold_s, hsml_s=hsml_s)


# ---------------------------------------------------------------------------
# Walk helpers
# ---------------------------------------------------------------------------

def _compact_rows(vals: jnp.ndarray, valid: jnp.ndarray, out_size: int):
    """Push valid entries left in each row; pad with -1.  Returns
    ([B, out_size] values, [B] valid counts).

    Cumsum + row-wise scatter (mode="drop"), NOT a sort: TPU sorts are the
    single most expensive primitive the walk could use, and stable order is
    already given by the cumsum positions.
    """
    b, f = vals.shape
    pos = jnp.cumsum(valid, axis=1) - 1              # position among valid
    idx = jnp.where(valid, pos, out_size)            # invalid -> dropped
    out = jnp.full((b, out_size), -1, vals.dtype)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    out = out.at[rows, idx].set(vals, mode="drop")
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return out, count


def _append_rows(buf: jnp.ndarray, n_in: jnp.ndarray, new: jnp.ndarray):
    """Append the valid entries of `new` (any layout, -1 = invalid) to each
    row of `buf` (-1-padded-left with n_in valid entries).  Returns
    (buf', total counts including entries dropped past the cap)."""
    b, cap = buf.shape
    valid = new >= 0
    pos = n_in[:, None] + jnp.cumsum(valid, axis=1) - 1
    idx = jnp.where(valid, pos, cap)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    out = buf.at[rows, idx].set(new, mode="drop")
    count = n_in + jnp.sum(valid, axis=1).astype(jnp.int32)
    return out, count


class WalkResult(NamedTuple):
    acc: jnp.ndarray        # [Nt,3] (sorted-target order)
    pot: jnp.ndarray        # [Nt]
    ninteract: jnp.ndarray  # [Nt] interaction count (grav_cost/timings)
    overflow: jnp.ndarray   # scalar bool — any list/frontier cap exceeded
    max_nodes: jnp.ndarray      # scalar int32 — peak node-list demand
    max_leaves: jnp.ndarray     # scalar int32 — peak leaf-list demand
    max_frontier: jnp.ndarray   # scalar int32 — peak frontier demand
    max_src: jnp.ndarray        # scalar int32 — peak generalized-source count


def _pair_force(wiring: GravityWiring, tgrav, tmass, tfsoft,
                dx, r2, smass, sgrav_idx, ssoft, scount, want_pot: bool,
                treepm=None):
    """Evaluate the wiring over a [T, S] tile for a *fixed source gravity*
    column type (sgrav_idx int array [..S]) — shared by node and leaf evals.

    Returns (fac [T,S], pot [T,S]).  fac multiplies dx (source - target).

    treepm: optional (sr_ftab, sr_ptab, asmth, ntab) — switches to the
    short-range truncated factors and zeroes pairs beyond the table
    (forcetree.c:1958-2027).
    """
    from .shortrange import longrange_force_factor, longrange_pot_factor

    r = jnp.sqrt(r2)
    h = jnp.maximum(tfsoft[..., :, None], ssoft)
    groups = wiring.unique_laws()
    ng = wiring.n_gravs
    if len(groups) > 1 or treepm is not None:
        pair_full = tgrav[..., :, None] * ng + sgrav_idx
    if len(groups) > 1:
        pair_idx = jnp.asarray(wiring.pair_index_matrix())
        pair_of = pair_idx[tgrav[..., :, None], sgrav_idx]
    else:
        pair_of = None
    if treepm is not None:
        sr_ftab, sr_ptab, asmth, ntab = treepm
        lr, inside = longrange_force_factor(sr_ftab, asmth, ntab, r,
                                            pair_full)
        lrp, _ = longrange_pot_factor(sr_ptab, asmth, ntab, r, pair_full)
    fac = jnp.zeros_like(r)
    pot = jnp.zeros_like(r) if want_pot else None
    for k, (law, _) in enumerate(groups):
        if treepm is None:
            f_k = law.force_factor(tmass[..., :, None], smass, r2, r, h,
                                   scount)
        else:
            f_k = law.force_factor_tpm(tmass[..., :, None], smass, r2, r, h,
                                       scount, lr)
        fac = f_k if pair_of is None else jnp.where(pair_of == k, f_k, fac)
        if want_pot:
            if treepm is None:
                p_k = law.potential_factor(tmass[..., :, None], smass, r2, r,
                                           h, scount)
            else:
                p_k = law.potential_factor_tpm(tmass[..., :, None], smass,
                                               r2, r, h, scount, lrp)
            pot = p_k if pair_of is None else jnp.where(pair_of == k, p_k, pot)
    if treepm is not None:
        fac = jnp.where(inside, fac, 0.0)
        if want_pot:
            pot = jnp.where(inside, pot, 0.0)
    return fac, pot


def make_tree_forces(wiring: GravityWiring, n_gravs: int,
                     group_size: int = 256,
                     node_list_cap: int = 1024,
                     leaf_list_cap: int = 512,
                     frontier_cap: int = 2048,
                     bucket: int = 32,
                     depth: int = 8,
                     theta: float = 0.5,
                     opening: str = "relative",
                     box_size: float = 0.0,
                     block_batch: int = 8,
                     want_pot: bool = True,
                     src_cap: int | None = None,
                     use_pallas: bool | None = None,
                     s_chunk: int = 1024,
                     lattice_tables=None,
                     treepm: dict | None = None,
                     _debug_skip: str | None = None):
    """Build the walk: a host loop over block batches calling ONE jitted
    batch kernel (fixed shapes — compiled exactly once per configuration,
    independent of the active-particle count).

    `opening`: "bh" (geometric, ErrTolTheta; forcetree.c:1437-1445) or
    "relative" (ErrTolForceAcc * OldAcc; forcetree.c:1446-1473) — selected by
    a *traced* flag so both modes share the compilation.  The relative
    criterion uses the minimum aold in each block, which opens at least as
    much as the reference would for any member target.
    """
    rup = lambda x: max(s_chunk, ((x + s_chunk - 1) // s_chunk) * s_chunk)
    src_cap = rup(node_list_cap * n_gravs + leaf_list_cap * bucket // 4
                  if src_cap is None else src_cap)
    fac_intp = (2 * (lattice_tables.shape[1] - 1) / box_size
                if lattice_tables is not None else 0.0)
    # treepm: dict(sr_ftab, sr_ptab, asmth, ntab, rcut) — short-range walk
    # (forcetree.c:1623: Rcut box-discard + tabulated truncation)
    tpm_tuple = None
    rcut = 0.0
    if treepm is not None:
        tpm_tuple = (treepm["sr_ftab"], treepm["sr_ptab"],
                     float(treepm["asmth"]), int(treepm["sr_ftab"].shape[-1]))
        rcut = float(treepm["rcut"])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and treepm is not None:
        # the kernel cannot gather tables; it needs an analytic closed form
        # from every law in the wiring
        if any(law.kernel_shortrange() is None
               for law, _ in wiring.unique_laws()):
            use_pallas = False
    if use_pallas:
        from .pairwise_pallas import make_pairwise_kernel
        pair_kernel = make_pairwise_kernel(
            wiring, n_gravs, group=group_size, s_chunk=s_chunk,
            box_size=box_size, want_pot=want_pot,
            treepm_asmth=(float(treepm["asmth"]) if treepm else 0.0))
    else:
        pair_kernel = None

    periodic = box_size > 0
    rel_default = jnp.asarray(opening == "relative")

    def min_image(d):
        if not periodic:
            return d
        return d - box_size * jnp.round(d / box_size)

    @jax.jit
    def walk_blocks(tree: Octree, gsrc, gwalk, tpos, tmass, tgrav, tfsoft,
                    tgid, taold, rel_open):
        """One batch of blocks: tpos [bb, G, 3] etc.; tgid<0 = padding."""
        bb = tpos.shape[0]
        G = tpos.shape[1]
        tvalid = tgid >= 0
        big = jnp.asarray(1e30, tpos.dtype)
        lo = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)   # [bb,3]
        hi = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
        aold_min = jnp.min(jnp.where(tvalid, taold, big), axis=1)       # [bb]

        node_list = jnp.full((bb, node_list_cap), -1, jnp.int32)
        leaf_list = jnp.full((bb, leaf_list_cap), -1, jnp.int32)
        n_nodes = jnp.zeros((bb,), jnp.int32)
        n_leaves = jnp.zeros((bb,), jnp.int32)
        overflow = jnp.zeros((), bool)
        max_frontier = jnp.zeros((), jnp.int32)

        frontier = jnp.zeros((bb, 1), jnp.int32)  # root at flat index 0
        fcaps = [min(8**l if l > 0 else 1, frontier_cap)
                 for l in range(depth + 1)]

        wnode, cmm = gwalk
        garange = jnp.arange(n_gravs, dtype=jnp.int32)
        for lvl in range(depth + 1):
            f = frontier.shape[1]
            nvalid = frontier >= 0
            nid = jnp.maximum(frontier, 0)
            wn = wnode[nid]                    # [bb,f,8] one row gather
            center = wn[..., 0:3]
            terminal = wn[..., 3] > 0
            cg = cmm[(nid[..., None] * n_gravs + garange)]  # [bb,f,NG,4]
            cm = cg[..., 0:3]
            m_g = cg[..., 3]
            cell_len = tree.root_len / (1 << lvl)

            # min distance^2 from block bbox to each per-gravity CM
            # (conservative analog of forcetree.c:1364-1392's r2min).
            # Periodic: the point may sit across the wrap, so take the min
            # gap over the three nearest images per axis.
            def bbox_gap(point, lo_b, hi_b):
                g = jnp.maximum(lo_b - point, point - hi_b)
                if periodic:
                    gp = jnp.maximum(lo_b - point - box_size,
                                     point + box_size - hi_b)
                    gm = jnp.maximum(lo_b - point + box_size,
                                     point - box_size - hi_b)
                    g = jnp.minimum(g, jnp.minimum(gp, gm))
                return g

            d = jnp.maximum(
                bbox_gap(cm, lo[:, None, None, :], hi[:, None, None, :]), 0.0)
            r2g = jnp.sum(d * d, axis=-1)                     # [bb,f,NG]
            r2min = jnp.min(jnp.where(m_g > 0, r2g, big), axis=-1)  # [bb,f]
            mtot = jnp.sum(m_g, axis=-1)

            open_bh = cell_len * cell_len > r2min * (theta * theta)
            # M l^2 > r^4 aold  (forcetree.c:1447)
            open_rel = (mtot * cell_len * cell_len
                        > r2min * r2min * aold_min[:, None])
            must_open = jnp.where(rel_open, open_rel, open_bh)
            # block bbox within 0.6*len of the node center => always open
            # (covers forcetree.c:1453-1464's inside-node checks, made
            # conservative for the whole block)
            gap = bbox_gap(center, lo[:, None, :], hi[:, None, :])
            intersects = jnp.all(gap < 0.6 * cell_len, axis=-1)
            must_open = must_open | intersects

            if rcut > 0:
                # TreePM short-range walk: discard nodes whose cell lies
                # entirely beyond Rcut from the block (the per-axis
                # box-discard of forcetree.c:1828-1862)
                ngap = bbox_gap(center, lo[:, None, :], hi[:, None, :])
                beyond = jnp.any(ngap - 0.5 * cell_len > rcut, axis=-1)
                nvalid = nvalid & ~beyond

            accept = nvalid & ~must_open
            rest = nvalid & must_open
            leaf_here = rest & terminal
            expand = rest & ~terminal

            node_list, n_nodes = _append_rows(
                node_list, n_nodes, jnp.where(accept, frontier, -1))
            leaf_list, n_leaves = _append_rows(
                leaf_list, n_leaves, jnp.where(leaf_here, frontier, -1))

            if lvl < depth:
                c0 = jax.lax.bitcast_convert_type(wn[..., 4], jnp.int32)
                nc = jax.lax.bitcast_convert_type(wn[..., 5], jnp.int32)
                j = jnp.arange(8, dtype=jnp.int32)
                cand = c0[..., None] + j                       # [bb,f,8]
                cvalid = expand[..., None] & (j < nc[..., None])
                nxt_cap = fcaps[lvl + 1]
                frontier, fcount = _compact_rows(
                    cand.reshape(bb, f * 8), cvalid.reshape(bb, f * 8),
                    nxt_cap)
                overflow = overflow | jnp.any(fcount > nxt_cap)
                max_frontier = jnp.maximum(max_frontier, jnp.max(fcount))

        overflow = overflow | jnp.any(n_nodes > node_list_cap) \
            | jnp.any(n_leaves > leaf_list_cap)
        max_nodes = jnp.max(n_nodes)
        max_leaves = jnp.max(n_leaves)

        # ---- compact both lists into ONE generalized source list ----
        # A "source" is a leaf particle or a (node, gravity) monopole entry,
        # encoded in one id space: v < NP is sorted-particle v, v >= NP is
        # node entry (v - NP) = node_id * NG + gravity.  Fields then come
        # from the precomputed global arrays `gsrc` with a single gather,
        # and all bucket/cap padding is stripped before evaluation.
        NG = n_gravs
        NP = tree.pos_s.shape[0]
        nlv = node_list >= 0
        nls = jnp.maximum(node_list, 0)
        ent_mask = nlv[..., None] & (tree.node_mass[nls] > 0)
        ent_flat = NP + nls[..., None] * NG + jnp.arange(NG, dtype=jnp.int32)
        ent = jnp.where(ent_mask, ent_flat, -1).reshape(bb, -1)

        llv = leaf_list >= 0
        lls = jnp.maximum(leaf_list, 0)
        lstart = tree.node_start[lls]
        lcount = jnp.where(llv, tree.node_pcount[lls], 0)
        jj = jnp.arange(bucket, dtype=jnp.int32)
        pidx = lstart[..., None] + jj
        pvalid = llv[..., None] & (jj < lcount[..., None])
        pidx = jnp.where(pvalid, pidx, -1).reshape(bb, -1)

        if _debug_skip == "lists":
            zz = jnp.zeros((bb, G), tpos.dtype)
            return (zz[..., None] * jnp.zeros(3), zz,
                    jnp.zeros((bb, G), jnp.int32), overflow,
                    max_nodes, max_leaves, max_frontier,
                    jnp.zeros((), jnp.int32))
        cand = jnp.concatenate([ent, pidx], axis=1)
        src, n_src = _compact_rows(cand, cand >= 0, src_cap)
        overflow = overflow | jnp.any(n_src > src_cap)
        max_src = jnp.max(n_src)

        sv = jnp.maximum(src, 0)
        svalid = src >= 0
        rows = gsrc[sv]                            # [bb, S, 16] one gather
        # invalid rows: mass = 0, gid = -1
        neg1 = jax.lax.bitcast_convert_type(
            jnp.int32(-1), jnp.float32)
        masked = rows.at[..., 3].set(jnp.where(svalid, rows[..., 3], 0.0))
        masked = masked.at[..., 7].set(
            jnp.where(svalid, rows[..., 7], neg1))
        spacked = jnp.swapaxes(masked, 1, 2)       # [bb, 16, S]

        if _debug_skip == "eval":
            zz = jnp.zeros((bb, G), tpos.dtype)
            return (zz[..., None] * jnp.zeros(3), zz, n_src[:, None]
                    * jnp.ones((1, G), jnp.int32), overflow,
                    max_nodes, max_leaves, max_frontier, max_src)
        if pair_kernel is not None:
            flat = lambda a: a.reshape(bb * G, 1)
            targets = dict(x=flat(tpos[..., 0]), y=flat(tpos[..., 1]),
                           z=flat(tpos[..., 2]), mass=flat(tmass),
                           grav=flat(tgrav), fsoft=flat(tfsoft),
                           gid=flat(tgid))
            acc_f, pot_f, nia_f = pair_kernel(targets, spacked,
                                              n_src[:, None])
            acc = acc_f.reshape(bb, G, 3)
            pot = pot_f.reshape(bb, G)
            ninter = nia_f.reshape(bb, G)
        else:
            # XLA fallback: the same math on fused per-axis [bb,G,S] planes
            ub = lambda c: jax.lax.bitcast_convert_type(
                spacked[:, c, :], jnp.int32)
            dxs = [min_image(spacked[:, d, None, :] - tpos[:, :, None, d])
                   for d in range(3)]
            r2 = dxs[0] * dxs[0] + dxs[1] * dxs[1] + dxs[2] * dxs[2]
            sgid = ub(7)
            fac, p = _pair_force(
                wiring, tgrav, tmass, tfsoft, None, r2,
                spacked[:, 3, None, :], ub(6)[:, None, :],
                spacked[:, 4, None, :], spacked[:, 5, None, :],
                want_pot, treepm=tpm_tuple)
            w = (sgid[:, None, :] != -1) & tvalid[:, :, None] \
                & (sgid[:, None, :] != tgid[:, :, None])
            fac = jnp.where(w, fac, 0.0)
            acc = jnp.stack(
                [jnp.sum(fac * dxs[d], axis=-1) for d in range(3)], axis=-1)
            if want_pot:
                pot = jnp.sum(jnp.where(w, p, 0.0), axis=-1)
            else:
                pot = jnp.zeros((bb, G), tpos.dtype)
            ninter = jnp.sum(w, axis=-1).astype(jnp.int32)

        if lattice_tables is not None:
            # periodic lattice (Ewald) correction over the same interaction
            # list (the reference's second correction walk,
            # forcetree.c:2077-2432, folded into one pass).  Scanned over
            # source chunks: the trilinear gathers would otherwise
            # materialize [bb,G,S,4] corner tensors (gigabytes).
            from .lattice import lattice_correction
            lat_chunk = 2048
            s_tot = spacked.shape[2]
            pad_s = (-s_tot) % lat_chunk
            sp_l = jnp.pad(spacked, ((0, 0), (0, 0), (0, pad_s)))
            # padded gid must be -1 (invalid)
            if pad_s:
                neg1f = jax.lax.bitcast_convert_type(jnp.int32(-1),
                                                     jnp.float32)
                sp_l = sp_l.at[:, 7, s_tot:].set(neg1f)
            nch = sp_l.shape[2] // lat_chunk
            sp_l = sp_l.reshape(bb, 16, nch, lat_chunk) \
                .transpose(2, 0, 1, 3)                    # [nch,bb,16,Sc]

            def lat_body(carry, spc):
                acc_c, pot_c = carry
                ubc = lambda c: jax.lax.bitcast_convert_type(
                    spc[:, c, :], jnp.int32)
                sgid_c = ubc(7)
                dxs_c = [min_image(spc[:, d, None, :]
                                   - tpos[:, :, None, d]) for d in range(3)]
                pidx_c = tgrav[:, :, None] * n_gravs + ubc(6)[:, None, :]
                fcx, fcy, fcz, pc2 = lattice_correction(
                    lattice_tables, fac_intp, dxs_c[0], dxs_c[1], dxs_c[2],
                    pidx_c)
                w2 = (sgid_c[:, None, :] != -1) & tvalid[:, :, None] \
                    & (sgid_c[:, None, :] != tgid[:, :, None])
                sm2 = jnp.where(w2, spc[:, 3, None, :], 0.0)
                acc_c = acc_c + jnp.stack(
                    [jnp.sum(sm2 * fcx, axis=-1),
                     jnp.sum(sm2 * fcy, axis=-1),
                     jnp.sum(sm2 * fcz, axis=-1)], axis=-1)
                if want_pot:
                    pot_c = pot_c + jnp.sum(sm2 * pc2, axis=-1)
                return (acc_c, pot_c), None

            (lacc, lpot), _ = jax.lax.scan(
                lat_body, (jnp.zeros_like(acc), jnp.zeros_like(pot)), sp_l)
            acc = acc + lacc
            if want_pot:
                pot = pot + lpot

        return (acc, pot, ninter, overflow, max_nodes, max_leaves,
                max_frontier, max_src)

    @jax.jit
    def _gsrc(tree: Octree):
        """Global generalized-source table, one packed [16] f32 row per
        source (particles first, then (node, gravity) entries): cols 0-5 =
        x, y, z, mass, soft, count; col 6/7 = bitcast int32 grav / gid.
        One row gather then fetches every field of an interaction list —
        8 scalar gathers would be ~8x slower on TPU.
        """
        n = tree.pos_s.shape[0]
        m = tree.node_mass.shape[0]
        cm = tree.node_cm.reshape(m * n_gravs, 3)
        nmass = tree.node_mass.reshape(m * n_gravs)
        if wiring.accumulator:
            ncount = jnp.maximum(tree.node_count.reshape(m * n_gravs), 1.0)
        else:
            ncount = jnp.ones_like(nmass)
        nsoft = jnp.repeat(tree.node_maxsoft, n_gravs)
        ngrav = jnp.tile(jnp.arange(n_gravs, dtype=jnp.int32), m)
        cat = jnp.concatenate
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        cols = [cat([tree.pos_s[:, 0], cm[:, 0]]),
                cat([tree.pos_s[:, 1], cm[:, 1]]),
                cat([tree.pos_s[:, 2], cm[:, 2]]),
                cat([tree.mass_s, nmass]),
                cat([tree.fsoft_s, nsoft]),
                cat([jnp.ones_like(tree.mass_s), ncount]),
                bc(cat([tree.grav_s, ngrav])),
                bc(cat([jnp.arange(n, dtype=jnp.int32),
                        jnp.full((m * n_gravs,), -2, jnp.int32)]))]
        z = jnp.zeros_like(cols[0])
        return jnp.stack(cols + [z] * 8, axis=1)     # [n + m*NG, 16]

    @jax.jit
    def _gwalk(tree: Octree):
        """Packed traversal tables: one [M,8] row per node (center, terminal,
        bitcast child0/nchild) and one [M*NG,4] row per (node,gravity)
        (cm, mass) — two row gathers per level instead of six scalar
        gathers (TPU gathers of contiguous rows are ~8x faster)."""
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        z = jnp.zeros_like(tree.node_maxsoft)
        wnode = jnp.stack(
            [tree.node_center[:, 0], tree.node_center[:, 1],
             tree.node_center[:, 2],
             tree.node_terminal.astype(jnp.float32),
             bc(tree.node_child0), bc(tree.node_nchild), z, z], axis=1)
        m = tree.node_mass.shape[0]
        cmm = jnp.concatenate(
            [tree.node_cm.reshape(m * n_gravs, 3),
             tree.node_mass.reshape(m * n_gravs, 1)], axis=1)
        return wnode, cmm

    @functools.partial(jax.jit, static_argnames=("nb",))
    def _prep(tree: Octree, tgt: jnp.ndarray, nb: int):
        tgt_b = tgt.reshape(nb, group_size)
        safe = jnp.maximum(tgt_b, 0)
        return (tree.pos_s[safe], tree.mass_s[safe], tree.grav_s[safe],
                tree.fsoft_s[safe], jnp.where(tgt_b >= 0, safe, -1),
                tree.aold_s[safe])

    def tree_forces(tree: Octree, tgt_sorted: jnp.ndarray,
                    opening_override: str | None = None) -> WalkResult:
        """Forces on targets given as indices into the tree's sorted order
        (-1 = padding).  Targets should be Morton-contiguous for tight block
        bounds — any subset of ascending sorted indices is.

        Host loop over block batches: the device kernel `walk_blocks` has
        fixed shapes, so any target count reuses one compilation.
        """
        rel = rel_default if opening_override is None \
            else jnp.asarray(opening_override == "relative")
        nt = tgt_sorted.shape[0]
        chunk = group_size * block_batch
        pad = (-nt) % chunk
        tgt = jnp.concatenate(
            [tgt_sorted, jnp.full((pad,), -1, jnp.int32)]) if pad else tgt_sorted
        nb = tgt.shape[0] // group_size
        prep = _prep(tree, tgt, nb)
        gsrc = _gsrc(tree)
        gwalk = _gwalk(tree)

        outs = []
        nbb = nb // block_batch
        for i in range(nbb):
            sl = jax.tree.map(
                lambda a: jax.lax.slice_in_dim(
                    a, i * block_batch, (i + 1) * block_batch, axis=0), prep)
            outs.append(walk_blocks(tree, gsrc, gwalk, *sl, rel))
        acc = jnp.concatenate([o[0] for o in outs]).reshape(-1, 3)[:nt]
        pot = jnp.concatenate([o[1] for o in outs]).reshape(-1)[:nt]
        ninter = jnp.concatenate([o[2] for o in outs]).reshape(-1)[:nt]
        ovf = functools.reduce(jnp.logical_or, [o[3] for o in outs])
        mx = lambda k: functools.reduce(jnp.maximum, [o[k] for o in outs])
        return WalkResult(acc, pot, ninter, ovf, mx(4), mx(5), mx(6), mx(7))

    return tree_forces

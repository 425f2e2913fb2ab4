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
    # aligned leaf-chunk table layout: every *shallowest* terminal node owns
    # ceil(pcount/8) aligned 8-row chunks in the packed source table, so the
    # walk gathers leaf particles as 256-byte contiguous rows instead of
    # per-particle 32-byte rows (8-10x faster HBM gathers)
    node_chunk0: jnp.ndarray  # [M] int32 first chunk id (real leaves only)
    node_nchunk: jnp.ndarray  # [M] int32 chunk count (0 for non-leaves)
    leaf_row: jnp.ndarray     # [N] int32 row of each sorted particle
    n_chunk_rows: jnp.ndarray  # scalar int32: total leaf-table rows used
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
    # shallowest terminal ancestor of each particle + rank within it
    term_node = jnp.full((n,), -1, jnp.int32)
    term_rank = jnp.zeros((n,), jnp.int32)

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

        # assign particles to their shallowest terminal ancestor
        newly = (term_node < 0) & terminal[seg]
        term_node = jnp.where(newly, offsets[lvl] + seg, term_node)
        term_rank = jnp.where(newly, arange_n - start[seg], term_rank)

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

    # leaf-chunk table layout over the *real* leaves (shallowest terminal
    # nodes — descendants of a terminal node are never walked)
    pcount_all = jnp.concatenate(pcounts)
    m_total = pcount_all.shape[0]
    real_leaf = jnp.zeros((m_total,), bool).at[term_node].set(True)
    nchunk = jnp.where(real_leaf, (pcount_all + 7) // 8, 0).astype(jnp.int32)
    chunk0 = (jnp.cumsum(nchunk) - nchunk).astype(jnp.int32)
    leaf_row = chunk0[term_node] * 8 + term_rank
    n_chunk_rows = jnp.sum(nchunk) * 8

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
        node_chunk0=chunk0, node_nchunk=nchunk, leaf_row=leaf_row,
        n_chunk_rows=n_chunk_rows,
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


def _append_rows2(buf_a, n_in, new_a, buf_b, new_b):
    """Append valid entries of `new_a` (-1 = invalid) and the co-indexed
    `new_b` values to two parallel row buffers at the same positions."""
    b, cap = buf_a.shape
    valid = new_a >= 0
    pos = n_in[:, None] + jnp.cumsum(valid, axis=1) - 1
    idx = jnp.where(valid, pos, cap)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    out_a = buf_a.at[rows, idx].set(new_a, mode="drop")
    out_b = buf_b.at[rows, idx].set(new_b, mode="drop")
    count = n_in + jnp.sum(valid, axis=1).astype(jnp.int32)
    return out_a, out_b, count


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
    max_ent: jnp.ndarray        # scalar int32 — peak node-entry demand
    max_chunk: jnp.ndarray      # scalar int32 — peak leaf-chunk demand
    frontier_demand: jnp.ndarray  # [depth+1] int32 per-level frontier peak
    ent_stripe_demand: jnp.ndarray  # [depth+1] per-level per-block ent peak
    chk_stripe_demand: jnp.ndarray  # [depth+1] per-level per-block chk peak


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


def _p2(x: int, minimum: int) -> int:
    return max(minimum, 1 << int(math.ceil(math.log2(max(int(x), 1)))))


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
                     block_batch: int = 32,
                     trav_batch: int = 512,
                     want_pot: bool = True,
                     ent_cap: int | None = None,
                     chunk_cap: int | None = None,
                     fcaps: tuple | None = None,
                     ent_stripes: tuple | None = None,
                     chk_stripes: tuple | None = None,
                     leaf_factor: float = 2.0,
                     use_pallas: bool | None = None,
                     s_chunk: int = 1024,
                     lattice_tables=None,
                     treepm: dict | None = None,
                     eval_cache: dict | None = None):
    """Build the two-phase demand-adaptive walk.

    Phase T (traverse): level-synchronous frontier traversal for batches of
    target blocks, producing per-block interaction lists at *node-entry /
    leaf-chunk* granularity (no per-particle expansion): node entries are
    (node, gravity) monopole rows, leaf chunks are aligned 8-particle runs of
    the packed source table.  One jitted dispatch covers trav_batch blocks.

    Phase E (evaluate): blocks are sorted by measured demand and evaluated in
    batches of block_batch with source shapes sized to each batch's actual
    demand (bucketed to powers of two) — gather volume and pair math are
    demand-proportional instead of worst-block-cap-proportional.  Leaf
    sources gather as contiguous 256-byte rows.

    `opening`: "bh" (geometric, ErrTolTheta; forcetree.c:1437-1445) or
    "relative" (ErrTolForceAcc * OldAcc; forcetree.c:1446-1473) — selected by
    a *traced* flag so both modes share the compilation.  The relative
    criterion uses the minimum aold in each block, which opens at least as
    much as the reference would for any member target.
    """
    G = group_size
    NG = n_gravs
    cpl = (bucket + 7) // 8          # max chunks per leaf
    assert cpl <= 7, "bucket must be <= 56 (chunk count packed in 3 bits)"
    del fcaps, frontier_cap  # frontier widths are host-paced per level
    # per-level per-block column-stripe widths for the accept/leaf lists
    if ent_stripes is None:
        ent_stripes = [min(8**l * NG, 1024) for l in range(depth + 1)]
    else:
        ent_stripes = [int(ent_stripes[l]) if l < len(ent_stripes)
                       else 1024 for l in range(depth + 1)]
    if chk_stripes is None:
        chk_stripes = [min(8**l * cpl, 2048) for l in range(depth + 1)]
    else:
        chk_stripes = [int(chk_stripes[l]) if l < len(chk_stripes)
                       else 2048 for l in range(depth + 1)]
    if ent_cap is None:
        ent_cap = _p2(node_list_cap * NG, 256)
    if chunk_cap is None:
        chunk_cap = _p2(leaf_list_cap, 256)
    fac_intp = (2 * (lattice_tables.shape[1] - 1) / box_size
                if lattice_tables is not None else 0.0)
    # treepm: dict(sr_ftab, sr_ptab, asmth, rcut) — short-range walk
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
            wiring, n_gravs, group=G, s_chunk=s_chunk,
            box_size=box_size, want_pot=want_pot,
            treepm_asmth=(float(treepm["asmth"]) if treepm else 0.0))
    else:
        pair_kernel = None

    periodic = box_size > 0
    rel_true = jnp.asarray(True)
    rel_false = jnp.asarray(False)
    rel_default = rel_true if opening == "relative" else rel_false

    def min_image(d):
        if not periodic:
            return d
        return d - box_size * jnp.round(d / box_size)

    def _layout(tree: Octree):
        """Static layout of the packed source table for this tree shape."""
        n = tree.pos_s.shape[0]
        m = tree.node_mass.shape[0]
        rup8 = lambda x: ((x + 7) // 8) * 8
        cap2 = rup8(max(int(n * leaf_factor) + 8, n))
        nstart = cap2                       # node-entry region start
        rows = cap2 + rup8(m * NG) + 16     # +8 null chunk, +8 junk
        null_row = rows - 16                # 8 rows of gid=-1 padding
        return cap2, nstart, rows, null_row

    # ------------------------------------------------------------------
    @jax.jit
    def _gsrc(tree: Octree):
        """Packed source table [R, 8]: leaf-chunk region (aligned 8-row runs
        per real leaf), then one row per (node, gravity) monopole, then a
        null chunk (gid=-1) used as padding target.  Row layout: x, y, z,
        mass, soft, count, bitcast grav, bitcast gid."""
        n = tree.pos_s.shape[0]
        m = tree.node_mass.shape[0]
        cap2, nstart, rows, null_row = _layout(tree)
        bc = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)
        neg1f = jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32)

        prow = jnp.stack(
            [tree.pos_s[:, 0], tree.pos_s[:, 1], tree.pos_s[:, 2],
             tree.mass_s, tree.fsoft_s, jnp.ones_like(tree.mass_s),
             bc(tree.grav_s), bc(jnp.arange(n, dtype=jnp.int32))], axis=1)

        cm = tree.node_cm.reshape(m * NG, 3)
        nmass = tree.node_mass.reshape(m * NG)
        if wiring.accumulator:
            ncount = jnp.maximum(tree.node_count.reshape(m * NG), 1.0)
        else:
            ncount = jnp.ones_like(nmass)
        nsoft = jnp.repeat(tree.node_maxsoft, NG)
        ngrav = jnp.tile(jnp.arange(NG, dtype=jnp.int32), m)
        nrow = jnp.stack(
            [cm[:, 0], cm[:, 1], cm[:, 2], nmass, nsoft, ncount,
             bc(ngrav), bc(jnp.full((m * NG,), -2, jnp.int32))], axis=1)

        tbl = jnp.zeros((rows, 8), jnp.float32).at[:, 7].set(neg1f)
        # overflowing leaf rows (leaf table cap exceeded — detected by the
        # caller via n_chunk_rows) are routed to the junk zone
        lr = jnp.where(tree.leaf_row < cap2, tree.leaf_row, rows - 8)
        tbl = tbl.at[lr].set(prow, mode="drop")
        tbl = jax.lax.dynamic_update_slice(tbl, nrow, (nstart, 0))
        # junk zone may have been overwritten with a valid gid: re-null it
        tbl = tbl.at[rows - 8:, 7].set(neg1f)
        tbl = tbl.at[rows - 8:, 3].set(0.0)
        tbl = tbl.at[rows - 16:rows - 8, 7].set(neg1f)
        tbl = tbl.at[rows - 16:rows - 8, 3].set(0.0)
        return tbl

    @jax.jit
    def _gwalk(tree: Octree):
        """Packed traversal table: ONE [M, 8+4*NG] row per node so every
        level of the walk costs a single row gather.  Columns: center xyz,
        bitcast flags (bit0 terminal, bit 1+g: gravity-g mass>0), bitcast
        child0 / nchild / chunk0 / nchunk, then per gravity (cm xyz, mass).
        """
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        m = tree.node_mass.shape[0]
        flags = tree.node_terminal.astype(jnp.int32)
        for g in range(NG):
            flags = flags | ((tree.node_mass[:, g] > 0).astype(jnp.int32)
                             << (1 + g))
        cols = [tree.node_center[:, 0], tree.node_center[:, 1],
                tree.node_center[:, 2], bc(flags),
                bc(tree.node_child0), bc(tree.node_nchild),
                bc(tree.node_chunk0), bc(tree.node_nchunk)]
        for g in range(NG):
            cols += [tree.node_cm[:, g, 0], tree.node_cm[:, g, 1],
                     tree.node_cm[:, g, 2], tree.node_mass[:, g]]
        return jnp.stack(cols, axis=1)

    @functools.partial(jax.jit, static_argnames=("nb",))
    def _prep(tree: Octree, tgt: jnp.ndarray, nb: int):
        pad = nb * G - tgt.shape[0]
        if pad:
            tgt = jnp.concatenate([tgt, jnp.full((pad,), -1, jnp.int32)])
        tgt_b = tgt.reshape(nb, G)
        safe = jnp.maximum(tgt_b, 0)
        return (tree.pos_s[safe], tree.mass_s[safe], tree.grav_s[safe],
                tree.fsoft_s[safe], jnp.where(tgt_b >= 0, safe, -1),
                tree.aold_s[safe])

    # ------------------------------------------------------------------
    # Phase T: host-paced per-level traversal over a FLAT work queue.
    #
    # The frontier is a single list of (block, node) pairs compacted across
    # all blocks, so every tensor is sized to the batch's *total* demand.
    # Each level is its own (small, fast-to-compile) jitted step whose
    # frontier width the HOST picks from the previous level's measured
    # count — tensors track true demand with no learned caps and no
    # worst-case padding.  The primitive mix is chosen from measured TPU
    # costs: cumsum/cummax scans and elementwise chains fuse for free;
    # segment_sum is avoided entirely (per-block ranks come from cummax
    # scans over the block-major queue); accepted entries land in per-level
    # column stripes of per-block rows, compacted once at the end.
    _lvl_cache = {}

    def _ghost_filter(lvl, init_lvl):
        return lvl == init_lvl and init_lvl > 0

    def _stripe_offs(widths):
        offs = np.concatenate([[0], np.cumsum(widths)]).astype(np.int32)
        return offs, int(offs[-1])

    def blk_rank(blk, valid):
        """Rank among valid entries of the same block, for a block-major
        (ascending blocks, -1 holes anywhere) flat list.  Scan ops only."""
        v = valid.astype(jnp.int32)
        grank = jnp.cumsum(v) - v            # exclusive valid prefix
        blk_ff = jax.lax.cummax(blk)
        bnd = jnp.concatenate(
            [jnp.ones((1,), bool), blk_ff[1:] != blk_ff[:-1]])
        start = jax.lax.cummax(jnp.where(bnd, grank, -1))
        return grank - start

    def _bbox_gap(point, lo_b, hi_b):
        g = jnp.maximum(lo_b - point, point - hi_b)
        if periodic:
            gp = jnp.maximum(lo_b - point - box_size,
                             point + box_size - hi_b)
            gm = jnp.maximum(lo_b - point + box_size,
                             point - box_size - hi_b)
            g = jnp.minimum(g, jnp.minimum(gp, gm))
        return g

    def _t_init(init_lvl: int, n_sh: int, n_init: int, off0: int,
                chk_total: int):
        """Jitted batch init: block bbox rows, init frontier over all
        level-`init_lvl` slots, and the shallow real-leaf pre-pass (leaves
        above the init level go straight to exact summation — always at
        least as accurate as any opening decision)."""
        key = ("init", init_lvl, n_sh, n_init, off0, chk_total)
        if key in _lvl_cache:
            return _lvl_cache[key]

        @jax.jit
        def fn(tree, wtab, tpos, tgid, taold):
            bb = tpos.shape[0]
            cap2, nstart, rows, null_row = _layout(tree)
            null_chunk = null_row // 8
            tvalid = tgid >= 0
            blk_ok = jnp.any(tvalid, axis=1)
            big = jnp.asarray(1e30, tpos.dtype)
            lo_b = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)
            hi_b = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
            aold_b = jnp.min(jnp.where(tvalid, taold, big), axis=1)
            bdata = jnp.concatenate(
                [lo_b, hi_b, aold_b[:, None],
                 jnp.zeros((bb, 1), tpos.dtype)], axis=1)
            biota = jnp.arange(bb, dtype=jnp.int32)
            fblk = jnp.repeat(jnp.where(blk_ok, biota, -1), n_init)
            fnode = jnp.tile(off0 + jnp.arange(n_init, dtype=jnp.int32), bb)
            chk_sbuf = jnp.full((bb, chk_total), null_chunk, jnp.int32)
            if n_sh:
                s_blk0 = jnp.repeat(jnp.where(blk_ok, biota, -1), n_sh)
                s_node = jnp.tile(jnp.arange(n_sh, dtype=jnp.int32), bb)
                swn = wtab[s_node]
                s_ch0 = jax.lax.bitcast_convert_type(swn[:, 6], jnp.int32)
                s_nch = jax.lax.bitcast_convert_type(swn[:, 7], jnp.int32)
                jc0 = jnp.arange(cpl, dtype=jnp.int32)
                sc_blk = jnp.broadcast_to(
                    s_blk0[:, None], (bb * n_sh, cpl)).reshape(-1)
                sc_val = (s_ch0[:, None] + jc0).reshape(-1)
                sc_ok = ((s_blk0 >= 0)[:, None]
                         & (jc0 < s_nch[:, None])).reshape(-1)
                sc_blk = jnp.where(sc_ok, sc_blk, -1)
                sc_rank = blk_rank(sc_blk, sc_ok)
                sc_pos = jnp.where(sc_ok, sc_rank, chk_total)
                chk_sbuf = chk_sbuf.at[
                    jnp.maximum(sc_blk, 0), sc_pos].set(sc_val, mode="drop")
            return bdata, fblk, fnode, chk_sbuf

        _lvl_cache[key] = fn
        return fn

    def _t_level(lvl: int, init_lvl: int, e_off: int, e_w: int,
                 c_off: int, c_w: int):
        """Jitted one-level step: criteria for the current flat frontier,
        scatter accepted entries / leaf chunks into their column stripes,
        emit expansion candidates + the count the host uses to size the
        next level."""
        key = ("lvl", lvl, init_lvl, e_off, e_w, c_off, c_w)
        if key in _lvl_cache:
            return _lvl_cache[key]
        last = lvl >= depth

        @jax.jit
        def fn(tree, wtab, bdata, fblk, fnode, ent_sbuf, chk_sbuf, rel_open):
            F = fblk.shape[0]
            big = jnp.asarray(1e30, bdata.dtype)
            garange = jnp.arange(NG, dtype=jnp.int32)
            jc = jnp.arange(cpl, dtype=jnp.int32)
            valid = fblk >= 0
            wn = wtab[jnp.maximum(fnode, 0)]      # [F, 8+4NG] one gather
            bd = bdata[jnp.maximum(fblk, 0)]      # [F, 8] one gather
            lo = bd[:, 0:3]
            hi = bd[:, 3:6]
            aold_min = bd[:, 6]
            center = wn[:, 0:3]
            flags = jax.lax.bitcast_convert_type(wn[:, 3], jnp.int32)
            terminal = (flags & 1) > 0
            nch = jax.lax.bitcast_convert_type(wn[:, 7], jnp.int32)
            if _ghost_filter(lvl, init_lvl):
                # drop descendants of shallow real leaves (terminal, but
                # their particles live in the ancestor's chunks, emitted by
                # the shallow pre-pass in _t_init)
                valid = valid & ~(terminal & (nch == 0))
            cg = wn[:, 8:8 + 4 * NG].reshape(F, NG, 4)
            cm = cg[..., 0:3]
            m_g = cg[..., 3]
            cell_len = tree.root_len / (1 << lvl)

            # min distance^2 from block bbox to each per-gravity CM
            # (conservative analog of forcetree.c:1364-1392's r2min);
            # periodic images handled inside _bbox_gap
            d = jnp.maximum(_bbox_gap(cm, lo[:, None, :], hi[:, None, :]),
                            0.0)
            r2g = jnp.sum(d * d, axis=-1)                     # [F,NG]
            r2min = jnp.min(jnp.where(m_g > 0, r2g, big), axis=-1)  # [F]
            mtot = jnp.sum(m_g, axis=-1)

            open_bh = cell_len * cell_len > r2min * (theta * theta)
            # M l^2 > r^4 aold  (forcetree.c:1447)
            open_rel = (mtot * cell_len * cell_len
                        > r2min * r2min * aold_min)
            must_open = jnp.where(rel_open, open_rel, open_bh)
            # block bbox within 0.6*len of the node center => always open
            # (covers forcetree.c:1453-1464's inside-node checks, made
            # conservative for the whole block)
            gap = _bbox_gap(center, lo, hi)
            intersects = jnp.all(gap < 0.6 * cell_len, axis=-1)
            must_open = must_open | intersects

            if rcut > 0:
                # TreePM short-range walk: discard nodes whose cell lies
                # entirely beyond Rcut from the block (the per-axis
                # box-discard of forcetree.c:1828-1862)
                beyond = jnp.any(gap - 0.5 * cell_len > rcut, axis=-1)
                valid = valid & ~beyond

            accept = valid & ~must_open
            rest = valid & must_open
            leaf_here = rest & terminal
            expand = rest & ~terminal

            cap2, nstart, rows, null_row = _layout(tree)
            # accepted (node, gravity) entries -> this level's ent stripe
            e_blk = jnp.broadcast_to(
                jnp.where(accept, fblk, -1)[:, None], (F, NG)).reshape(-1)
            e_val = (nstart + fnode[:, None] * NG + garange).reshape(-1)
            e_ok = (accept[:, None]
                    & (((flags[:, None] >> (1 + garange)) & 1) > 0)
                    ).reshape(-1)
            e_blk = jnp.where(e_ok, e_blk, -1)
            e_rank = blk_rank(e_blk, e_ok)
            e_dem = jnp.max(jnp.where(e_ok, e_rank, -1)) + 1
            e_pos = jnp.where(e_ok & (e_rank < e_w), e_off + e_rank,
                              ent_sbuf.shape[1])
            ent_sbuf = ent_sbuf.at[jnp.maximum(e_blk, 0), e_pos].set(
                e_val, mode="drop")

            # leaf chunks -> this level's chunk stripe
            ch0 = jax.lax.bitcast_convert_type(wn[:, 6], jnp.int32)
            c_blk = jnp.broadcast_to(
                jnp.where(leaf_here, fblk, -1)[:, None],
                (F, cpl)).reshape(-1)
            c_val = (ch0[:, None] + jc).reshape(-1)
            c_ok = (leaf_here[:, None] & (jc < nch[:, None])).reshape(-1)
            c_blk = jnp.where(c_ok, c_blk, -1)
            c_rank = blk_rank(c_blk, c_ok)
            c_dem = jnp.max(jnp.where(c_ok, c_rank, -1)) + 1
            c_pos = jnp.where(c_ok & (c_rank < c_w), c_off + c_rank,
                              chk_sbuf.shape[1])
            chk_sbuf = chk_sbuf.at[jnp.maximum(c_blk, 0), c_pos].set(
                c_val, mode="drop")

            if last:
                z = jnp.zeros((1,), jnp.int32)
                return (ent_sbuf, chk_sbuf, z, z, z > 0,
                        jnp.zeros((), jnp.int32), e_dem, c_dem)
            c0 = jax.lax.bitcast_convert_type(wn[:, 4], jnp.int32)
            ncc = jax.lax.bitcast_convert_type(wn[:, 5], jnp.int32)
            j8 = jnp.arange(8, dtype=jnp.int32)
            cand_node = (c0[:, None] + j8).reshape(F * 8)
            cand_blk = jnp.broadcast_to(fblk[:, None], (F, 8)).reshape(F * 8)
            cvalid = (expand[:, None] & (j8 < ncc[:, None])).reshape(F * 8)
            fcount = jnp.sum(cvalid).astype(jnp.int32)
            return (ent_sbuf, chk_sbuf, cand_blk, cand_node, cvalid,
                    fcount, e_dem, c_dem)

        _lvl_cache[key] = fn
        return fn

    def _t_compact(w_out: int):
        """Jitted frontier compaction to the host-chosen width."""
        key = ("compact", w_out)
        if key in _lvl_cache:
            return _lvl_cache[key]

        @jax.jit
        def fn(cand_blk, cand_node, cvalid):
            pos = jnp.cumsum(cvalid) - 1
            idx = jnp.where(cvalid, pos, w_out).astype(jnp.int32)
            fblk = jnp.full((w_out,), -1, jnp.int32) \
                .at[idx].set(cand_blk, mode="drop")
            fnode = jnp.zeros((w_out,), jnp.int32) \
                .at[idx].set(cand_node, mode="drop")
            return fblk, fnode

        _lvl_cache[key] = fn
        return fn

    def _t_all(bb: int, fws: tuple, n_static: int):
        """Fused single-dispatch traversal: all levels in ONE jit with
        STATIC per-level frontier widths `fws` learned from a prior
        host-paced walk.  Eliminates the per-level host sync (expensive on
        remote/tunneled TPUs: ~tens of ms each).  Any width or stripe
        overflow is detected ON DEVICE and reported; the caller falls back
        to the host-paced path and re-learns the widths."""
        key = ("all", bb, fws, n_static)
        if key in _lvl_cache:
            return _lvl_cache[key]
        init_lvl = min(2, depth)
        caps_l = level_caps(n_static, depth)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        ent_w = [int(w) for w in ent_stripes]
        chk_w_all = [n_sh * cpl] + [int(w) for w in chk_stripes[init_lvl:]]
        e_offs, ent_total = _stripe_offs(ent_w[init_lvl:])
        c_offs, chk_total = _stripe_offs(chk_w_all)

        @jax.jit
        def fn(tree, wtab, tpos, tgid, taold, rel):
            bdata, fblk, fnode, chk_sbuf = _t_init(
                init_lvl, n_sh, n_init, int(offs_l[init_lvl]), chk_total)(
                tree, wtab, tpos, tgid, taold)
            cap2, nstart, rows, null_row = _layout(tree)
            ent_sbuf = jnp.full((bb, ent_total), null_row, jnp.int32)
            ovf = jnp.asarray(False)
            fdml, edml, cdml = [], [], []
            for k, lvl in enumerate(range(init_lvl, depth + 1)):
                step = _t_level(lvl, init_lvl, int(e_offs[k]),
                                ent_w[init_lvl + k],
                                int(c_offs[k + 1]), chk_w_all[k + 1])
                (ent_sbuf, chk_sbuf, cand_blk, cand_node, cvalid, fcount,
                 e_dem, c_dem) = step(tree, wtab, bdata, fblk, fnode,
                                      ent_sbuf, chk_sbuf, rel)
                ovf = ovf | (e_dem > ent_w[init_lvl + k]) \
                    | (c_dem > chk_w_all[k + 1])
                edml.append(e_dem)
                cdml.append(c_dem)
                if lvl < depth:
                    w_out = int(fws[k]) if k < len(fws) else 512
                    ovf = ovf | (fcount > w_out)
                    fdml.append(fcount)
                    fblk, fnode = _t_compact(w_out)(cand_blk, cand_node,
                                                    cvalid)
            ent, chk, n_ent, n_chk = _t_finish(tree, ent_sbuf, chk_sbuf)
            ovf = ovf | (jnp.max(n_ent) > ent_cap) \
                | (jnp.max(n_chk) > chunk_cap)
            z = jnp.zeros((), jnp.int32)
            # index alignment with the host-paced demand lists:
            # fdem[l] = frontier count AFTER level l-1 (prefix init_lvl+1),
            # edem/cdem[l] = stripe demand AT level l (prefix init_lvl)
            pad_to = lambda L, npre: jnp.stack(
                ([z] * npre + L + [z] * (depth + 1 - npre - len(L)))
                [: depth + 1])
            return (ent, chk, n_ent, n_chk, ovf,
                    pad_to(fdml, init_lvl + 1), pad_to(edml, init_lvl),
                    pad_to(cdml, init_lvl))

        _lvl_cache[key] = fn
        return fn

    @jax.jit
    def _t_finish(tree, ent_sbuf, chk_sbuf):
        """Compact the striped per-block rows into dense lists for eval."""
        cap2, nstart, rows, null_row = _layout(tree)
        null_chunk = null_row // 8
        ent, n_ent = _compact_rows(ent_sbuf, ent_sbuf != null_row, ent_cap)
        ent = jnp.where(ent < 0, null_row, ent)
        chk, n_chk = _compact_rows(chk_sbuf, chk_sbuf != null_chunk,
                                   chunk_cap)
        chk = jnp.where(chk < 0, null_chunk, chk)
        # counts returned UNCLIPPED so overflow retunes see true demand
        # (phase E clips to its own batch shapes); overflow check compares
        # these against ent_cap/chunk_cap
        return ent, chk, n_ent, n_chk

    def traverse_batch(tree, wtab, tpos, tgid, taold, rel):
        """Host-paced traversal of one batch of blocks.  Returns
        (ent, chk, n_ent, n_chk, stripe_overflow, fdem list,
        edem list, cdem list) — n_ent/n_chk still on device."""
        bb = tpos.shape[0]
        caps_l = level_caps(tree.pos_s.shape[0], depth)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        init_lvl = min(2, depth)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])

        ent_w = [int(w) for w in ent_stripes]
        chk_w_all = [n_sh * cpl] + [int(w) for w in chk_stripes[init_lvl:]]
        e_offs, ent_total = _stripe_offs(ent_w[init_lvl:])
        c_offs, chk_total = _stripe_offs(chk_w_all)

        bdata, fblk, fnode, chk_sbuf = _t_init(
            init_lvl, n_sh, n_init, int(offs_l[init_lvl]), chk_total)(
            tree, wtab, tpos, tgid, taold)
        cap2, nstart, rows, null_row = _layout(tree)
        ent_sbuf = jnp.full((bb, ent_total), null_row, jnp.int32)

        fdem, edem, cdem = [1] * (init_lvl + 1), [0] * init_lvl, [0] * init_lvl
        stripe_ovf = False
        for k, lvl in enumerate(range(init_lvl, depth + 1)):
            step = _t_level(lvl, init_lvl, int(e_offs[k]),
                            ent_w[init_lvl + k],
                            int(c_offs[k + 1]), chk_w_all[k + 1])
            (ent_sbuf, chk_sbuf, cand_blk, cand_node, cvalid, fcount,
             e_dem, c_dem) = step(tree, wtab, bdata, fblk, fnode,
                                  ent_sbuf, chk_sbuf, rel)
            fc, ed, cd = (int(x) for x in
                          jax.device_get((fcount, e_dem, c_dem)))
            edem.append(ed)
            cdem.append(cd)
            stripe_ovf = stripe_ovf or ed > ent_w[init_lvl + k] \
                or cd > chk_w_all[k + 1]
            if lvl < depth:
                fdem.append(fc)
                # keep traversing on stripe overflow: outputs are discarded
                # by the caller but the per-level demand counters stay true,
                # so ONE retune round learns every level's width (stopping
                # early would reveal only one overflowing level per retry)
                if fc == 0:
                    break
                w_out = _p2(fc, 512)
                fblk, fnode = _t_compact(w_out)(cand_blk, cand_node, cvalid)
        ent, chk, n_ent, n_chk = _t_finish(tree, ent_sbuf, chk_sbuf)
        while len(fdem) < depth + 1:
            fdem.append(0)
        while len(edem) < depth + 1:
            edem.append(0)
        while len(cdem) < depth + 1:
            cdem.append(0)
        return ent, chk, n_ent, n_chk, stripe_ovf, fdem, edem, cdem

    # ------------------------------------------------------------------
    # the eval cache may outlive this walk instance (the solver passes a
    # persistent dict) so that cap/frontier re-tunes don't recompile phase E
    _eval_cache = {} if eval_cache is None else eval_cache

    def _eval_for(se: int, sl: int, bbe: int):
        """Phase E kernel for batch shapes (Se node entries, Sl chunks)."""
        key = (se, sl, bbe, leaf_factor, s_chunk)
        if key in _eval_cache:
            return _eval_cache[key]
        s_tot = se + sl * 8
        sp_len = ((s_tot + s_chunk - 1) // s_chunk) * s_chunk

        @jax.jit
        def ev(tree: Octree, gsrc, ent_all, chk_all, n_chk_all,
               tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, blk):
            cap2, nstart, rows, null_row = _layout(tree)
            bbe_ = blk.shape[0]
            ent = ent_all[blk][:, :se]                 # [bbe,Se]
            chk = chk_all[blk][:, :sl]                 # [bbe,Sl]
            nchk = jnp.minimum(n_chk_all[blk], sl)
            gent = gsrc[ent]                           # [bbe,Se,8]
            gch = gsrc.reshape(-1, 8, 8)[chk]          # [bbe,Sl,8,8]
            src = jnp.concatenate(
                [gent, gch.reshape(bbe_, sl * 8, 8)], axis=1)
            if sp_len > s_tot:
                null = gsrc[null_row]
                src = jnp.concatenate(
                    [src, jnp.broadcast_to(null, (bbe_, sp_len - s_tot, 8))],
                    axis=1)
            spacked = jnp.swapaxes(src, 1, 2)          # [bbe,8,Sp]
            n_src = se + nchk * 8

            tpos = tpos_a[blk]
            tmass = tmass_a[blk]
            tgrav = tgrav_a[blk]
            tfsoft = tfsoft_a[blk]
            tgid = tgid_a[blk]
            tvalid = tgid >= 0

            if pair_kernel is not None:
                flat = lambda a: a.reshape(bbe_ * G, 1)
                targets = dict(x=flat(tpos[..., 0]), y=flat(tpos[..., 1]),
                               z=flat(tpos[..., 2]), mass=flat(tmass),
                               grav=flat(tgrav), fsoft=flat(tfsoft),
                               gid=flat(tgid))
                acc_f, pot_f, nia_f = pair_kernel(targets, spacked,
                                                  n_src[:, None])
                acc = acc_f.reshape(bbe_, G, 3)
                pot = pot_f.reshape(bbe_, G)
                ninter = nia_f.reshape(bbe_, G)
            else:
                # XLA fallback: the same math on fused per-axis planes
                ub = lambda c: jax.lax.bitcast_convert_type(
                    spacked[:, c, :], jnp.int32)
                dxs = [min_image(spacked[:, d, None, :]
                                 - tpos[:, :, None, d]) for d in range(3)]
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
                    [jnp.sum(fac * dxs[d], axis=-1) for d in range(3)],
                    axis=-1)
                if want_pot:
                    pot = jnp.sum(jnp.where(w, p, 0.0), axis=-1)
                else:
                    pot = jnp.zeros((bbe_, G), tpos.dtype)
                ninter = jnp.sum(w, axis=-1).astype(jnp.int32)

            if lattice_tables is not None:
                # periodic lattice (Ewald) correction over the same
                # interaction list (the reference's second correction walk,
                # forcetree.c:2077-2432, folded into one pass).  Scanned over
                # source chunks to bound the trilinear corner tensors.
                from .lattice import lattice_correction
                lat_chunk = 2048
                pad_s = (-sp_len) % lat_chunk
                sp_l = jnp.pad(spacked, ((0, 0), (0, 0), (0, pad_s)))
                if pad_s:
                    neg1f = jax.lax.bitcast_convert_type(jnp.int32(-1),
                                                         jnp.float32)
                    sp_l = sp_l.at[:, 7, sp_len:].set(neg1f)
                nch2 = sp_l.shape[2] // lat_chunk
                sp_l = sp_l.reshape(bbe_, 8, nch2, lat_chunk) \
                    .transpose(2, 0, 1, 3)                    # [nch,bb,8,Sc]

                def lat_body(carry, spc):
                    acc_c, pot_c = carry
                    ubc = lambda c: jax.lax.bitcast_convert_type(
                        spc[:, c, :], jnp.int32)
                    sgid_c = ubc(7)
                    dxs_c = [min_image(spc[:, d, None, :]
                                       - tpos[:, :, None, d])
                             for d in range(3)]
                    pidx_c = tgrav[:, :, None] * NG + ubc(6)[:, None, :]
                    fcx, fcy, fcz, pc2 = lattice_correction(
                        lattice_tables, fac_intp, dxs_c[0], dxs_c[1],
                        dxs_c[2], pidx_c)
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
                    lat_body, (jnp.zeros_like(acc), jnp.zeros_like(pot)),
                    sp_l)
                acc = acc + lacc
                if want_pot:
                    pot = pot + lpot

            return acc, pot, ninter

        _eval_cache[key] = ev
        return ev

    @functools.partial(jax.jit, static_argnames=("nt",))
    def _assemble(blk, acc, pot, nia, nt: int):
        nbp = blk.shape[0]
        a = jnp.zeros((nbp, G, 3), acc.dtype).at[blk].set(acc)
        p = jnp.zeros((nbp, G), pot.dtype).at[blk].set(pot)
        ni = jnp.zeros((nbp, G), nia.dtype).at[blk].set(nia)
        return (a.reshape(-1, 3)[:nt], p.reshape(-1)[:nt],
                ni.reshape(-1)[:nt])

    # ------------------------------------------------------------------
    def tree_forces(tree: Octree, tgt_sorted: jnp.ndarray,
                    opening_override: str | None = None) -> WalkResult:
        """Forces on targets given as indices into the tree's sorted order
        (-1 = padding).  Targets should be Morton-contiguous for tight block
        bounds — any subset of ascending sorted indices is.

        Host orchestration: phase T in trav_batch dispatches, one
        device->host sync for the demand counters, then demand-bucketed
        phase E dispatches.
        """
        import time as _t
        prof = tree_forces.profile

        def mark(key, *sync):
            if prof is None:
                return
            if sync:
                jax.block_until_ready(sync)
            now = _t.time()
            prof[key] = prof.get(key, 0.0) + now - mark.t
            mark.t = now
        if prof is not None:
            mark.t = _t.time()
        rel = rel_default if opening_override is None \
            else (rel_true if opening_override == "relative" else rel_false)
        nt = int(tgt_sorted.shape[0])
        bbe = block_batch
        nb0 = (nt + G - 1) // G
        nbp = ((nb0 + bbe - 1) // bbe) * bbe
        prep = _prep(tree, tgt_sorted, nbp)
        tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, taold_a = prep
        gsrc = _gsrc(tree)
        wtab = _gwalk(tree)
        mark("prep", gsrc, wtab)

        bbt = min(trav_batch, nbp)
        nbatch = (nbp + bbt - 1) // bbt
        init_lvl = min(2, depth)
        touts = []
        fdem_h = np.zeros(depth + 1, np.int64)
        edem_h = np.zeros(depth + 1, np.int64)
        cdem_h = np.zeros(depth + 1, np.int64)
        stripe_ovf = False
        ne = nc = None

        def batch_slc(i):
            end = min(i + bbt, nbp)
            if nbatch == 1:
                return tpos_a, tgid_a, taold_a
            if end - i < bbt:
                # pad the final batch with empty blocks
                padb = bbt - (end - i)
                slc = lambda a: jnp.concatenate(
                    [a[i:end], jnp.zeros((padb,) + a.shape[1:], a.dtype)
                     if a.dtype != jnp.int32 else
                     jnp.full((padb,) + a.shape[1:], -1, a.dtype)])
            else:
                slc = lambda a: jax.lax.slice_in_dim(a, i, end, axis=0)
            return slc(tpos_a), slc(tgid_a), slc(taold_a)

        done = False
        if tree_forces.fwidths is not None:
            # FAST PATH: fused traversal with the widths learned from a
            # previous host-paced walk — one dispatch per batch, no
            # per-level host syncs (each costs a full round trip: ~tens of
            # ms on tunneled TPUs), then ONE device_get that both
            # validates the widths and fetches the eval demands
            fast = _t_all(bbt, tree_forces.fwidths, tree.pos_s.shape[0])
            fouts = [fast(tree, wtab, *batch_slc(i), rel)
                     for i in range(0, nbp, bbt)]
            touts = [o[:4] for o in fouts]
            ovf_v, fds, eds, cds, ne_l, nc_l = jax.device_get(
                ([o[4] for o in fouts], [o[5] for o in fouts],
                 [o[6] for o in fouts], [o[7] for o in fouts],
                 [o[2] for o in fouts], [o[3] for o in fouts]))
            if any(bool(v) for v in ovf_v):
                tree_forces.fwidths = None      # stale widths: re-learn
                touts = []
            else:
                fdem_h = np.max(np.stack(fds), axis=0).astype(np.int64)
                edem_h = np.max(np.stack(eds), axis=0).astype(np.int64)
                cdem_h = np.max(np.stack(cds), axis=0).astype(np.int64)
                ne = np.concatenate(ne_l)[:nbp]
                nc = np.concatenate(nc_l)[:nbp]
                done = True
        if not done:
            for i in range(0, nbp, bbt):
                ent_b, chk_b, ne_b, nc_b, ovf_b, fd, ed, cd = traverse_batch(
                    tree, wtab, *batch_slc(i), rel)
                touts.append((ent_b, chk_b, ne_b, nc_b))
                stripe_ovf = stripe_ovf or ovf_b
                fdem_h = np.maximum(fdem_h, np.asarray(fd))
                edem_h = np.maximum(edem_h, np.asarray(ed))
                cdem_h = np.maximum(cdem_h, np.asarray(cd))
            if not stripe_ovf:
                # adopt fused-path widths: measured demand + 50% margin
                tree_forces.fwidths = tuple(
                    _p2(int(max(fdem_h[init_lvl + 1 + k], 1)) * 3 // 2, 512)
                    for k in range(depth - init_lvl))

        if nbatch == 1:
            ent_all, chk_all = touts[0][0], touts[0][1]
            n_ent_d, n_chk_d = touts[0][2], touts[0][3]
        else:
            cat = lambda k: jnp.concatenate([t[k] for t in touts])[:nbp]
            ent_all, chk_all = cat(0), cat(1)
            n_ent_d, n_chk_d = cat(2), cat(3)

        mark("traverse", touts)
        if ne is None:
            ne, nc = jax.device_get((n_ent_d, n_chk_d))
        mark("sync")
        stats = (np.int32(ne.max()), np.int32(nc.max()),
                 np.int32(fdem_h.max()), np.int32(ne.max()),
                 np.int32(nc.max()),
                 fdem_h.astype(np.int32), edem_h.astype(np.int32),
                 cdem_h.astype(np.int32))
        if stripe_ovf or int(ne.max()) > ent_cap or int(nc.max()) > chunk_cap:
            z3 = jnp.zeros((nt, 3), tpos_a.dtype)
            z1 = jnp.zeros((nt,), tpos_a.dtype)
            return WalkResult(z3, z1, jnp.zeros((nt,), jnp.int32),
                              np.True_, *stats)

        order = np.argsort(-(ne.astype(np.int64) + 8 * nc.astype(np.int64)),
                           kind="stable").astype(np.int32)
        blks = [order[b:b + bbe] for b in range(0, nbp, bbe)]
        blks_d = jax.device_put(blks)     # one transfer for all eval batches
        accs, pots, nias = [], [], []
        p4 = lambda x, m: max(m, 1 << (2 * int(math.ceil(
            math.log(max(int(x), 1), 4)))))
        for blk, blk_d in zip(blks, blks_d):
            # power-of-4 buckets: fewer eval-shape variants to compile
            se = min(p4(ne[blk].max(), 1024), ent_cap)
            sl = min(p4(nc[blk].max(), 256), chunk_cap)
            ev = _eval_for(se, sl, bbe)
            a, p, ni = ev(tree, gsrc, ent_all, chk_all, n_chk_d,
                          tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, blk_d)
            accs.append(a)
            pots.append(p)
            nias.append(ni)
        mark("eval", accs)
        blk_cat = jnp.asarray(np.concatenate(blks))
        # concatenate inside ONE jit (eager concats each cost a dispatch
        # round trip on tunneled TPUs)
        key = ("asm", len(accs), nt)
        if key not in _lvl_cache:
            @jax.jit
            def _asm(blk, accs, pots, nias):
                return _assemble(blk, jnp.concatenate(accs),
                                 jnp.concatenate(pots),
                                 jnp.concatenate(nias), nt)
            _lvl_cache[key] = _asm
        acc, pot, nia = _lvl_cache[key](blk_cat, accs, pots, nias)
        mark("assemble", acc)
        return WalkResult(acc, pot, nia, np.False_, *stats)

    def tree_forces_static(tree: Octree, tgt_sorted: jnp.ndarray,
                           opening_override: str | None = None,
                           fcap: int = 16384) -> WalkResult:
        """Fully traceable fixed-shape walk: the same phase-T/phase-E
        machinery with static frontier widths and full-cap evaluation, no
        host pacing — usable under an outer `jax.jit` (driver compile
        checks, per-shard walks inside `shard_map`).  Frontier entries past
        `fcap` and list entries past the configured caps are dropped, so
        caps must be sized generously for exactness."""
        rel = rel_default if opening_override is None \
            else (rel_true if opening_override == "relative" else rel_false)
        nt = int(tgt_sorted.shape[0])
        bbe = block_batch
        nb0 = (nt + G - 1) // G
        nbp = ((nb0 + bbe - 1) // bbe) * bbe
        tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, taold_a = \
            _prep(tree, tgt_sorted, nbp)
        gsrc = _gsrc(tree)
        wtab = _gwalk(tree)

        n = tree.pos_s.shape[0]
        caps_l = level_caps(n, depth)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        init_lvl = min(2, depth)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        ent_w = [int(w) for w in ent_stripes]
        chk_w_all = [n_sh * cpl] + [int(w) for w in chk_stripes[init_lvl:]]
        e_offs, ent_total = _stripe_offs(ent_w[init_lvl:])
        c_offs, chk_total = _stripe_offs(chk_w_all)

        bdata, fblk, fnode, chk_sbuf = _t_init(
            init_lvl, n_sh, n_init, int(offs_l[init_lvl]), chk_total)(
            tree, wtab, tpos_a, tgid_a, taold_a)
        cap2, nstart, rows, null_row = _layout(tree)
        ent_sbuf = jnp.full((nbp, ent_total), null_row, jnp.int32)
        for k, lvl in enumerate(range(init_lvl, depth + 1)):
            step = _t_level(lvl, init_lvl, int(e_offs[k]),
                            ent_w[init_lvl + k],
                            int(c_offs[k + 1]), chk_w_all[k + 1])
            (ent_sbuf, chk_sbuf, cand_blk, cand_node, cvalid, _fc,
             _ed, _cd) = step(tree, wtab, bdata, fblk, fnode,
                              ent_sbuf, chk_sbuf, rel)
            if lvl < depth:
                w_out = _p2(min(nbp * caps_l[lvl + 1] * 8, fcap), 512)
                fblk, fnode = _t_compact(w_out)(cand_blk, cand_node, cvalid)
        ent, chk, n_ent, n_chk = _t_finish(tree, ent_sbuf, chk_sbuf)

        ev = _eval_for(ent_cap, chunk_cap, bbe)
        accs, pots, nias = [], [], []
        for b in range(0, nbp, bbe):
            blk = jnp.arange(b, b + bbe, dtype=jnp.int32)
            a, p, ni = ev(tree, gsrc, ent, chk, n_chk,
                          tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, blk)
            accs.append(a)
            pots.append(p)
            nias.append(ni)
        acc, pot, nia = _assemble(
            jnp.arange(nbp, dtype=jnp.int32), jnp.concatenate(accs),
            jnp.concatenate(pots), jnp.concatenate(nias), nt)
        zi = jnp.zeros((depth + 1,), jnp.int32)
        mx_e = jnp.max(n_ent)
        mx_c = jnp.max(n_chk)
        return WalkResult(acc, pot, nia,
                          (mx_e > ent_cap) | (mx_c > chunk_cap),
                          mx_e, mx_c, jnp.zeros((), jnp.int32),
                          mx_e, mx_c, zi, zi, zi)

    tree_forces.profile = None
    tree_forces.fwidths = None
    tree_forces.static = tree_forces_static
    return tree_forces

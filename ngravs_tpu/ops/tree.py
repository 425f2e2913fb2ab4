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
    node_vel: jnp.ndarray     # [M,NG,3] mass-weighted mean velocity
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
    node_parent: jnp.ndarray  # [M] int32 (-1 at the root / invalid)
    # aligned leaf-chunk table layout: every *shallowest* terminal node owns
    # ceil(pcount/8) aligned 8-row chunks in the packed source table, so the
    # walk gathers leaf particles as 256-byte contiguous rows instead of
    # per-particle 32-byte rows (8-10x faster HBM gathers)
    node_chunk0: jnp.ndarray  # [M] int32 first chunk id (real leaves only)
    node_nchunk: jnp.ndarray  # [M] int32 chunk count (0 for non-leaves)
    leaf_row: jnp.ndarray     # [N] int32 row of each sorted particle
    n_chunk_rows: jnp.ndarray  # scalar int32: total leaf-table rows used
    # tree-aligned walk target blocks: each block is <= group_size
    # consecutive sorted particles inside ONE group node (the shallowest
    # node with pcount <= group_size), so a block's bounding box is
    # always a single tree cell — never a Morton-straddling span
    blk_start: jnp.ndarray    # [NGRP] int32 first sorted-particle index
    blk_cnt: jnp.ndarray      # [NGRP] int32 particles in block (0 pad)
    blk_level: jnp.ndarray    # [NGRP] int32 tree level of the group node
    n_blocks: jnp.ndarray     # scalar int32 live blocks (> NGRP: overflow)
    pblk: jnp.ndarray         # [N] int32 block id of each sorted particle
    # sorted particle data
    order: jnp.ndarray        # [N] sorted -> original index
    pos_s: jnp.ndarray        # [N,3]
    vel_s: jnp.ndarray        # [N,3]
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


def level_caps(n: int, depth: int, max_nodes: int | None = None,
               bucket: int | None = None):
    """Static per-level node caps.

    Without `bucket`: occupied cells <= min(8^l, N) (legacy layout).
    With `bucket`: the build excludes particles below their terminal
    (bucket) node from deeper levels, so live cells at level l are
    children of non-terminal level-(l-1) cells, each holding > bucket
    particles: cap = min(8^l, 8*ceil(N/(bucket+1)) + 8).  This cuts the
    node-array footprint ~(bucket/8)x at large N.
    """
    caps = []
    for lvl in range(depth + 1):
        c = min(8**lvl, n)
        if bucket is not None:
            c = min(c, 8 * ((n + bucket) // (bucket + 1)) + 8)
        if max_nodes is not None:
            c = min(c, max_nodes)
        caps.append(((c + 7) // 8) * 8 if lvl else 1)
    return caps


@functools.partial(jax.jit,
                   static_argnames=("depth", "n_gravs", "bucket", "box_size",
                                    "group_size", "group_thresh", "ngrp_cap"))
def build_tree(pos, mass, grav, fsoft, aold, hsml=None,
               depth: int = 8, n_gravs: int = 1, bucket: int = 32,
               box_size: float = 0.0, group_size: int = 64,
               group_thresh: int | None = None,
               ngrp_cap: int | None = None,
               corner=None, root_len=None, vel=None) -> Octree:
    """Construct the octree (force_treebuild, forcetree.c:61-763).

    For periodic runs pass box_size > 0: the root cell is the box itself
    (positions must already be wrapped).  Otherwise the root is the particle
    bounding cube (domain_findExtent, domain.c:882).
    """
    assert depth <= MAX_DEPTH
    n = pos.shape[0]
    if corner is not None:
        # explicit root cell (sharded LET builds: every shard must use
        # the identical global cell so cells align across shards)
        corner = jnp.asarray(corner, pos.dtype)
        root_len = jnp.asarray(root_len, pos.dtype)
    elif box_size > 0:
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
    if vel is None:
        vel = jnp.zeros_like(pos)
    khi, klo = morton_keys2(pos, corner, inv_len, depth)
    order = sort_by_keys2(khi, klo)
    khi_s, klo_s = khi[order], klo[order]
    pos_s, mass_s = pos[order], mass[order]
    vel_s = vel[order]
    grav_s = grav[order].astype(jnp.int32)
    fsoft_s, aold_s = fsoft[order], aold[order]
    hsml_s = hsml[order]

    caps = level_caps(n, depth, bucket=bucket)
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    centers, levels, cms, masses, counts, maxsofts = [], [], [], [], [], []
    starts, pcounts, terminals, child0s, nchilds = [], [], [], [], []
    hmaxs, vels = [], []
    parents = [jnp.full((1,), -1, jnp.int32)]   # root has no parent
    prev = None  # (start_padded, pcount, cap) of the previous level

    mpos = mass_s[:, None] * pos_s
    mvel = mass_s[:, None] * vel_s
    arange_n = jnp.arange(n, dtype=jnp.int32)
    # shallowest terminal ancestor of each particle + rank within it
    term_node = jnp.full((n,), -1, jnp.int32)
    term_rank = jnp.zeros((n,), jnp.int32)
    # shallowest GROUP ancestor (pcount <= group_size): walk target blocks
    grp_node = jnp.full((n,), -1, jnp.int32)

    for lvl in range(depth + 1):
        cap = caps[lvl]
        hk, lk = level_key2(khi_s, klo_s, depth, lvl)
        # occupied cells = runs in the (already sorted) level keys; no sort
        # and no searchsorted: rank every particle by run-start cumsum.
        # Particles below their terminal (bucket) node are EXCLUDED — the
        # walk never descends past a terminal node, and skipping them
        # bounds the level caps at 8*ceil(N/(bucket+1)) (level_caps)
        live = term_node < 0
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (hk[1:] != hk[:-1]) | (lk[1:] != lk[:-1])]) & live
        seg = jnp.cumsum(is_new).astype(jnp.int32) - 1       # particle->node
        seg = jnp.where(live, seg, cap)
        sidx = jnp.where(is_new, seg, cap)
        uniq_h = jnp.full((cap,), INT32_MAX, jnp.int32) \
            .at[sidx].set(hk, mode="drop")
        uniq_l = jnp.full((cap,), INT32_MAX, jnp.int32) \
            .at[sidx].set(lk, mode="drop")
        # padding start = n so child ranges can be found by searchsorted
        start = jnp.full((cap,), n, jnp.int32) \
            .at[sidx].set(arange_n, mode="drop")
        pcount = jax.ops.segment_sum(jnp.ones((n,), jnp.int32),
                                     jnp.minimum(seg, cap), cap + 1)[:cap]
        valid = pcount > 0
        sid = jnp.where(live, seg * n_gravs + grav_s, cap * n_gravs)
        nseg = cap * n_gravs + 1
        m_g = jax.ops.segment_sum(mass_s, sid, nseg)[:-1] \
            .reshape(cap, n_gravs)
        mx_g = jax.ops.segment_sum(mpos, sid, nseg)[:-1] \
            .reshape(cap, n_gravs, 3)
        mv_g = jax.ops.segment_sum(mvel, sid, nseg)[:-1] \
            .reshape(cap, n_gravs, 3)
        c_g = jax.ops.segment_sum(jnp.ones_like(mass_s), sid,
                                  nseg)[:-1].reshape(cap, n_gravs)
        msoft = jax.ops.segment_max(fsoft_s, jnp.minimum(seg, cap),
                                    cap + 1)[:cap]
        msoft = jnp.where(valid, msoft, 0.0)
        mhmax = jax.ops.segment_max(hsml_s, jnp.minimum(seg, cap),
                                    cap + 1)[:cap]
        mhmax = jnp.where(valid, mhmax, 0.0)

        cell_len = root_len / (1 << lvl)
        center = decode_center(jnp.where(valid, uniq_h, 0),
                               jnp.where(valid, uniq_l, 0),
                               depth, lvl, corner, root_len)
        cm = jnp.where(m_g[..., None] > 0, mx_g / jnp.maximum(m_g[..., None], 1e-37),
                       center[:, None, :])
        vbar = jnp.where(m_g[..., None] > 0,
                         mv_g / jnp.maximum(m_g[..., None], 1e-37), 0.0)
        terminal = (pcount <= bucket) | (lvl == depth)
        terminal = terminal & valid

        # assign particles to their shallowest terminal ancestor
        newly = (term_node < 0) & terminal[seg]
        term_node = jnp.where(newly, offsets[lvl] + seg, term_node)
        term_rank = jnp.where(newly, arange_n - start[seg], term_rank)
        # ... and to their shallowest GROUP ancestor.  The group threshold
        # is larger than the block slot count (default 4x): a group cell
        # of <= group_thresh particles is split into ceil(P/G) blocks of
        # G consecutive particles, which raises block slot occupancy from
        # ~G/3 (shallowest <= G cell) to ~3/4 — the walk's per-SUBGROUP
        # bounding boxes keep the opening tests tight regardless of the
        # group cell's size.
        gthr = max(group_thresh if group_thresh is not None
                   else 4 * group_size, bucket)
        grouplike = valid & ((pcount <= gthr) | (lvl == depth))
        newly_g = (grp_node < 0) & grouplike[jnp.minimum(seg, cap - 1)] \
            & live
        grp_node = jnp.where(newly_g, offsets[lvl] + seg, grp_node)

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
            # parent of each THIS-level cell by range containment
            par = jnp.searchsorted(p_start, start, side="right")                 .astype(jnp.int32) - 1
            parents.append(jnp.where(valid,
                                     offsets[lvl - 1] + jnp.maximum(par, 0),
                                     -1))

        centers.append(center)
        levels.append(jnp.full((cap,), lvl, jnp.int32))
        cms.append(cm)
        vels.append(vbar)
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

    # walk target blocks: split every group node into ceil(pcount/G)
    # blocks of <= G consecutive sorted particles
    grp_node = jnp.where(grp_node < 0, term_node, grp_node)
    start_all = jnp.concatenate(starts)
    ngrp = int(ngrp_cap) if ngrp_cap else _p2(max(n // 8, 1024), 1024)
    is_grp = jnp.zeros((m_total,), bool).at[grp_node].set(True)
    nblk_n = jnp.where(is_grp,
                       (pcount_all + group_size - 1) // group_size,
                       0).astype(jnp.int32)
    blk_base = (jnp.cumsum(nblk_n) - nblk_n).astype(jnp.int32)
    n_blocks = jnp.sum(nblk_n)
    runid = jnp.repeat(jnp.arange(m_total, dtype=jnp.int32), nblk_n,
                       total_repeat_length=ngrp)
    k_in = jnp.arange(ngrp, dtype=jnp.int32) - blk_base[runid]
    live_b = jnp.arange(ngrp, dtype=jnp.int32) < jnp.minimum(n_blocks, ngrp)
    blk_start = jnp.where(live_b, start_all[runid] + k_in * group_size, n)
    blk_cnt = jnp.where(
        live_b,
        jnp.clip(pcount_all[runid] - k_in * group_size, 0, group_size), 0)
    # group-node tree level: a density proxy used by the walk to batch
    # demand-similar blocks together (deep group cells = dense regions =
    # long interaction lists), so per-batch max demand tracks the mean
    level_all = jnp.concatenate(levels)
    blk_level = jnp.where(live_b, level_all[runid], 0)
    pblk = blk_base[grp_node] + (arange_n - start_all[grp_node]) // group_size
    pblk = jnp.minimum(pblk, ngrp - 1).astype(jnp.int32)

    return Octree(
        corner=corner, root_len=root_len,
        node_center=jnp.concatenate(centers),
        node_level=jnp.concatenate(levels),
        node_cm=jnp.concatenate(cms),
        node_vel=jnp.concatenate(vels),
        node_mass=jnp.concatenate(masses),
        node_count=jnp.concatenate(counts),
        node_maxsoft=jnp.concatenate(maxsofts),
        node_hmax=jnp.concatenate(hmaxs),
        node_start=jnp.concatenate(starts),
        node_pcount=jnp.concatenate(pcounts),
        node_terminal=jnp.concatenate(terminals),
        node_child0=jnp.concatenate(child0s),
        node_nchild=jnp.concatenate(nchilds),
        node_parent=jnp.concatenate(parents),
        node_chunk0=chunk0, node_nchunk=nchunk, leaf_row=leaf_row,
        n_chunk_rows=n_chunk_rows,
        blk_start=blk_start, blk_cnt=blk_cnt, blk_level=blk_level,
        n_blocks=n_blocks, pblk=pblk,
        order=order, pos_s=pos_s, vel_s=vel_s, mass_s=mass_s,
        grav_s=grav_s, fsoft_s=fsoft_s, aold_s=aold_s, hsml_s=hsml_s,
        khi_s=khi_s, klo_s=klo_s,
    )


@functools.partial(jax.jit,
                   static_argnames=("depth", "n_gravs", "bucket"))
def refresh_tree(tree: Octree, pos, mass, grav, fsoft, aold, hsml,
                 depth: int, n_gravs: int, bucket: int,
                 vel=None) -> Octree:
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
    vel_s = (vel[order] if vel is not None
             else jnp.zeros_like(pos_s))
    grav_s = grav[order].astype(jnp.int32)
    fsoft_s, aold_s, hsml_s = fsoft[order], aold[order], hsml[order]
    mpos = mass_s[:, None] * pos_s
    mvel = mass_s[:, None] * vel_s
    caps = level_caps(n, depth, bucket=bucket)
    offsets = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)

    cms, masses, counts, maxsofts, hmaxs, vels = [], [], [], [], [], []
    done = jnp.zeros((n,), bool)   # terminal assigned at a shallower level
    for lvl in range(depth + 1):
        cap = caps[lvl]
        hk, lk = level_key2(tree.khi_s, tree.klo_s, depth, lvl)
        # identical live-masked run ranking as build_tree: the cached keys
        # reproduce the frozen cell/slot assignment deterministically
        live = ~done
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool),
             (hk[1:] != hk[:-1]) | (lk[1:] != lk[:-1])]) & live
        seg = jnp.cumsum(is_new).astype(jnp.int32) - 1
        seg = jnp.where(live, seg, cap)
        sid = jnp.where(live, seg * n_gravs + grav_s, cap * n_gravs)
        nseg = cap * n_gravs + 1
        m_g = jax.ops.segment_sum(mass_s, sid, nseg)[:-1] \
            .reshape(cap, n_gravs)
        mx_g = jax.ops.segment_sum(mpos, sid, nseg)[:-1] \
            .reshape(cap, n_gravs, 3)
        mv_g = jax.ops.segment_sum(mvel, sid, nseg)[:-1] \
            .reshape(cap, n_gravs, 3)
        c_g = jax.ops.segment_sum(jnp.ones_like(mass_s), sid,
                                  nseg)[:-1].reshape(cap, n_gravs)
        pc = tree.node_pcount[offsets[lvl]:offsets[lvl + 1]]
        segc = jnp.minimum(seg, cap)
        msoft = jnp.where(pc > 0,
                          jax.ops.segment_max(fsoft_s, segc, cap + 1)[:cap],
                          0.0)
        mh = jnp.where(pc > 0,
                       jax.ops.segment_max(hsml_s, segc, cap + 1)[:cap],
                       0.0)
        center = tree.node_center[offsets[lvl]:offsets[lvl + 1]]
        cm = jnp.where(m_g[..., None] > 0,
                       mx_g / jnp.maximum(m_g[..., None], 1e-37),
                       center[:, None, :])
        vels.append(jnp.where(m_g[..., None] > 0,
                              mv_g / jnp.maximum(m_g[..., None], 1e-37),
                              0.0))
        cms.append(cm)
        masses.append(m_g)
        counts.append(c_g)
        maxsofts.append(msoft)
        hmaxs.append(mh)
        terminal = ((jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), segc, cap + 1)[:cap] <= bucket)
            | (lvl == depth))
        done = done | (live & terminal[segc])

    return tree._replace(
        node_cm=jnp.concatenate(cms),
        node_vel=jnp.concatenate(vels),
        node_mass=jnp.concatenate(masses),
        node_count=jnp.concatenate(counts),
        node_maxsoft=jnp.concatenate(maxsofts),
        node_hmax=jnp.concatenate(hmaxs),
        pos_s=pos_s, vel_s=vel_s, mass_s=mass_s, grav_s=grav_s,
        fsoft_s=fsoft_s, aold_s=aold_s, hsml_s=hsml_s)


def drift_tree(tree: Octree, dd) -> Octree:
    """Drift the tree between re-aggregations: node CMs move with their
    mass-weighted mean velocities and sorted particle positions with
    their own (the reference's dynamic tree updates, predict.c:83-90 /
    force_update_pseudoparticles) — O(M+N) elementwise, no segment
    reductions.  Velocities go stale across kicks; the caller
    re-aggregates (refresh_tree) on a fixed cadence and rebuilds on the
    TreeDomainUpdateFrequency schedule exactly like the reference."""
    return tree._replace(
        node_cm=tree.node_cm + tree.node_vel * dd,
        pos_s=tree.pos_s + tree.vel_s * dd)


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
    max_ent: jnp.ndarray    # scalar int32 — peak node-entry demand
    max_chunk: jnp.ndarray  # scalar int32 — peak leaf-chunk demand
    max_frontier: jnp.ndarray  # scalar int32 — per-block frontier demand


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
                     leaf_factor: float = 2.0,
                     use_pallas: bool | None = None,
                     s_chunk: int = 1024,
                     lattice_tables=None,
                     treepm: dict | None = None,
                     eval_cache: dict | None = None):
    """Build the two-phase demand-adaptive walk.

    Phase T (traverse): level-synchronous frontier traversal for batches of
    target blocks — ONE fused device program per trav_batch of blocks (all
    levels in an on-device fori_loop over a flat block-major frontier of
    static width `frontier_cap * batch_blocks`) — producing per-block
    interaction lists at *node-entry / leaf-chunk* granularity (no
    per-particle expansion): node entries are (node, gravity) monopole rows,
    leaf chunks are aligned 8-particle runs of the packed source table.

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
    # Phase T: single-dispatch level-synchronous traversal.
    #
    # The frontier is ONE flat block-major list of (block, node) pairs with
    # a static width F; every level is one iteration of an on-device
    # fori_loop, so the whole traversal is a single compiled program with
    # no per-level host syncs (each costs a full round trip on tunneled
    # TPUs) and no learned per-level widths that go stale as the particle
    # distribution drifts.  Accepted (node, gravity) entries and leaf
    # chunks scatter straight into dense per-block lists through running
    # cursors — no post-hoc compaction pass.  Overflow of any cap is
    # detected on device from the true (unclipped) demand counters; the
    # caller grows the cap and recompiles (the TPU analog of Gadget
    # growing TreeAllocFactor on "too many nodes", forcetree.c:3176).
    _lvl_cache = {}

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

    def _t_queue(bb: int, n_static: int, F: int):
        """One jitted traversal for a batch of `bb` blocks over a tree of
        `n_static` particles with frontier width `F`.

        Returns fn(tree, wtab, tpos, tgid, taold, rel) ->
        (ent [bb, ent_cap], chk [bb, chunk_cap], n_ent [bb], n_chk [bb],
        overflow bool, fmax int32).  n_ent/n_chk are TRUE demands (they may
        exceed the caps — that flags overflow); list rows are left-packed
        and padded with the null source row / null chunk.
        """
        key = ("queue", bb, n_static, F)
        if key in _lvl_cache:
            return _lvl_cache[key]
        init_lvl = min(2, depth)
        caps_l = level_caps(n_static, depth, bucket=bucket)
        offs_l = np.concatenate([[0], np.cumsum(caps_l)]).astype(np.int32)
        n_sh = int(offs_l[init_lvl])
        n_init = int(offs_l[init_lvl + 1] - offs_l[init_lvl])
        off0 = int(offs_l[init_lvl])
        assert bb * n_init <= F, (bb, n_init, F)
        n_lvls = depth + 1 - init_lvl

        @jax.jit
        def fn(tree, wtab, tpos, tgid, taold, rel):
            cap2, nstart, rows, null_row = _layout(tree)
            null_chunk = null_row // 8
            # leaf-chunk table layout overflow: chunk ids past cap2//8 would
            # gather node-entry rows as phantom sources (the particles
            # themselves were routed to the junk zone by _gsrc); flag it so
            # the caller regrows leaf_factor, and clamp the ids to the null
            # chunk meanwhile (undercount, never double-count)
            ovf0 = tree.n_chunk_rows > cap2
            max_chunk_id = cap2 // 8
            clamp_chk = lambda c: jnp.where(c < max_chunk_id, c, null_chunk)
            bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
            garange = jnp.arange(NG, dtype=jnp.int32)
            jc = jnp.arange(cpl, dtype=jnp.int32)
            j8 = jnp.arange(8, dtype=jnp.int32)
            biota = jnp.arange(bb, dtype=jnp.int32)
            big = jnp.asarray(1e30, tpos.dtype)

            tvalid = tgid >= 0
            blk_ok = jnp.any(tvalid, axis=1)
            lo_b = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)
            hi_b = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
            aold_b = jnp.min(jnp.where(tvalid, taold, big), axis=1)

            # init frontier: every level-`init_lvl` slot per live block
            fblk0 = jnp.full((F,), -1, jnp.int32).at[:bb * n_init].set(
                jnp.repeat(jnp.where(blk_ok, biota, -1), n_init))
            fnode0 = jnp.zeros((F,), jnp.int32).at[:bb * n_init].set(
                jnp.tile(off0 + jnp.arange(n_init, dtype=jnp.int32), bb))

            ent_buf = jnp.full((bb, ent_cap), null_row, jnp.int32)
            chk_buf = jnp.full((bb, chunk_cap), null_chunk, jnp.int32)
            ent_n = jnp.zeros((bb,), jnp.int32)
            chk_n = jnp.zeros((bb,), jnp.int32)

            if n_sh:
                # shallow real-leaf pre-pass: leaves above the init level
                # go straight to exact summation (always at least as
                # accurate as any opening decision)
                s_blk = jnp.repeat(jnp.where(blk_ok, biota, -1), n_sh)
                s_node = jnp.tile(jnp.arange(n_sh, dtype=jnp.int32), bb)
                swn = wtab[s_node]
                s_ch0 = bc(swn[:, 6])
                s_nch = bc(swn[:, 7])
                sc_blk = jnp.broadcast_to(
                    s_blk[:, None], (bb * n_sh, cpl)).reshape(-1)
                sc_val = (s_ch0[:, None] + jc).reshape(-1)
                sc_ok = ((s_blk >= 0)[:, None]
                         & (jc < s_nch[:, None])).reshape(-1)
                sc_blk = jnp.where(sc_ok, sc_blk, -1)
                sc_pos = jnp.where(sc_ok, blk_rank(sc_blk, sc_ok),
                                   chunk_cap)
                chk_buf = chk_buf.at[jnp.maximum(sc_blk, 0), sc_pos].set(
                    jnp.where(sc_val < max_chunk_id, sc_val, null_chunk),
                    mode="drop")
                chk_n = jax.ops.segment_sum(sc_ok.astype(jnp.int32),
                                            jnp.maximum(sc_blk, 0), bb)

            fcnt0 = jnp.asarray(bb * n_init, jnp.int32)
            carry0 = (fblk0, fnode0, ent_buf, ent_n, chk_buf, chk_n,
                      ovf0, jnp.zeros((), jnp.int32), fcnt0)

            def body(k, carry):
                def live(c):
                    (fblk, fnode, ent_buf, ent_n, chk_buf, chk_n, ovf,
                     fmax, fcnt) = c
                    lvl = init_lvl + k
                    cell_len = tree.root_len * jnp.exp2(
                        -lvl.astype(tpos.dtype))
                    valid = fblk >= 0
                    wn = wtab[jnp.maximum(fnode, 0)]  # [F,8+4NG] one gather
                    fb = jnp.maximum(fblk, 0)
                    lo = lo_b[fb]
                    hi = hi_b[fb]
                    aold_min = aold_b[fb]
                    center = wn[:, 0:3]
                    flags = bc(wn[:, 3])
                    # padding node slots decode to corner-centred phantom
                    # cells; the intersects rule could expand them into whole
                    # padding child ranges.  flags==0 <=> no mass in any
                    # gravity and not terminal: nothing to contribute.
                    valid = valid & (flags != 0)
                    terminal = (flags & 1) > 0
                    nch = bc(wn[:, 7])                # leaf-chunk count
                    if init_lvl > 0:
                        # at the init level, drop descendants of shallow
                        # real leaves (their particles were emitted by the
                        # pre-pass through the ancestor's chunks)
                        valid = valid & ~(terminal & (nch == 0) & (k == 0))
                    cg = wn[:, 8:8 + 4 * NG].reshape(F, NG, 4)
                    cm = cg[..., 0:3]
                    m_g = cg[..., 3]

                    # min distance^2 from block bbox to each per-gravity CM
                    # (conservative analog of forcetree.c:1364-1392);
                    # periodic images handled inside _bbox_gap
                    d = jnp.maximum(
                        _bbox_gap(cm, lo[:, None, :], hi[:, None, :]), 0.0)
                    r2g = jnp.sum(d * d, axis=-1)
                    r2min = jnp.min(jnp.where(m_g > 0, r2g, big), axis=-1)
                    mtot = jnp.sum(m_g, axis=-1)

                    open_bh = cell_len * cell_len > r2min * (theta * theta)
                    # M l^2 > r^4 aold  (forcetree.c:1447)
                    open_rel = (mtot * cell_len * cell_len
                                > r2min * r2min * aold_min)
                    must_open = jnp.where(rel, open_rel, open_bh)
                    # block bbox within 0.6*len of the node center => open
                    # (forcetree.c:1453-1464, conservative for the block)
                    gap = _bbox_gap(center, lo, hi)
                    intersects = jnp.all(gap < 0.6 * cell_len, axis=-1)
                    must_open = must_open | intersects

                    if rcut > 0:
                        # TreePM short-range walk: discard cells entirely
                        # beyond Rcut (forcetree.c:1828-1862)
                        beyond = jnp.any(gap - 0.5 * cell_len > rcut,
                                         axis=-1)
                        valid = valid & ~beyond

                    accept = valid & ~must_open
                    rest = valid & must_open
                    leaf_here = rest & terminal
                    expand = rest & ~terminal

                    # Per-block WEIGHTED exclusive prefixes: every scan in
                    # the body is F-length (never F*8/F*NG) — the per-slot
                    # offsets inside a node's run are closed-form.  The
                    # frontier is block-major, so block starts come from a
                    # cummax over boundaries.
                    blk_ff = jax.lax.cummax(fblk)
                    bnd = jnp.concatenate(
                        [jnp.ones((1,), bool), blk_ff[1:] != blk_ff[:-1]])

                    def wrank(w):
                        tot = jnp.cumsum(w) - w
                        start = jax.lax.cummax(jnp.where(bnd, tot, -1))
                        return tot - start

                    # accepted (node, gravity) entries -> cursor scatter
                    gbits = jnp.where(
                        accept[:, None],
                        (flags[:, None] >> (1 + garange)) & 1, 0)   # [F,NG]
                    e_w = jnp.sum(gbits, axis=1)                    # [F]
                    e_base = ent_n[fb] + wrank(e_w)
                    goff = jnp.cumsum(gbits, axis=1) - gbits        # [F,NG]
                    e_ok = gbits > 0
                    e_pos = jnp.where(e_ok, e_base[:, None] + goff,
                                      ent_cap)
                    e_val = nstart + fnode[:, None] * NG + garange
                    ent_buf = ent_buf.at[
                        jnp.broadcast_to(fb[:, None], (F, NG)),
                        e_pos].set(e_val, mode="drop")
                    ent_n = ent_n + jax.ops.segment_sum(e_w, fb, bb)

                    # leaf chunks -> cursor scatter (contiguous chunk runs)
                    ch0 = bc(wn[:, 6])
                    c_w = jnp.where(leaf_here, nch, 0)
                    c_base = chk_n[fb] + wrank(c_w)
                    c_ok = leaf_here[:, None] & (jc < nch[:, None])
                    c_pos = jnp.where(c_ok, c_base[:, None] + jc,
                                      chunk_cap)
                    chk_buf = chk_buf.at[
                        jnp.broadcast_to(fb[:, None], (F, cpl)),
                        c_pos].set(clamp_chk(ch0[:, None] + jc), mode="drop")
                    chk_n = chk_n + jax.ops.segment_sum(c_w, fb, bb)

                    # expansion -> next frontier (contiguous child runs;
                    # stable compaction keeps the queue block-major)
                    c0 = bc(wn[:, 4])
                    ncc = bc(wn[:, 5])
                    x_w = jnp.where(expand, ncc, 0)
                    x_base = jnp.cumsum(x_w) - x_w
                    fcount = (x_base[-1] + x_w[-1]).astype(jnp.int32)
                    x_ok = expand[:, None] & (j8 < ncc[:, None])
                    x_pos = jnp.where(x_ok, x_base[:, None] + j8, F)
                    nfblk = jnp.full((F,), -1, jnp.int32).at[x_pos].set(
                        jnp.broadcast_to(fblk[:, None], (F, 8)),
                        mode="drop")
                    nfnode = jnp.zeros((F,), jnp.int32).at[x_pos].set(
                        c0[:, None] + j8, mode="drop")
                    return (nfblk, nfnode, ent_buf, ent_n, chk_buf, chk_n,
                            ovf | (fcount > F),
                            jnp.maximum(fmax, fcount), fcount)

                return jax.lax.cond(carry[-1] > 0, live, lambda c: c, carry)

            carry = jax.lax.fori_loop(0, n_lvls, body, carry0)
            (_, _, ent_buf, ent_n, chk_buf, chk_n, ovf, fmax, _) = carry
            ovf = ovf | jnp.any(ent_n > ent_cap) \
                | jnp.any(chk_n > chunk_cap)
            return ent_buf, chk_buf, ent_n, chk_n, ovf, fmax

        _lvl_cache[key] = fn
        return fn

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

        Host orchestration: ONE traversal dispatch per trav_batch of blocks
        (all levels fused on device), one device->host sync for the demand
        counters, then demand-bucketed phase-E dispatches.
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
        n = tree.pos_s.shape[0]
        n_init = level_caps(n, depth, bucket=bucket)[min(2, depth)]
        f_floor = _p2(n_init * bbt, 4096)
        # frontier width adapts to measured demand (x1.5 margin); stale
        # widths cost ONE cheap re-traversal, not a walk failure
        F = tree_forces.f_learned.get(bbt)
        if F is None:
            F = _p2(max(frontier_cap * bbt, f_floor), 4096)

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

        for _retry in range(8):
            q = _t_queue(bbt, n, F)
            touts = [q(tree, wtab, *batch_slc(i), rel)
                     for i in range(0, nbp, bbt)]
            if nbatch == 1:
                ent_all, chk_all, n_ent_d, n_chk_d, ovf_d, fmax_d = touts[0]
            else:
                cat = lambda k: jnp.concatenate(
                    [t[k] for t in touts])[:nbp]
                ent_all, chk_all = cat(0), cat(1)
                n_ent_d, n_chk_d = cat(2), cat(3)
                ovf_d = functools.reduce(jnp.logical_or,
                                         [t[4] for t in touts])
                fmax_d = functools.reduce(jnp.maximum,
                                          [t[5] for t in touts])
            mark("traverse", touts)
            ne, nc, ovf_v, fmax_v = jax.device_get(
                (n_ent_d, n_chk_d, ovf_d, fmax_d))
            mark("sync")
            need = _p2(max(int(fmax_v) * 3 // 2, f_floor), 4096)
            if int(fmax_v) > F:
                F = need                  # truncated frontier: re-traverse
                tree_forces.f_learned[bbt] = F
                continue
            if need < F:
                # adopt the tighter width for NEXT calls (no re-traverse)
                tree_forces.f_learned[bbt] = need
            break
        if tree_forces.debug:
            tree_forces.debug_lists = jax.device_get(
                (ent_all, chk_all, n_ent_d, n_chk_d))
        # per-block average frontier demand (what the solver's cap means)
        fr_dem = (int(fmax_v) + bbt - 1) // bbt
        stats = (np.int32(ne.max()), np.int32(nc.max()), np.int32(fr_dem))
        if bool(ovf_v) or int(ne.max()) > ent_cap \
                or int(nc.max()) > chunk_cap:
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
                           fcap: int = 65536) -> WalkResult:
        """Fully traceable fixed-shape walk: the same phase-T/phase-E
        machinery with a static total frontier width `fcap` and full-cap
        evaluation, no host pacing — usable under an outer `jax.jit`
        (driver compile checks, per-shard walks inside `shard_map`).
        Frontier entries past `fcap` and list entries past the configured
        caps are dropped (flagged in .overflow), so caps must be sized
        generously for exactness."""
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
        n_init = level_caps(n, depth, bucket=bucket)[min(2, depth)]
        F = _p2(max(fcap, n_init * nbp), 4096)
        ent, chk, n_ent, n_chk, ovf, fmax = _t_queue(nbp, n, F)(
            tree, wtab, tpos_a, tgid_a, taold_a, rel)

        ev = _eval_for(ent_cap, chunk_cap, bbe)
        nbatches = nbp // bbe
        if nbatches <= 16:
            accs, pots, nias = [], [], []
            for b in range(0, nbp, bbe):
                blk = jnp.arange(b, b + bbe, dtype=jnp.int32)
                a, p, ni = ev(tree, gsrc, ent, chk, n_chk,
                              tpos_a, tmass_a, tgrav_a, tfsoft_a, tgid_a, blk)
                accs.append(a)
                pots.append(p)
                nias.append(ni)
            acc_all = jnp.concatenate(accs)
            pot_all = jnp.concatenate(pots)
            nia_all = jnp.concatenate(nias)
        else:
            # many batches: one traced body scanned over batches instead of
            # an unrolled python loop — compile time and program size stay
            # O(1) in N (essential at 10^6-10^8 targets)
            blks = jnp.arange(nbp, dtype=jnp.int32).reshape(nbatches, bbe)
            acc_all, pot_all, nia_all = jax.lax.map(
                lambda blk: ev(tree, gsrc, ent, chk, n_chk, tpos_a, tmass_a,
                               tgrav_a, tfsoft_a, tgid_a, blk), blks)
            acc_all = acc_all.reshape(nbp, G, 3)
            pot_all = pot_all.reshape(nbp, G)
            nia_all = nia_all.reshape(nbp, G)
        acc, pot, nia = _assemble(
            jnp.arange(nbp, dtype=jnp.int32), acc_all, pot_all, nia_all, nt)
        mx_e = jnp.max(n_ent)
        mx_c = jnp.max(n_chk)
        return WalkResult(acc, pot, nia, ovf, mx_e, mx_c, fmax)

    tree_forces.profile = None
    tree_forces.debug = False
    tree_forces.f_learned = {}
    tree_forces.static = tree_forces_static
    return tree_forces

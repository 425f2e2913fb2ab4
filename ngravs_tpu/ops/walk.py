"""Fused single-dispatch Barnes-Hut walk: octet traversal + Pallas pair eval.

The production force path of the framework.  Rebuild of the reference's hot
loop `force_treeevaluate[_shortrange]` (forcetree.c:1244, 1623) as ONE
traceable program per force pass, so it runs inside device-resident
multi-step segments (no host round trips — on a tunneled TPU every sync
costs tens of milliseconds).

v5 layout (round 4).  Profiling on the chip (benchmarks/SCALE_r03.json)
showed v4 ran at 1.8% of the measured pair-kernel ceiling, for two reasons:
every XLA gather/scatter/repeat on this hardware runs at 1-7 GB/s
(~7e7 gathered rows/s) while dense VPU math runs at ~2e10 pair
interactions/s, and the v4 eval tiles were XLA broadcast programs that
materialize [B, K, G] planes in HBM.  v5 splits the work so XLA only does
the irregular part and a Pallas kernel does all the math:

 1. **Octet traversal** — tree nodes are scattered once per pass into
    8-aligned SIBLING OCTETS (all 8 child slots of a parent, dead slots
    zero), an indexing layout computed from the packed tree in
    `build_octet_layout` (the build itself is untouched).  The
    level-synchronous frontier holds OCTET ids: one chunk-granular gather
    `[B, Fo, 8, W]` per level (8x fewer gathered rows than v4, each
    256B-aligned), and expansion emits exactly ONE child-octet id per
    opened node — a cumsum + one dropping scatter, no `repeat` at all.
    Opening tests are the same conservative per-SUBGROUP forms of
    forcetree.c:1437-1473 (BH + relative criteria), Rcut discard for
    TreePM (forcetree.c:1828-1862), and the "intersects" rule.

 2. **Unified 8-row chunk lists** — both interaction kinds reduce to
    8-row-aligned chunks of ONE packed source table: leaf particles live
    in aligned chunks (as in v4), and node monopoles are laid out
    gravity-major per octet (rows `[octet, g, slot]`), so an accepted
    octet contributes exactly NG chunks, each with an 8-bit row mask
    (accepted AND mass>0 per slot).  Per-block lists are built by cumsum
    compaction (never a sort), demand-bounded gathers fill packed
    `[B, S, 8]` buffers, masked rows get gid = -1.

 3. **Pallas pair evaluation** — the gathered buffers feed the pairwise
    kernel (ops/pairwise_pallas.py): [G x s_chunk] tiles on the VPU in
    VMEM, per-block early exit past each block's live source count, law
    dispatch by broadcast equality masks.  The XLA fallback path (CPU
    test suite, tabulated-transition laws, and the periodic lattice
    correction) evaluates the SAME gathered buffers with the same
    physics, so both paths share one list construction.

Total work = sum over blocks of (list rows x G) pair evaluations; the
per-target valid-pair count is the TPU analog of Gadget's per-particle
interaction count (forcetree.c:1595), reported for GravCost/timings parity.
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

# walk-table columns (before the per-gravity block)
WCX, WCY, WCZ, WFLAGS, WCHOCT, WCHUNK0, WNCHUNK, WSOFT = range(8)


def _p2(x, minimum: int = 8) -> int:
    return max(minimum, 1 << int(math.ceil(math.log2(max(int(x), 1)))))


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class WalkTables(NamedTuple):
    """Packed walk/source tables + octet layout, cacheable across steps.

    The octet layout (slot8/child_oct) depends only on the tree
    STRUCTURE, which is frozen between rebuilds; the packed values drift
    with per-row velocities between moment refreshes — the packed-table
    analog of the reference's dynamic tree updates (predict.c:83-90,
    force_update_pseudoparticles), so device-resident segments never
    re-derive the layout or re-scatter the tables on drift-only steps."""
    slot8: jnp.ndarray      # [M] int32 global octet slot (-1 dead)
    child_oct: jnp.ndarray  # [M] int32 child octet id (-1 none)
    layout_ovf: jnp.ndarray  # scalar bool
    wtab8: jnp.ndarray      # [n_oct, 8*W] octet walk rows, chunk-flat
    wvel8: jnp.ndarray      # [n_oct, 8*NG*3] cm drift velocities
    gsrc: jnp.ndarray       # [NC, 64] packed source rows, chunk-flat
    gvel: jnp.ndarray       # [NC, 24] source row drift velocities
    # NB: everything row-shaped is stored CHUNK-FLAT (minor dim >= 64):
    # XLA tiles f32 operands (8, 128), so a [R, 8] gather operand would
    # be re-laid with 16x padding — 21 GB at N = 1e7


class FusedWalkResult(NamedTuple):
    acc: jnp.ndarray        # [Nt, 3] sorted-target order
    pot: jnp.ndarray        # [Nt]
    ninteract: jnp.ndarray  # [Nt] valid pair interactions of the target
    overflow: jnp.ndarray   # scalar bool — any cap exceeded
    max_ent: jnp.ndarray    # scalar int32 peak per-block leaf records
    max_chunk: jnp.ndarray  # scalar int32 peak per-block leaf chunks
    max_rows: jnp.ndarray   # scalar int32 peak per-block mono OCTET records
    max_frontier: jnp.ndarray  # [depth+1] int32 peak per-level slots (8*oct)
    layout_ovf: jnp.ndarray  # scalar bool — octet LAYOUT overflowed (the
    # only overflow source that needs an octet re-measure; merged into
    # .overflow too)


# ---------------------------------------------------------------------------
# Octet layout: sibling groups of 8 child slots, computed from the packed
# tree (build_tree's per-level occupied-cell arrays are untouched).
# ---------------------------------------------------------------------------

def octet_counts(n: int, depth: int, bucket: int, octet_caps=None):
    """Static per-level OCTET caps.  Octets at level l+1 = level-l nodes
    with children; each such node holds > bucket particles, so their
    count is <= min(cells_l, n/(bucket+1)+1, 8^l).

    `octet_caps`: measured per-level demand override (tuple[depth+1]) —
    the theoretical bound is ~10x the real occupancy of a deep tree, and
    the mono region of the packed source table scales with its sum, so
    production solvers measure the built tree (measure_octet_demand) and
    pass a margined override; build_octet_layout flags overflow if the
    tree outgrows it (the TreeAllocFactor regrow contract,
    forcetree.c:3176)."""
    if octet_caps is not None:
        caps = [int(c) for c in octet_caps]
        assert len(caps) == depth + 1, (len(caps), depth)
        return caps
    caps = level_caps(n, depth, bucket=bucket)
    nt_max = n // (bucket + 1) + 1
    noct = [1]
    for lvl in range(1, depth + 1):
        noct.append(max(1, min(8 ** (lvl - 1), caps[lvl - 1], nt_max)))
    return noct


def measure_octet_demand(tree: Octree, n: int, depth: int, bucket: int):
    """Actual octets per level of a built tree: level-(l-1) nodes with
    children.  One [M]-bool host fetch; feeds octet_counts overrides."""
    caps = level_caps(n, depth, bucket=bucket)
    offs = np.concatenate([[0], np.cumsum(caps)]).astype(np.int64)
    has = np.asarray(jax.device_get(
        (tree.node_nchild > 0) & (tree.node_pcount > 0)))
    out = [1]
    for lvl in range(1, depth + 1):
        out.append(max(1, int(has[offs[lvl - 1]:offs[lvl]].sum())))
    return out


def frontier_slot_caps(n: int, depth: int, bucket: int, octet_caps=None):
    """Per-level frontier demand bounds in SLOT units (8 * octets)."""
    return [8 * c for c in octet_counts(n, depth, bucket, octet_caps)]


@functools.partial(jax.jit, static_argnames=("n", "depth", "bucket",
                                             "octet_caps"))
def build_octet_layout(tree: Octree, n: int, depth: int, bucket: int,
                       octet_caps=None):
    """Per-packed-node octet indexing: returns (slot8 [M] global slot id
    or -1, child_oct [M] global child OCTET id or -1, ovf bool).

    Children of one parent occupy the 8 slots of one octet (dead slots
    stay zero when scattered); the octet rank of a parent equals its rank
    among same-level nodes with children, which matches the rank of its
    children's distinct-parent runs because build_tree packs child ranges
    in ascending parent order (forcetree.c:292 creates the same complete
    sibling groups via force_create_empty_nodes)."""
    caps = level_caps(n, depth, bucket=bucket)
    offs = np.concatenate([[0], np.cumsum(caps)]).astype(np.int32)
    noct = octet_counts(n, depth, bucket, octet_caps)
    ooffs = np.concatenate([[0], np.cumsum(noct)]).astype(np.int32)
    m = int(offs[-1])

    slot8 = jnp.full((m,), -1, jnp.int32).at[0].set(0)
    child_oct = jnp.full((m,), -1, jnp.int32)
    ovf = jnp.zeros((), bool)
    for lvl in range(depth + 1):
        sl = slice(int(offs[lvl]), int(offs[lvl + 1]))
        valid = tree.node_pcount[sl] > 0
        if lvl < depth:
            has = (tree.node_nchild[sl] > 0) & valid
            crank = jnp.cumsum(has.astype(jnp.int32)) - 1
            child_oct = jax.lax.dynamic_update_slice(
                child_oct,
                jnp.where(has & (crank < noct[lvl + 1]),
                          ooffs[lvl + 1] + crank, -1),
                (int(offs[lvl]),))
            ovf = ovf | (jnp.sum(has.astype(jnp.int32)) > noct[lvl + 1])
        if lvl >= 1:
            par = tree.node_parent[sl]
            pc = tree.node_center[jnp.maximum(par, 0)]
            c = tree.node_center[sl]
            octant = ((c[:, 0] > pc[:, 0]).astype(jnp.int32)
                      | ((c[:, 1] > pc[:, 1]).astype(jnp.int32) << 1)
                      | ((c[:, 2] > pc[:, 2]).astype(jnp.int32) << 2))
            po = child_oct[jnp.maximum(par, 0)]
            s8 = jnp.where(valid & (par >= 0) & (po >= 0),
                           8 * po + octant, -1)
            slot8 = jax.lax.dynamic_update_slice(slot8, s8,
                                                 (int(offs[lvl]),))
    return slot8, child_oct, ovf


def walk_table_width(n_gravs: int, accumulator: bool) -> int:
    """Columns of the octet walk table, padded to a multiple of 8."""
    w = 8 + 4 * n_gravs + (n_gravs if accumulator else 0)
    return _rup(w, 8)


@functools.partial(jax.jit, static_argnames=("n_gravs", "accumulator",
                                             "n_oct"))
def pack_walk_table8(tree: Octree, slot8, child_oct, n_gravs: int,
                     n_oct: int, accumulator: bool = False):
    """[n_oct, 8, W] octet walk table: center xyz, flags, child_oct,
    chunk0, nchunk, maxsoft, then per-gravity (cm xyz, mass)
    [, per-gravity count].  flags: bit0 terminal, bits 1..NG per-gravity
    mass>0, bits 8.. node level.  Dead slots are all-zero (flags 0)."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    flags = tree.node_terminal.astype(jnp.int32)
    for g in range(n_gravs):
        flags = flags | ((tree.node_mass[:, g] > 0).astype(jnp.int32)
                         << (1 + g))
    flags = flags | (tree.node_level << 8)
    cols = [tree.node_center[:, 0], tree.node_center[:, 1],
            tree.node_center[:, 2], bc(flags),
            bc(child_oct),
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
    # per-COLUMN 1-D scatters into a flat table: 2-D scatter targets or
    # update arrays with a small minor dim get re-tiled (8,128) by XLA —
    # 8-16x padded copies at 1e7 scale; 1-D ops keep linear layouts
    idx = jnp.where(slot8 >= 0, slot8, n_oct * 8)
    iw = idx * w
    tbl = jnp.zeros((n_oct * 8 * w,), jnp.float32)
    for c, col in enumerate(cols):
        tbl = tbl.at[iw + c].set(col, mode="drop")
    # per-gravity CM drift velocities for dynamic updates between
    # refreshes (predict.c:83-86)
    nv = n_gravs * 3
    iv = idx * nv
    vtbl = jnp.zeros((n_oct * 8 * nv,), jnp.float32)
    for g in range(n_gravs):
        for a in range(3):
            vtbl = vtbl.at[iv + g * 3 + a].set(tree.node_vel[:, g, a],
                                               mode="drop")
    return (tbl.reshape(n_oct, 8 * w),
            vtbl.reshape(n_oct, 8 * nv))


def source_table_layout(n: int, n_oct: int, n_gravs: int,
                        leaf_factor: float):
    """Row layout of the packed generalized-source table: leaf-particle
    chunks, then gravity-major octet monopole rows, then 8 null + 8
    junk rows.  Monopole row of (octet o, gravity g, slot s) =
    nstart + o*8*NG + g*8 + s, so chunk (o, g) = nstart/8 + o*NG + g."""
    cap2 = _rup(max(int(n * leaf_factor) + 8, n), 8)
    nstart = cap2
    rows = cap2 + n_oct * 8 * n_gravs + 16
    null_row = rows - 16
    return cap2, nstart, rows, null_row


@functools.partial(jax.jit, static_argnames=("n_gravs", "leaf_factor",
                                             "accumulator", "n_oct"))
def pack_source_table(tree: Octree, slot8, n_gravs: int, n_oct: int,
                      leaf_factor: float, accumulator: bool = False):
    """[R, 8] packed sources: x, y, z, mass, soft, count, grav, gid
    (6/7 bitcast int32).  Leaf particles live in aligned 8-row chunks
    (256-byte contiguous gathers); node monopoles gravity-major per
    octet (source_table_layout)."""
    n = tree.pos_s.shape[0]
    m = tree.node_mass.shape[0]
    cap2, nstart, rows, null_row = source_table_layout(
        n, n_oct, n_gravs, leaf_factor)
    NG = n_gravs
    bc = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.int32),
                                                jnp.float32)
    neg1f = np.float32(np.array(-1, np.int32).view(np.float32))
    neg2f = np.float32(np.array(-2, np.int32).view(np.float32))

    # ---- LEAF region [0, cap2*8): per-FIELD 1-D interleave scatters.
    # Everything stays strictly 1-D: any [*, 8]-ish intermediate at this
    # scale is re-tiled (8,128) by XLA with 16x padding — 21 GB at 1e7.
    lr8 = jnp.where(tree.leaf_row < cap2, tree.leaf_row,
                    cap2).astype(jnp.int32) * 8
    i8 = jax.lax.broadcasted_iota(jnp.int32, (cap2 * 8,), 0) % 8
    leaf = jnp.where(i8 == IGID, jnp.float32(neg1f), jnp.float32(0.0))
    pfields = (tree.pos_s[:, 0], tree.pos_s[:, 1], tree.pos_s[:, 2],
               tree.mass_s, tree.fsoft_s, jnp.ones_like(tree.mass_s),
               bc(tree.grav_s), bc(np.arange(n, dtype=np.int32)))
    for f, vf in enumerate(pfields):
        leaf = leaf.at[lr8 + f].set(vf, mode="drop")

    # ---- MONO region: CONSTRUCTED (no scatter) — for flat offset
    # q = (o*NG + g)*8 + s, row = nstart + q, the value of field f is a
    # pure gather from the per-node arrays via the slot->node inverse.
    slots_total = n_oct * 8
    inv_slot = jnp.full((slots_total + 1,), m, jnp.int32) \
        .at[jnp.where(slot8 >= 0, slot8, slots_total)] \
        .set(np.arange(m, dtype=np.int32), mode="drop")
    Q = slots_total * NG
    q = jax.lax.broadcasted_iota(jnp.int32, (Q,), 0)
    o_q = q // (8 * NG)
    g_q = (q % (8 * NG)) // 8
    s_q = q % 8
    node = inv_slot[jnp.minimum(o_q * 8 + s_q, slots_total)]
    dead = node >= m
    nodec = jnp.minimum(node, m - 1)
    cmflat = tree.node_cm.reshape(-1)          # [M*NG*3]
    massflat = tree.node_mass.reshape(-1)      # [M*NG]
    mg = jnp.where(dead, 0.0, massflat[nodec * NG + g_q])
    if accumulator:
        countflat = tree.node_count.reshape(-1)
        cg = jnp.maximum(jnp.where(dead, 1.0, countflat[nodec * NG + g_q]),
                         1.0)
    else:
        cg = jnp.ones_like(mg)
    ok = ~dead & (mg > 0)
    mono_fields = (
        cmflat[(nodec * NG + g_q) * 3 + 0],
        cmflat[(nodec * NG + g_q) * 3 + 1],
        cmflat[(nodec * NG + g_q) * 3 + 2],
        mg,
        tree.node_maxsoft[nodec],
        cg,
        bc(g_q),
        jnp.where(ok, neg2f, neg1f))
    mono = jnp.zeros((Q * 8,), jnp.float32)
    qi8 = q * 8
    for f, vf in enumerate(mono_fields):
        mono = mono.at[qi8 + f].set(vf)

    tail = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (16 * 8,), 0) % 8 == IGID,
        jnp.float32(neg1f), jnp.float32(0.0))
    tbl = jnp.concatenate([leaf, mono, tail])

    # ---- drift velocities, same two-region construction --------------
    lr3 = (lr8 // 8) * 3
    lvel = jnp.zeros((cap2 * 3,), jnp.float32)
    for a in range(3):
        lvel = lvel.at[lr3 + a].set(tree.vel_s[:, a], mode="drop")
    velflat = tree.node_vel.reshape(-1)
    mvel = jnp.zeros((Q * 3,), jnp.float32)
    qi3 = q * 3
    for a in range(3):
        mvel = mvel.at[qi3 + a].set(
            jnp.where(dead, 0.0, velflat[(nodec * NG + g_q) * 3 + a]))
    vtbl = jnp.concatenate([lvel, mvel, jnp.zeros((16 * 3,), jnp.float32)])
    return tbl.reshape(rows // 8, 64), vtbl.reshape(rows // 8, 24)


@functools.partial(jax.jit, static_argnames=("n", "depth", "bucket",
                                             "n_gravs", "leaf_factor",
                                             "accumulator", "octet_caps"))
def pack_walk_tables(tree: Octree, n: int, depth: int, bucket: int,
                     n_gravs: int, leaf_factor: float,
                     accumulator: bool = False,
                     layout=None, octet_caps=None) -> WalkTables:
    """Derive the octet layout (unless `layout` carries a cached one from
    an earlier build of the SAME tree structure) and pack both walk
    tables.  Called once per tree build/refresh; between calls the
    tables only `drift_walk_tables`."""
    noct = octet_counts(n, depth, bucket, octet_caps)
    n_oct = int(np.sum(noct))
    if layout is None:
        slot8, child_oct, oovf = build_octet_layout(tree, n, depth, bucket,
                                                    octet_caps)
    else:
        slot8, child_oct, oovf = layout
    gsrc, gvel = pack_source_table(tree, slot8, n_gravs, n_oct,
                                   leaf_factor, accumulator=accumulator)
    wtab8, wvel8 = pack_walk_table8(tree, slot8, child_oct, n_gravs,
                                    n_oct, accumulator)
    return WalkTables(slot8=slot8, child_oct=child_oct, layout_ovf=oovf,
                      wtab8=wtab8, wvel8=wvel8, gsrc=gsrc, gvel=gvel)


@functools.partial(jax.jit, static_argnames=("n_gravs",))
def drift_walk_tables(wt: WalkTables, dd, n_gravs: int) -> WalkTables:
    """Elementwise drift of the packed tables: source rows move with
    their row velocities, walk-table per-gravity CMs with the node CM
    velocities (cell centers are frozen) — the packed analog of the
    reference's dynamic tree update (predict.c:83-90).  Both tables are
    chunk-flat; the velocity-to-position column mapping is a tiny static
    0/1 matmul so no awkwardly-tiled intermediates materialize."""
    pv = np.zeros((24, 64), np.float32)
    for r in range(8):
        for a in range(3):
            pv[r * 3 + a, r * 8 + a] = 1.0
    gsrc = wt.gsrc + (wt.gvel * dd) @ jnp.asarray(pv)
    w = wt.wtab8.shape[1] // 8
    pw = np.zeros((8 * n_gravs * 3, 8 * w), np.float32)
    for s in range(8):
        for g in range(n_gravs):
            for a in range(3):
                pw[(s * n_gravs + g) * 3 + a, s * w + 8 + 4 * g + a] = 1.0
    wtab8 = wt.wtab8 + (wt.wvel8 * dd) @ jnp.asarray(pw)
    return wt._replace(gsrc=gsrc, wtab8=wtab8)


def normalize_frontier_caps(frontier_caps, depth: int):
    """Per-level frontier caps (SLOT units) as a tuple[depth+1];
    int -> clamped 8^l."""
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
                    mono_cap: int = 1024,
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
                    subgroups: int = 4,
                    s_chunk: int = 256,
                    octet_caps=None):
    """Build the fused walk.  Returns fn(tree, tgt_sorted, rel) ->
    FusedWalkResult — fully traceable (usable under jit / while_loop /
    shard_map).  All caps are static **per-block** quantities; exceeding
    any sets .overflow and the caller re-tunes (the analog of Gadget
    growing TreeAllocFactor on "too many nodes", forcetree.c:3176).

    `chunk_cap`: per-block UNIFIED 8-row source chunks (accepted
    monopole octet runs + opened leaf ranges share one list);
    `frontier_cap`: per-level frontier SLOTS per block (int, or a
    per-level tuple learned from demand; rounded up to whole octets).
    `ent_cap`/`mono_cap` are accepted for compatibility and ignored.
    `ec` slices the XLA-fallback dense eval loops.

    `treepm`: dict(sr_ftab, sr_ptab, asmth, rcut) enables the short-range
    walk (Rcut discard forcetree.c:1828-1862 + closed-form/tabulated
    truncation :1958-2027).

    `use_pallas`: None = auto (TPU backend only).  The Pallas path needs
    closed-form short-range kernels and no lattice pass; otherwise the
    XLA fallback evaluates the same gathered lists.
    """
    G = group_size
    NG = n_gravs
    B = batch_blocks
    S = subgroups
    GS = G // S
    del ent_cap, mono_cap          # legacy caps: the unified list has one
    SCH = s_chunk                  # pallas source chunk (rows per grid step)
    GCHW = _rup(max(4 * SCH, 1024), SCH)   # gather-loop rows per slice
    CL = _rup(chunk_cap, GCHW // 8)    # UNIFIED chunks per block (mono+leaf)
    EVK = max(128, ec)             # XLA-fallback eval slice (rows)

    assert G % S == 0 and G % 8 == 0
    periodic = box_size > 0
    groups = wiring.unique_laws()
    single_law = len(groups) == 1
    use_count = wiring.accumulator
    W = walk_table_width(NG, use_count)
    fcaps_l = normalize_frontier_caps(frontier_cap, depth)
    foct_l = tuple(max(1, (c + 7) // 8) for c in fcaps_l)

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

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and not interpret
    pallas_ok = (closed_form and lattice_tables is None
                 and stage_limit >= 3)
    kernel_fn = None
    if (use_pallas or interpret) and pallas_ok:
        from .pairwise_pallas import make_pairwise_kernel
        kernel_fn = make_pairwise_kernel(
            wiring, NG, group=G, s_chunk=SCH, box_size=box_size,
            want_pot=want_pot, accumulator=use_count,
            treepm_asmth=(treepm["asmth"] if treepm is not None else 0.0),
            interpret=interpret)

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
    # Physics dispatch for the XLA fallback eval (identical math to the
    # Pallas kernel, ops/pairwise_pallas.py).
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
        """Evaluate the law matrix over a tile; dispatch by broadcast
        equality masks (never gathers)."""
        pair_full = None
        if tpm_tuple is not None and not closed_form:
            pair_full = (tg * NG + sg).astype(jnp.int32)
        if single_law:
            return law_factors(groups[0][0], tm, sm, r2, r, h, scount,
                               pair_full)
        fac = jnp.zeros_like(r2)
        pot = jnp.zeros_like(r2) if want_pot else None
        for law, slots in groups:
            mk = None
            for (i, j) in slots:
                mij = (tg == i) & (sg == j)
                mk = mij if mk is None else (mk | mij)
            f_k, p_k = law_factors(law, tm, sm, r2, r, h, scount, pair_full)
            fac = jnp.where(mk, f_k, fac)
            if want_pot:
                pot = jnp.where(mk, p_k, pot)
        return fac, pot

    def pair_tile(tpos, tgrav, tsoft, tmass, tgid, src):
        """XLA-fallback dense pair evaluation of packed sources
        [B, 8fields, K] against targets [B, 1, G] -> (ax, ay, az, pot,
        nv) each [B, G]."""
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        sgid = bc(src[:, IGID, :])
        sgrav = bc(src[:, IGRAV, :])[:, :, None]
        valid = (sgid[:, :, None] != -1) & (tgid >= 0) \
            & (sgid[:, :, None] != tgid)
        scount = src[:, FCOUNT, :, None] if use_count else 1.0
        dx = min_image(src[:, FX, :, None] - tpos[0])
        dy = min_image(src[:, FY, :, None] - tpos[1])
        dz = min_image(src[:, FZ, :, None] - tpos[2])
        r2 = dx * dx + dy * dy + dz * dz
        r = jnp.sqrt(r2)
        h = jnp.maximum(tsoft, src[:, FSOFT, :, None])
        fac, pot = dispatch(tgrav, sgrav, tmass, src[:, FMASS, :, None],
                            r2, r, h, scount)
        fac = jnp.where(valid, fac, 0.0)
        ax = jnp.sum(fac * dx, axis=-2)
        ay = jnp.sum(fac * dy, axis=-2)
        az = jnp.sum(fac * dz, axis=-2)
        pp = (jnp.sum(jnp.where(valid, pot, 0.0), axis=-2) if want_pot
              else jnp.zeros_like(ax))
        nv = jnp.sum(valid.astype(jnp.int32), axis=-2)
        return ax, ay, az, pp, nv

    # ------------------------------------------------------------------
    # One batch of B blocks: octet traversal -> chunk lists -> eval.
    # ------------------------------------------------------------------
    def _walk_batch(tree, wtab8, gsrc8, layout, octs, tp, ta, rel,
                    n_static: int):
        init_lvl = min(2, depth)
        noct = octet_counts(n_static, depth, bucket, octet_caps)
        ooffs = np.concatenate([[0], np.cumsum(noct)]).astype(np.int32)
        n_oct = int(ooffs[-1])

        cap2, nstart, rows, null_row = layout
        null_chunk = null_row // 8           # gid = -1 rows
        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        bcf = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)
        big = np.float32(1e30)
        pow2 = np.asarray(1 << np.arange(8), np.int32)

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

        # target columns for the fallback pair tiles: [B, 1, G]
        tx = tpos[:, None, :, 0]
        ty = tpos[:, None, :, 1]
        tz = tpos[:, None, :, 2]
        tgrav_t = tgrav[:, None, :]
        tsoft_t = tsoft[:, None, :]
        tmass_t = tp[:, None, :, FMASS]
        tgid_t = tgid[:, None, :]

        ovf = tree.n_chunk_rows > cap2

        # per-level record lists (concatenated after the loop)
        nc_ls, c0_ls = [], []        # leaf records (chunk0, nchunk runs)
        mo_ls, ml_ls, mm_ls = [], [], []  # mono records (start, len, masks)
        lvl_live = [jnp.zeros((), jnp.int32)] * (depth + 1)

        # shallow real leaves (above the init level) go straight to the
        # leaf lists: their records come from the first ooffs[init] octets
        if init_lvl > 0:
            n_sho = int(ooffs[init_lvl])
            swn = wtab8[:n_sho].reshape(n_sho * 8, W)
            s_fl = bc(swn[:, WFLAGS])
            s_nch = bc(swn[:, WNCHUNK])
            s_term = ((s_fl & 1) > 0) & ((s_fl & 255) != 0)
            s_ok = blk_ok[:, None] & (s_term & (s_nch > 0))[None, :]
            nc_ls.append(jnp.where(s_ok, s_nch[None, :], 0))
            c0_ls.append(jnp.broadcast_to(bc(swn[:, WCHUNK0])[None, :],
                                          (B, n_sho * 8)))

        # initial frontier: every live block x every init-level octet
        Fo = min(int(noct[init_lvl]), foct_l[init_lvl])
        foct = jnp.broadcast_to(
            int(ooffs[init_lvl]) + np.arange(Fo, dtype=np.int32)[None, :],
            (B, Fo))
        nlive = jnp.where(blk_ok, np.int32(min(int(noct[init_lvl]), Fo)), 0)
        ovf = ovf | (int(noct[init_lvl]) > Fo)

        for lvl in range(init_lvl, depth + 1):
            Fo = int(foct.shape[1])
            F = Fo * 8
            fiota = np.arange(Fo, dtype=np.int32)
            live_o = fiota[None, :] < nlive[:, None]        # [B, Fo]
            lvl_live[lvl] = jnp.max(nlive) * 8

            wno = wtab8[jnp.where(live_o, foct, 0)]         # [B, Fo, 8*W]
            wn = wno.reshape(B, F, W)
            live = jnp.repeat(live_o, 8, axis=1)            # [B, F]
            flags = bc(wn[:, :, WFLAGS])
            valid = live & ((flags & 255) != 0)
            terminal = (flags & 1) > 0
            nch = bc(wn[:, :, WNCHUNK])
            # nodes of the complete shallow levels under a real shallow
            # leaf carry moments but no chunks; the preamble already
            # summed those leaves directly — never re-count them
            valid = valid & ~(terminal & (nch == 0))
            center = wn[:, :, WCX:WCZ + 1]
            cg = wn[:, :, 8:8 + 4 * NG].reshape(B, F, NG, 4)
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

            # accepted octet records: NG-chunk runs (gravity-major octet
            # rows in the source table) + per-gravity 8-bit slot masks
            # (accepted AND mass>0)
            acc_o = accept.reshape(B, Fo, 8)
            hasg = ((flags.reshape(B, Fo, 8)[..., None]
                     >> (1 + np.arange(NG, dtype=np.int32))) & 1) > 0
            mbits = jnp.sum((acc_o[..., None] & hasg).astype(jnp.int32)
                            * pow2[None, None, :, None], axis=2)  # [B,Fo,NG]
            any_a = jnp.any(acc_o, axis=2)
            mo_ls.append(nstart // 8 + foct * NG)
            ml_ls.append(jnp.where(any_a, NG, 0))
            mm_ls.append(mbits)

            nc_ls.append(jnp.where(leaf_here, nch, 0))
            c0_ls.append(bc(wn[:, :, WCHUNK0]))

            if lvl == depth:
                break  # depth-level nodes are terminal by construction

            # expand: each opened node emits exactly ONE child octet id;
            # compacted selected-first by a stable sort — batched 2-D
            # scatters cost ~2 ms/batch on this chip while lax.sort of
            # these rows is free (benchmarks/trav_micro.py cumsum/sortc)
            Fn = min(foct_l[lvl + 1], int(noct[lvl + 1]))
            co = bc(wn[:, :, WCHOCT])
            exp_ok = expand & (co >= 0)
            total = jnp.sum(exp_ok.astype(jnp.int32), axis=1)
            key = jnp.where(exp_ok, 0, 1).astype(jnp.int32)
            _, co_sorted = jax.lax.sort((key, co), num_keys=1, dimension=1)
            if co_sorted.shape[1] >= Fn:
                foct = jax.lax.slice_in_dim(co_sorted, 0, Fn, axis=1)
            else:
                foct = jnp.concatenate(
                    [co_sorted,
                     jnp.zeros((B, Fn - co_sorted.shape[1]), jnp.int32)],
                    axis=1)
            nlive = jnp.minimum(total, Fn)
            ovf = ovf | jnp.any(total > Fn)

        rows2 = np.arange(B, dtype=np.int32)[:, None]

        # ------------------------------------------------------------
        # UNIFIED chunk list straight from the UNCOMPACTED record
        # streams — no per-record compaction, no batched repeat.  Every
        # record is a contiguous chunk RUN (start, len): accepted mono
        # octets contribute NG gravity chunks, opened leaves their
        # aligned chunk ranges.  The expansion is one delta-scatter of
        # per-run base values at run starts + one associative
        # forward-fill scan: chid[i] = start[run(i)] + (i - pos0[run(i)])
        # = basefill[i] + i.
        # ------------------------------------------------------------
        starts = jnp.concatenate(mo_ls + c0_ls, axis=1)    # [B, T]
        lens = jnp.concatenate(ml_ls + nc_ls, axis=1)
        mms = jnp.concatenate(mm_ls, axis=1)               # [B, Tm, NG]
        Tm = int(mms.shape[1])

        UC = CL
        cum = jnp.cumsum(lens, axis=1)
        n_uch = cum[:, -1]
        pos0 = cum - lens
        live_r = lens > 0
        ovf = ovf | jnp.any(n_uch > UC)
        SENT = np.int32(-(2**30))
        uiota = np.arange(UC, dtype=np.int32)
        # merge-sort forward fill (scatter-free): record rows (run base
        # values at their start positions) merged with the UC grid rows,
        # sorted by (position, records-first), forward-filled, grid rows
        # extracted by a second stable sort — batched 2-D scatters cost
        # ~2 ms/batch on this chip while these sorts are free
        # (benchmarks/trav_micro.py)
        vidx = jnp.where(live_r & (pos0 < UC), pos0, UC)
        # single fused key (pos*2 + tag): multi-key lax.sort lowers to the
        # slow generic-comparator path; single-key stays on the fast one
        keym = jnp.concatenate(
            [vidx * 2, uiota[None, :] * 2 + 1
             + jnp.zeros((B, UC), jnp.int32)], axis=1)
        valm = jnp.concatenate(
            [starts - pos0, jnp.full((B, UC), SENT, jnp.int32)], axis=1)
        keym, valm = jax.lax.sort((keym, valm), num_keys=1, dimension=1)
        valm = jax.lax.associative_scan(
            lambda a, b: jnp.where(b == SENT, a, b), valm, axis=1)
        _, base = jax.lax.sort((1 - (keym & 1), valm), num_keys=1,
                               dimension=1)
        base = jax.lax.slice_in_dim(base, 0, UC, axis=1)
        uch = base + uiota[None, :]
        uch = jnp.where((uiota[None, :] < n_uch[:, None]) & (base != SENT),
                        uch, null_chunk)
        uch = jnp.where((uch >= 0) & (uch < rows // 8), uch, null_chunk)

        # per-chunk 8-bit row masks: mono records scatter their per-
        # gravity masks at pos0 + g; everything else is fully live
        garange = np.arange(NG, dtype=np.int32)
        mpos = pos0[:, :Tm, None] + garange[None, None, :]
        mi = jnp.where(live_r[:, :Tm, None] & (mpos < UC), mpos, UC)
        um8 = jnp.full((B, UC), 255, jnp.int32) \
            .at[rows2[:, :, None], mi].set(mms, mode="drop")

        n_mono = jnp.sum(lens[:, :Tm], axis=1) // NG
        stats = jnp.stack([jnp.max(jnp.sum(live_r.astype(jnp.int32),
                                           axis=1)),
                           jnp.max(n_uch), jnp.max(n_mono)])
        lvls = jnp.stack(lvl_live)

        if stage_limit < 2:
            z = jnp.zeros((B, G), jnp.float32)
            zi = jnp.broadcast_to(
                (n_uch * 8)[:, None], (B, G)).astype(jnp.int32)
            out = jnp.stack([z, z, z, z], axis=-1)
            return out, zi, ovf, stats, lvls

        # ------------------------------------------------------------
        # Demand-bounded gather: fill the packed [B, 8, UC*8] buffer
        # (fields on sublanes, sources on lanes — the kernel layout) in
        # GCH-row slices up to the batch's max live chunk count, masking
        # dead rows (gid = -1) from the per-chunk mask bits.  GCH is a
        # multiple of the kernel chunk, large enough that the loop is
        # bandwidth- not op-launch-bound.
        # ------------------------------------------------------------
        GCH = min(GCHW, UC * 8)
        KC = GCH // 8
        neg1f = np.float32(np.array(-1, np.int32).view(np.float32))
        bit_iota = np.arange(8, dtype=np.int32)

        def gather_body(c):
            s, bf = c
            sl = jax.lax.dynamic_slice_in_dim(uch, s * KC, KC, axis=1)
            src = gsrc8[sl].reshape(B, KC, 8, 8)         # [B, KC, 8r, 8f]
            src = jnp.transpose(src, (0, 3, 1, 2)).reshape(B, 8, KC * 8)
            msl = jax.lax.dynamic_slice_in_dim(um8, s * KC, KC, axis=1)
            bit = ((msl[:, :, None] >> bit_iota) & 1) > 0
            src = src.at[:, IGID, :].set(
                jnp.where(bit.reshape(B, KC * 8), src[:, IGID, :], neg1f))
            bf = jax.lax.dynamic_update_slice(bf, src, (0, 0, s * GCH))
            return (s + 1, bf)

        ubuf = jnp.zeros((B, 8, UC * 8), jnp.float32) \
            .at[:, IGID, :].set(neg1f)
        ns_live = (jnp.max(n_uch) + KC - 1) // KC
        _, ubuf = jax.lax.while_loop(lambda c: c[0] < ns_live, gather_body,
                                     (jnp.int32(0), ubuf))

        if stage_limit == 2:
            # probe mode: consume the gathered buffer so the gather is
            # actually timed (XLA would otherwise dead-code it away)
            import os as _os
            if _os.environ.get("WALK_STAGE2_LISTS"):
                z = jnp.broadcast_to(
                    (jnp.sum(uch, axis=1)
                     + jnp.sum(um8, axis=1)).astype(jnp.float32)[:, None],
                    (B, G))
            else:
                z = jnp.broadcast_to(jnp.sum(ubuf, axis=(1, 2))[:, None],
                                     (B, G))
            zi = jnp.broadcast_to(
                (n_uch * 8)[:, None], (B, G)).astype(jnp.int32)
            out = jnp.stack([z, z, z, z], axis=-1)
            return out, zi, ovf, stats, lvls

        acc_x = jnp.zeros((B, G), jnp.float32)
        acc_y = jnp.zeros((B, G), jnp.float32)
        acc_z = jnp.zeros((B, G), jnp.float32)
        acc_p = jnp.zeros((B, G), jnp.float32)
        nia = jnp.zeros((B, G), jnp.int32)

        if stage_limit >= 3 and kernel_fn is not None:
            targets = dict(
                x=tpos[..., 0].reshape(B * G, 1),
                y=tpos[..., 1].reshape(B * G, 1),
                z=tpos[..., 2].reshape(B * G, 1),
                mass=tp[..., FMASS].reshape(B * G, 1),
                grav=tgrav.reshape(B * G, 1),
                fsoft=tsoft.reshape(B * G, 1),
                gid=tgid.reshape(B * G, 1))
            a3, pp, nv = kernel_fn(targets, ubuf,
                                   (n_uch * 8).reshape(B, 1))
            a3 = a3.reshape(B, G, 3)
            acc_x = a3[..., 0]
            acc_y = a3[..., 1]
            acc_z = a3[..., 2]
            acc_p = pp.reshape(B, G)
            nia = nv.reshape(B, G)
        elif stage_limit >= 3:
            # XLA fallback: identical physics over the same buffers,
            # scanned in EVK-row slices to bound the live temporary
            def eval_buf(state, buf, n_src_rows):
                nsl = (jnp.max(n_src_rows) + EVK - 1) // EVK

                def body(c):
                    s, (ax0, ay0, az0, ap0, ni0) = c
                    src = jax.lax.dynamic_slice_in_dim(
                        buf, s * EVK, EVK, axis=2)
                    ax, ay, az, pp, nv = pair_tile(
                        (tx, ty, tz), tgrav_t, tsoft_t, tmass_t, tgid_t,
                        src)
                    return (s + 1, (ax0 + ax, ay0 + ay, az0 + az,
                                    ap0 + pp, ni0 + nv))

                _, state = jax.lax.while_loop(lambda c: c[0] < nsl, body,
                                              (jnp.int32(0), state))
                return state

            state = (acc_x, acc_y, acc_z, acc_p, nia)
            state = eval_buf(state, ubuf, n_uch * 8)
            acc_x, acc_y, acc_z, acc_p, nia = state

        if lattice_tables is not None and stage_limit >= 3:
            # periodic lattice (Ewald) correction, the reference's second
            # walk (forcetree.c:2077-2432): applied to the SAME
            # interaction set via the same gathered buffers
            from .lattice import lattice_correction

            def lat_eval(state, buf, n_src_rows):
                nsl = (jnp.max(n_src_rows) + EVK - 1) // EVK

                def body(c):
                    s, (ax0, ay0, az0, ap0) = c
                    src = jax.lax.dynamic_slice_in_dim(
                        buf, s * EVK, EVK, axis=2)
                    bci = lambda a: jax.lax.bitcast_convert_type(
                        a, jnp.int32)
                    sgid = bci(src[:, IGID, :])
                    sgrav = bci(src[:, IGRAV, :])
                    v = (sgid[:, :, None] != -1) & (tgid_t >= 0) \
                        & (sgid[:, :, None] != tgid_t)
                    dx = min_image(src[:, FX, :, None] - tx)
                    dy = min_image(src[:, FY, :, None] - ty)
                    dz = min_image(src[:, FZ, :, None] - tz)
                    pidx = (tgrav_t * NG
                            + sgrav[:, :, None]).astype(jnp.int32)
                    fcx, fcy, fcz, pc = lattice_correction(
                        lattice_tables, fac_intp, dx, dy, dz, pidx)
                    sm = jnp.where(v, src[:, FMASS, :, None], 0.0)
                    return (s + 1,
                            (ax0 + jnp.sum(sm * fcx, axis=-2),
                             ay0 + jnp.sum(sm * fcy, axis=-2),
                             az0 + jnp.sum(sm * fcz, axis=-2),
                             ap0 + jnp.sum(sm * pc, axis=-2)))

                _, state = jax.lax.while_loop(lambda c: c[0] < nsl, body,
                                              (jnp.int32(0), state))
                return state

            state = (acc_x, acc_y, acc_z, acc_p)
            state = lat_eval(state, ubuf, n_uch * 8)
            acc_x, acc_y, acc_z, acc_p = state

        out = jnp.stack([acc_x, acc_y, acc_z, acc_p], axis=-1)
        return out, nia, ovf, stats, lvls

    # ------------------------------------------------------------------
    # Composition.
    # ------------------------------------------------------------------
    rel_true = np.bool_(True)
    rel_false = np.bool_(False)
    rel_default = rel_true if opening == "relative" else rel_false

    def fused_forces(tree: Octree, tgt_sorted: jnp.ndarray,
                     opening_override: str | None = None,
                     rel=None, tables: WalkTables | None = None
                     ) -> FusedWalkResult:
        """Forces on sorted-order target indices (-1 padding).  One traced
        program.  Targets are processed by TREE-ALIGNED blocks (the
        tree's group-node blocks, <= G consecutive sorted particles in
        one cell) so block bounding boxes are tight tree cells; only
        blocks containing a requested target are walked, in batches of B
        under a dynamic-trip-count while_loop (device-resident).

        `tables`: pre-packed (and possibly drifted) WalkTables from
        `pack_walk_tables` — segments pass these to skip the per-pass
        layout derivation and table scatters on drift-only steps."""
        if rel is None:
            rel = rel_default if opening_override is None else \
                (rel_true if opening_override == "relative" else rel_false)
        n = tree.pos_s.shape[0]
        assert tree.blk_start.shape[0] > 0
        noct = octet_counts(n, depth, bucket, octet_caps)
        n_oct = int(np.sum(noct))
        layout = source_table_layout(n, n_oct, NG, leaf_factor)
        cap2, _, rows_t, null_row = layout

        if tables is None:
            tables = pack_walk_tables(tree, n, depth, bucket, NG,
                                      leaf_factor,
                                      accumulator=wiring.accumulator,
                                      octet_caps=octet_caps)
        oovf = tables.layout_ovf
        # FLAT chunk table [NC, 64]: gathers read whole 256B chunks, and
        # the field de-interleave happens on the (small) gathered output
        gsrc8 = tables.gsrc
        wtab8 = tables.wtab8

        nt = int(tgt_sorted.shape[0])
        NGRP = int(tree.blk_start.shape[0])
        bcf = lambda a: jax.lax.bitcast_convert_type(
            a.astype(jnp.int32), jnp.float32)

        # per-field 1-D target columns: the per-batch [B, G] gathers
        # assemble the (small) packed target rows on the fly — a
        # pre-packed [N, 8] table would be re-tiled (8,128) by XLA
        tposx, tposy, tposz = (tree.pos_s[:, 0], tree.pos_s[:, 1],
                               tree.pos_s[:, 2])
        tgravf = bcf(tree.grav_s)

        # active blocks: any member requested.  Batched in DEMAND order
        # (group-node depth = local density proxy, descending) instead of
        # Morton order: gather/eval loop trip counts are per-batch maxima,
        # so demand-homogeneous batches keep the max near the mean — one
        # dense-nucleus block no longer sets the pace for 127 sparse ones.
        act = jnp.zeros((n,), jnp.bool_) \
            .at[jnp.where(tgt_sorted >= 0, tgt_sorted, n)] \
            .set(True, mode="drop")
        blk_act = jax.ops.segment_max(act.astype(jnp.int32), tree.pblk,
                                      NGRP) > 0
        blk_act = blk_act & (tree.blk_cnt > 0)
        nact = jnp.sum(blk_act.astype(jnp.int32))
        sort_key = jnp.where(blk_act, -tree.blk_level, INT32_MAX)
        _, sorted_ids = jax.lax.sort(
            (sort_key, jnp.arange(NGRP, dtype=jnp.int32)), num_keys=1)
        blk_ids = jnp.concatenate(
            [jnp.where(np.arange(NGRP, dtype=np.int32) < nact,
                       sorted_ids, -1),
             jnp.full((B,), -1, jnp.int32)])
        nbatch = (nact + B - 1) // B
        ovf0 = oovf | (tree.n_blocks > NGRP)

        giota = np.arange(G, dtype=np.int32)

        carry0 = (jnp.int32(0),
                  jnp.zeros((5 * n,), jnp.float32),
                  ovf0,
                  jnp.zeros((3,), jnp.int32),
                  jnp.zeros((depth + 1,), jnp.int32))

        def body(carry):
            bi, buf5, ovf, stats, lvls = carry
            ids = jax.lax.dynamic_slice_in_dim(blk_ids, bi * B, B)
            vb = ids >= 0
            ids0 = jnp.maximum(ids, 0)
            st = tree.blk_start[ids0]
            cnt = jnp.where(vb, tree.blk_cnt[ids0], 0)
            slots = st[:, None] + giota[None, :]            # [B, G]
            in_blk = giota[None, :] < cnt[:, None]
            safe = jnp.minimum(jnp.where(in_blk, slots, 0), n - 1)
            tp = jnp.stack(
                [tposx[safe], tposy[safe], tposz[safe],
                 tree.mass_s[safe], tree.fsoft_s[safe],
                 jnp.zeros((B, G), jnp.float32), tgravf[safe],
                 bcf(jnp.where(in_blk, slots, -1))], axis=-1)
            ta = tree.aold_s[safe]
            out, nia_t, ovf1, stats1, lvl1 = _walk_batch(
                tree, wtab8, gsrc8, layout, noct, tp, ta, rel, n)
            rows = jnp.where(in_blk, slots, n).reshape(-1)
            base_rows = jnp.where(rows < n, rows, 5 * n)
            idxs = jnp.concatenate([base_rows + c * n for c in range(5)])
            vals = jnp.concatenate(
                [out[..., 0].reshape(-1), out[..., 1].reshape(-1),
                 out[..., 2].reshape(-1), out[..., 3].reshape(-1),
                 # count stored as f32 VALUE: a bitcast int32 pattern is
                 # a subnormal float and the TPU flushes it to zero;
                 # per-target counts are far below 2^24 so exact
                 nia_t.astype(jnp.float32).reshape(-1)])
            buf5 = buf5.at[idxs].set(vals, mode="drop")
            return (bi + 1, buf5, ovf | ovf1,
                    jnp.maximum(stats, stats1), jnp.maximum(lvls, lvl1))

        _, buf5, ovf, stats, lvl_max = jax.lax.while_loop(
            lambda c: c[0] < nbatch, body, carry0)

        tsafe = jnp.maximum(tgt_sorted, 0)
        tlive = tgt_sorted >= 0
        out_c = [jnp.where(tlive, buf5[c * n + tsafe], 0.0)
                 for c in range(4)]
        nia_all = jnp.where(
            tlive, buf5[4 * n + tsafe].astype(jnp.int32), 0)
        return FusedWalkResult(
            acc=jnp.stack(out_c[0:3], axis=-1), pot=out_c[3],
            ninteract=nia_all, overflow=ovf,
            max_ent=stats[0], max_chunk=stats[1],
            max_rows=stats[2], max_frontier=lvl_max,
            layout_ovf=oovf)

    fused_forces.group_size = G
    fused_forces.batch_blocks = B
    fused_forces.frontier_caps = fcaps_l
    fused_forces.uses_pallas = kernel_fn is not None
    fused_forces.pack_tables = lambda tree, layout=None: pack_walk_tables(
        tree, tree.pos_s.shape[0], depth, bucket, NG, leaf_factor,
        accumulator=wiring.accumulator, layout=layout,
        octet_caps=octet_caps)
    fused_forces.drift_tables = lambda wt, dd: drift_walk_tables(wt, dd, NG)
    return fused_forces


def _row_repeat(vals, repeats, total: int):
    """Batched `jnp.repeat(vals[b], repeats[b], total_repeat_length=total)`
    per row (leaf-record run expansion only — the traversal itself no
    longer repeats)."""
    def one(v, r):
        return jnp.repeat(v, r, total_repeat_length=total)
    return jax.vmap(one)(vals, repeats)

"""Morton (Z-order) keys for octree construction.

The reference orders particles along a Peano-Hilbert curve (peano.c:356) to
make tree nodes contiguous array ranges.  Any space-filling octree curve has
that contiguity property; Morton keys keep the key<->cell math to a few bit
tricks that vectorize on the VPU, so the TPU rebuild uses Morton order for the
tree itself.  (Hilbert ordering only changes sibling *ordering*, not the cell
hierarchy — the tree built over Morton-sorted particles is identical.)

Keys are dual int32 words (hi = levels 1..10, lo = levels 11..depth), so the
tree can go to depth 20 (the reference's BITS_PER_DIMENSION=18,
allvars.h:34) without int64, which TPUs lack natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DEPTH = 20
HI_DEPTH = 10


def _part1by2(x):
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact1by2(x):
    """Inverse of _part1by2."""
    x = x & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x000003FF
    return x


def morton_encode(cell: jnp.ndarray) -> jnp.ndarray:
    """[N,3] int cell coords (< 2^10) -> [N] int32 Morton keys."""
    cell = cell.astype(jnp.int32)
    return (_part1by2(cell[..., 0])
            | (_part1by2(cell[..., 1]) << 1)
            | (_part1by2(cell[..., 2]) << 2))


def morton_decode(key: jnp.ndarray) -> jnp.ndarray:
    """[N] int32 keys -> [N,3] int cell coords (10 levels)."""
    return jnp.stack([_compact1by2(key),
                      _compact1by2(key >> 1),
                      _compact1by2(key >> 2)], axis=-1)


def cell_coords(pos, corner, inv_len, depth: int):
    """Continuous positions -> integer cell coords at `depth` levels."""
    n_cells = 1 << depth
    f = (pos - corner) * inv_len  # in [0,1)
    c = jnp.floor(f * n_cells).astype(jnp.int32)
    return jnp.clip(c, 0, n_cells - 1)


def morton_keys2(pos, corner, inv_len, depth: int):
    """Positions -> dual (hi, lo) int32 Morton keys at `depth` levels.

    hi covers levels 1..min(depth,10); lo covers levels 11..depth (zero when
    depth <= 10).  The lo coords are computed from the *residual* fraction so
    f32 precision is not lost at deep levels.
    """
    assert depth <= MAX_DEPTH
    lo_bits = max(0, depth - HI_DEPTH)
    hi_bits = depth - lo_bits
    f = (pos - corner) * inv_len                    # in [0,1)
    fh = f * (1 << hi_bits)
    c_hi = jnp.clip(jnp.floor(fh).astype(jnp.int32), 0, (1 << hi_bits) - 1)
    hi = morton_encode(c_hi)
    if lo_bits:
        res = fh - c_hi.astype(fh.dtype)            # residual in [0,1)
        c_lo = jnp.clip(jnp.floor(res * (1 << lo_bits)).astype(jnp.int32),
                        0, (1 << lo_bits) - 1)
        lo = morton_encode(c_lo)
    else:
        lo = jnp.zeros_like(hi)
    return hi, lo


def level_key2(hi, lo, depth: int, lvl: int):
    """Dual key truncated to level `lvl`: returns (hk, lk)."""
    lo_bits = max(0, depth - HI_DEPTH)
    if lvl <= depth - lo_bits:
        return hi >> (3 * (depth - lo_bits - lvl)), jnp.zeros_like(lo)
    return hi, lo >> (3 * (depth - lvl))


def decode_center(hk, lk, depth: int, lvl: int, corner, root_len):
    """Cell center of a level-`lvl` node given its truncated dual key."""
    lo_bits = max(0, depth - HI_DEPTH)
    hi_lvls = depth - lo_bits
    if lvl <= hi_lvls:
        coord = morton_decode(hk)
    else:
        coord = (morton_decode(hk) << (lvl - hi_lvls)) + morton_decode(lk)
    cell_len = root_len / (1 << lvl)
    return corner + (coord.astype(root_len.dtype) + 0.5) * cell_len


def sort_by_keys2(hi, lo):
    """Permutation sorting by (hi, lo) lexicographically."""
    n = hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, order = jax.lax.sort((hi, lo, idx), num_keys=2)
    return order

"""Morton (Z-order) keys for octree construction.

The reference orders particles along a Peano-Hilbert curve (peano.c:356) to
make tree nodes contiguous array ranges.  Any space-filling octree curve has
that contiguity property; Morton keys keep the key<->cell math to a few bit
tricks that vectorize on the VPU, so the TPU rebuild uses Morton order for the
tree itself.  (Hilbert ordering only changes sibling *ordering*, not the cell
hierarchy — the tree built over Morton-sorted particles is identical.)

Keys are 3*depth bits in int32; depth <= 10.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_DEPTH = 10


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
    """[N,3] int cell coords (< 2^depth) -> [N] int32 Morton keys."""
    cell = cell.astype(jnp.int32)
    return (_part1by2(cell[..., 0])
            | (_part1by2(cell[..., 1]) << 1)
            | (_part1by2(cell[..., 2]) << 2))


def morton_decode(key: jnp.ndarray) -> jnp.ndarray:
    """[N] int32 keys -> [N,3] int cell coords."""
    return jnp.stack([_compact1by2(key),
                      _compact1by2(key >> 1),
                      _compact1by2(key >> 2)], axis=-1)


def cell_coords(pos, corner, inv_len, depth: int):
    """Continuous positions -> integer cell coords at `depth` levels."""
    n_cells = 1 << depth
    f = (pos - corner) * inv_len  # in [0,1)
    c = jnp.floor(f * n_cells).astype(jnp.int32)
    return jnp.clip(c, 0, n_cells - 1)


def morton_keys(pos, corner, inv_len, depth: int) -> jnp.ndarray:
    return morton_encode(cell_coords(pos, corner, inv_len, depth))

"""Direct O(N^2) multi-gravity summation.

TPU-native equivalent of the reference's direct summation force test
(`force_treeevaluate_direct`, forcetree.c:3428-3548) — but here it is also a
first-class production solver for small N: on TPU a tiled pairwise sweep at
60k particles costs tens of milliseconds, making it both the permanent
accuracy oracle (FORCETEST, gravtree_forcetest.c:28) and the simplest engine.

Design notes (TPU-first):
  * Targets are processed in chunks of `chunk` rows; each chunk evaluates all
    N sources at once as a [chunk, N] tile of elementwise VPU work.
  * The accumulation `acc_t = sum_s fac_ts (x_s - x_t)` is rewritten as
    `fac @ pos_src - rowsum(fac) * pos_tgt`, putting the reduction on the MXU.
  * The N_GRAVS x N_GRAVS law matrix is evaluated one pass per *unique* law
    with a pair mask (wiring.unique_laws), so all-Newton wiring costs a
    single unmasked pass — mirroring the per-node N_GRAVS loop of
    forcetree.c:1553-1583 without function-pointer dispatch.
  * Self-pairs are excluded by global-index comparison; padded target rows
    carry index -1 and are dropped by the caller.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wiring import GravityWiring


def _min_image(dx, box):
    return dx - box * jnp.round(dx / box)


def _pair_fac(wiring: GravityWiring, tm, sm, gt, gs, r2, r, h, nsrc, want_pot):
    """Evaluate the wiring's force (and optionally potential) factor over a
    [C, N] tile, one vectorized pass per unique law."""
    pair_idx = jnp.asarray(wiring.pair_index_matrix())  # [NG, NG]
    groups = wiring.unique_laws()
    pair_of = pair_idx[gt[:, None], gs[None, :]] if len(groups) > 1 else None
    fac = jnp.zeros_like(r)
    pot = jnp.zeros_like(r) if want_pot else None
    for k, (law, _) in enumerate(groups):
        f_k = law.force_factor(tm, sm, r2, r, h, nsrc)
        if pair_of is None:
            fac = f_k
        else:
            fac = jnp.where(pair_of == k, f_k, fac)
        if want_pot:
            p_k = law.potential_factor(tm, sm, r2, r, h, nsrc)
            pot = p_k if pair_of is None else jnp.where(pair_of == k, p_k, pot)
    return fac, pot


def direct_forces(
    wiring: GravityWiring,
    pos: jnp.ndarray,        # [N,3] source (and default target) positions
    mass: jnp.ndarray,       # [N]
    grav: jnp.ndarray,       # [N] int32 gravity index
    fsoft: jnp.ndarray,      # [N] force softening h (=2.8*plummer softening)
    tgt_idx: Optional[jnp.ndarray] = None,  # [Nt] int32 global indices of
                             # targets (may be padded with -1); None = all
    box: float = 0.0,        # >0 enables periodic minimum-image wrap
    chunk: int = 1024,
    want_pot: bool = True,
):
    """Returns (acc [Nt,3], pot [Nt]) with G=1 (caller multiplies by G, as in
    gravtree.c:337-341).  Potential uses the reference's positive-source/r
    convention; padding rows (tgt_idx == -1) return zeros."""
    n = pos.shape[0]
    if tgt_idx is None:
        tgt_idx = jnp.arange(n, dtype=jnp.int32)
    nt = tgt_idx.shape[0]
    pad = (-nt) % chunk
    tgt_idx = jnp.concatenate([tgt_idx, jnp.full((pad,), -1, jnp.int32)]) if pad else tgt_idx
    n_chunks = tgt_idx.shape[0] // chunk
    tgt_idx = tgt_idx.reshape(n_chunks, chunk)

    src_gidx = jnp.arange(n, dtype=jnp.int32)

    def do_chunk(idx):  # idx: [chunk] int32, -1 = padding
        safe = jnp.maximum(idx, 0)
        pt = pos[safe]                      # [C,3]
        tm = mass[safe][:, None]            # [C,1]
        gt = grav[safe]
        ht = fsoft[safe]

        dx = pos[None, :, :] - pt[:, None, :]     # [C,N,3]
        if box > 0:
            dx = _min_image(dx, box)
        r2 = jnp.sum(dx * dx, axis=-1)            # [C,N]
        r = jnp.sqrt(r2)
        h = jnp.maximum(ht[:, None], fsoft[None, :])
        valid = (idx[:, None] >= 0) & (idx[:, None] != src_gidx[None, :])

        fac, pot = _pair_fac(wiring, tm, mass[None, :], gt, grav, r2, r, h,
                             jnp.ones_like(r), want_pot)
        fac = jnp.where(valid, fac, 0.0)
        # MXU accumulation: sum_s fac*(x_s - x_t)
        if box > 0:
            # wrapped dx is not expressible as x_s - x_t; reduce directly
            acc = jnp.einsum("cn,cnd->cd", fac, dx,
                             preferred_element_type=jnp.float32)
        else:
            acc = (jnp.dot(fac, pos, preferred_element_type=jnp.float32)
                   - jnp.sum(fac, axis=1, keepdims=True) * pt)
        if want_pot:
            pot = jnp.sum(jnp.where(valid, pot, 0.0), axis=1)
        else:
            pot = jnp.zeros((idx.shape[0],), pos.dtype)
        return acc, pot

    acc, pot = jax.lax.map(do_chunk, tgt_idx)
    acc = acc.reshape(-1, 3)[:nt]
    pot = pot.reshape(-1)[:nt]
    return acc, pot


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7))
def direct_forces_jit(wiring, pos, mass, grav, fsoft, box=0.0, chunk=1024,
                      want_pot=True, tgt_idx=None):
    return direct_forces(wiring, pos, mass, grav, fsoft, tgt_idx=tgt_idx,
                         box=box, chunk=chunk, want_pot=want_pot)


def direct_forces_numpy(wiring: GravityWiring, pos, mass, grav, fsoft,
                        box: float = 0.0):
    """Float64 numpy oracle (no jit, no tiling) for small-N verification.

    Evaluates the same law objects through jnp on float64 inputs if x64 is
    enabled, else computes in float32; intended for test use at N <= few
    thousand."""
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    mass = np.asarray(mass, np.float64)
    grav = np.asarray(grav)
    fsoft = np.asarray(fsoft, np.float64)
    acc = np.zeros((n, 3))
    pot = np.zeros(n)
    pair_idx = wiring.pair_index_matrix()
    groups = wiring.unique_laws()
    for i in range(n):
        dx = pos - pos[i]
        if box > 0:
            dx -= box * np.round(dx / box)
        r2 = (dx * dx).sum(1)
        r = np.sqrt(r2)
        h = np.maximum(fsoft[i], fsoft)
        valid = np.arange(n) != i
        fac = np.zeros(n)
        pfac = np.zeros(n)
        for k, (law, _) in enumerate(groups):
            m = valid & (pair_idx[grav[i], grav] == k)
            if not m.any():
                continue
            f = np.asarray(law.force_factor(mass[i], mass[m], r2[m], r[m], h[m], 1.0))
            p = np.asarray(law.potential_factor(mass[i], mass[m], r2[m], r[m], h[m], 1.0))
            fac[m] = f
            pfac[m] = p
        acc[i] = (fac[:, None] * dx).sum(0)
        pot[i] = pfac.sum()
    return acc, pot

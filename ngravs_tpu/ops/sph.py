"""SPH: density + smoothing-length iteration and entropy-formulation
hydrodynamic forces.

Rebuild of the reference's `density.c` and `hydra.c` as vectorized block
evaluations over octree-gathered neighbor candidates:

 * **Neighbor gathering** replaces the `ngb.c` range searches: gas targets
   are processed in Morton-contiguous blocks; a frontier walk over the
   octree keeps every node whose cell lies within the block's search radius
   (plus the node's own hmax for the symmetric "pairs" search,
   ngb_treefind_pairs, ngb.c:64-177) and dumps terminal nodes' particles
   into a per-block candidate list — the TPU analog of Ngblist chunks.

 * **Density** (`density_evaluate`, density.c:467-599): cubic-spline W/dW
   sums over the candidates masked by r < h_i, giving rho, weighted
   neighbor number, dhsml factor, div v and curl v.

 * **Smoothing-length iteration** (density.c:289-426): the Newton step with
   Left/Right bisection safeguards runs as a masked vectorized update; the
   host loops sweeps until every active gas particle's weighted neighbor
   count is within DesNumNgb +- MaxNumNgbDeviation.

 * **Hydro force** (`hydro_evaluate`, hydra.c:353-555): symmetric
   pressure + Monaghan-Balsara viscosity pair force with the Balsara
   switch, viscosity limiter, and signal-velocity tracking.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (KERNEL_COEFF_1, KERNEL_COEFF_2, KERNEL_COEFF_3,
                         KERNEL_COEFF_4, KERNEL_COEFF_5, KERNEL_COEFF_6)
from .tree import Octree, _compact_rows

NORM_COEFF = 4.0 / 3 * math.pi   # allvars.h NORM_COEFF (volume of unit ball)
NUMDIMS = 3
MAXITER = 150                    # allvars.h:97


class Kernel(NamedTuple):
    """SPH kernel normalization (allvars.h:107-125): 3D by default;
    TWODIMS uses the 2D-normalized coefficients (x 5/7), NORM_COEFF = pi,
    and divides by the z column thickness (density.c:492-496)."""
    c1: float = KERNEL_COEFF_1
    c2: float = KERNEL_COEFF_2
    c3: float = KERNEL_COEFF_3
    c4: float = KERNEL_COEFF_4
    c5: float = KERNEL_COEFF_5
    c6: float = KERNEL_COEFF_6
    norm: float = NORM_COEFF
    ndims: int = 3
    zfac: float = 1.0            # 1/boxSize_Z under TWODIMS

    @staticmethod
    def twodims(box_z: float) -> "Kernel":
        f = 5.0 / 7
        return Kernel(c1=f * KERNEL_COEFF_1, c2=f * KERNEL_COEFF_2,
                      c3=f * KERNEL_COEFF_3, c4=f * KERNEL_COEFF_4,
                      c5=f * KERNEL_COEFF_5, c6=f * KERNEL_COEFF_6,
                      norm=math.pi, ndims=2,
                      zfac=1.0 / box_z if box_z > 0 else 1.0)


K3D = Kernel()


def _hinv_pow(hinv, k: Kernel):
    hinv3 = hinv * hinv * hinv if k.ndims == 3 else hinv * hinv * k.zfac
    return hinv3, hinv3 * hinv


def kernel_wk_dwk(u, hinv, k: Kernel = K3D):
    """Gadget's cubic spline W and dW at u = r/h (density.c:541-550)."""
    hinv3, hinv4 = _hinv_pow(hinv, k)
    lo_wk = hinv3 * (k.c1 + k.c2 * (u - 1) * u * u)
    lo_dwk = hinv4 * u * (k.c3 * u - k.c4)
    omu = 1.0 - u
    hi_wk = hinv3 * k.c5 * omu * omu * omu
    hi_dwk = hinv4 * k.c6 * omu * omu
    wk = jnp.where(u < 0.5, lo_wk, hi_wk)
    dwk = jnp.where(u < 0.5, lo_dwk, hi_dwk)
    inside = u < 1.0
    return jnp.where(inside, wk, 0.0), jnp.where(inside, dwk, 0.0)


def _box3(box):
    """Normalize a box spec to a per-axis tuple or None (non-periodic)."""
    if box is None:
        return None
    if isinstance(box, (int, float)):
        return (float(box),) * 3 if box > 0 else None
    t = tuple(float(b) for b in box)
    return t if any(b > 0 for b in t) else None


def _min_image(dxs, box):
    b = _box3(box)
    if b is None:
        return dxs
    return [d - b[i] * jnp.round(d / b[i]) if b[i] > 0 else d
            for i, d in enumerate(dxs)]


class SphCandidates(NamedTuple):
    cand: jnp.ndarray      # [nb, CAP] sorted-particle indices (-1 pad)
    n_cand: jnp.ndarray    # [nb]
    overflow: jnp.ndarray  # scalar bool
    max_cand: jnp.ndarray  # scalar int32


def make_sph_gather(depth: int, bucket: int, cand_cap: int = 4096,
                    frontier_cap: int = 2048, box_size=0.0,
                    group_size: int = 64, pairs: bool = False):
    """Jittable per-block neighbor-candidate gather over the octree.

    pairs=False: candidates within `radius` of the block bbox (gather mode,
    ngb_treefind_variable).  pairs=True: also open nodes whose own hmax
    reaches the block (scatter-aware, ngb_treefind_pairs).  `box_size` may
    be a scalar or a per-axis (bx, by, bz) tuple (LONG_X/Y/Z,
    ngb.c:22-49)."""
    box = _box3(box_size)
    periodic = box is not None

    def bbox_gap(point, lo_b, hi_b):
        g = jnp.maximum(lo_b - point, point - hi_b)
        if periodic:
            bv = jnp.asarray(box, point.dtype)
            gp = jnp.maximum(lo_b - point - bv, point + bv - hi_b)
            gm = jnp.maximum(lo_b - point + bv, point - bv - hi_b)
            g = jnp.minimum(g, jnp.minimum(gp, gm))
        return g

    @jax.jit
    def gather(tree: Octree, tgt_sorted: jnp.ndarray, radius: jnp.ndarray):
        """tgt_sorted: [nb, G] sorted gas indices (-1 pad); radius: [nb, G]
        per-target search radii (h_i).  Returns SphCandidates."""
        nb, G = tgt_sorted.shape
        safe = jnp.maximum(tgt_sorted, 0)
        tvalid = tgt_sorted >= 0
        tpos = tree.pos_s[safe]
        big = jnp.asarray(1e30, tpos.dtype)
        lo = jnp.min(jnp.where(tvalid[..., None], tpos, big), axis=1)
        hi = jnp.max(jnp.where(tvalid[..., None], tpos, -big), axis=1)
        rad = jnp.max(jnp.where(tvalid, radius, 0.0), axis=1)   # [nb]

        leaf_list = jnp.full((nb, cand_cap // max(bucket, 1)
                              + frontier_cap), -1, jnp.int32)
        n_leaves = jnp.zeros((nb,), jnp.int32)
        overflow = jnp.zeros((), bool)
        frontier = jnp.zeros((nb, 1), jnp.int32)

        from .tree import _append_rows
        for lvl in range(depth + 1):
            f = frontier.shape[1]
            nvalid = frontier >= 0
            nid = jnp.maximum(frontier, 0)
            center = tree.node_center[nid]
            terminal = tree.node_terminal[nid]
            cell_len = tree.root_len / (1 << lvl)
            gap = bbox_gap(center, lo[:, None, :], hi[:, None, :])  # [nb,f,3]
            reach = rad[:, None, None] + 0.5 * cell_len             # [nb,1,1]
            if pairs:
                reach = reach + tree.node_hmax[nid][..., None]      # [nb,f,1]
            near = jnp.all(gap <= reach, axis=-1) & nvalid
            leaf_here = near & terminal
            expand = near & ~terminal
            leaf_list, n_leaves = _append_rows(
                leaf_list, n_leaves, jnp.where(leaf_here, frontier, -1))
            if lvl < depth:
                c0 = tree.node_child0[nid]
                nc = tree.node_nchild[nid]
                j = jnp.arange(8, dtype=jnp.int32)
                cand_f = c0[..., None] + j
                cvalid = expand[..., None] & (j < nc[..., None])
                nxt = min(8 ** (lvl + 1), frontier_cap)
                frontier, fcount = _compact_rows(
                    cand_f.reshape(nb, f * 8), cvalid.reshape(nb, f * 8), nxt)
                overflow = overflow | jnp.any(fcount > nxt)
        overflow = overflow | jnp.any(n_leaves > leaf_list.shape[1])

        # expand leaves into particle candidates (gas only)
        llv = leaf_list >= 0
        lls = jnp.maximum(leaf_list, 0)
        lstart = tree.node_start[lls]
        lcount = jnp.where(llv, tree.node_pcount[lls], 0)
        jj = jnp.arange(bucket, dtype=jnp.int32)
        pidx = lstart[..., None] + jj
        pvalid = llv[..., None] & (jj < lcount[..., None])
        # gas particles have hsml > 0 in the tree's sorted arrays
        pvalid = pvalid & (tree.hsml_s[jnp.minimum(
            pidx, tree.hsml_s.shape[0] - 1)] > 0)
        pidx = jnp.where(pvalid, pidx, -1).reshape(nb, -1)
        cand, n_cand = _compact_rows(pidx, pidx >= 0, cand_cap)
        overflow = overflow | jnp.any(n_cand > cand_cap)
        return SphCandidates(cand, n_cand, overflow, jnp.max(n_cand))

    return gather


@functools.partial(jax.jit, static_argnames=("box_size", "kernel"))
def density_pass(tree: Octree, tgt_sorted, hsml, vel_pred_t, cands,
                 vel_pred_all, box_size=0.0, kernel: Kernel = K3D):
    """Density sums for gas targets (density_evaluate, density.c:467-599).

    tgt_sorted [nb,G] sorted indices; hsml [nb,G]; vel_pred_t [nb,G,3];
    cands [nb,S] sorted candidate indices; vel_pred_all [N,3] in SORTED
    order.  Returns (rho, wngb, dhsml, divv, rotv[3]) each [nb,G]."""
    safe_t = jnp.maximum(tgt_sorted, 0)
    tpos = tree.pos_s[safe_t]                       # [nb,G,3]
    sv = jnp.maximum(cands.cand, 0)
    cvalid = cands.cand >= 0
    spos = tree.pos_s[sv]                           # [nb,S,3]
    smass = jnp.where(cvalid, tree.mass_s[sv], 0.0)
    svel = vel_pred_all[sv]                         # [nb,S,3]

    dxs = [tpos[:, :, None, d] - spos[:, None, :, d] for d in range(3)]
    dxs = _min_image(dxs, box_size)
    r2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2    # [nb,G,S]
    r = jnp.sqrt(r2)
    hinv = 1.0 / jnp.maximum(hsml, 1e-30)
    u = r * hinv[:, :, None]
    wk, dwk = kernel_wk_dwk(u, hinv[:, :, None], kernel)
    inside = (u < 1.0) & cvalid[:, None, :] & (tgt_sorted >= 0)[:, :, None]
    wk = jnp.where(inside, wk, 0.0)
    dwk = jnp.where(inside, dwk, 0.0)

    m = smass[:, None, :]
    rho = jnp.sum(m * wk, axis=-1)
    hinv3_t, _ = _hinv_pow(hinv, kernel)    # weighted ngb = norm*wk/hinv3
    wngb = kernel.norm * jnp.sum(wk, axis=-1) / jnp.maximum(hinv3_t, 1e-37)
    dhsml = jnp.sum(-m * (kernel.ndims * hinv[:, :, None] * wk + u * dwk),
                    axis=-1)
    fac = jnp.where(r > 0, m * dwk / jnp.maximum(r, 1e-30), 0.0)
    dvs = [vel_pred_t[:, :, None, d] - svel[:, None, :, d] for d in range(3)]
    vdotr = dxs[0] * dvs[0] + dxs[1] * dvs[1] + dxs[2] * dvs[2]
    divv = -jnp.sum(fac * vdotr, axis=-1)
    rotv = jnp.stack([
        jnp.sum(fac * (dxs[2] * dvs[1] - dxs[1] * dvs[2]), axis=-1),
        jnp.sum(fac * (dxs[0] * dvs[2] - dxs[2] * dvs[0]), axis=-1),
        jnp.sum(fac * (dxs[1] * dvs[0] - dxs[0] * dvs[1]), axis=-1)],
        axis=-1)
    return rho, wngb, dhsml, divv, rotv


@functools.partial(jax.jit, static_argnames=("ndims",))
def hsml_update(hsml, left, right, wngb, dhsml, rho, des_ngb, max_dev,
                min_hsml, active, ndims: int = 3):
    """One Newton/bisection smoothing-length update (density.c:289-426).

    Returns (hsml', left', right', converged)."""
    dhsml_fac = 1.0 / (1 + hsml * dhsml
                       / (ndims * jnp.maximum(rho, 1e-37)))
    low = wngb < des_ngb - max_dev      # too few neighbors -> grow
    high = wngb > des_ngb + max_dev     # too many -> shrink
    # window-collapse guard (density.c:321-328); a particle pinned at the
    # minimum smoothing length with too few neighbors also stops
    # (density.c:312-328)
    stuck = (left > 0) & (right > 0) & ((right - left) < 1e-3 * left)
    # too many neighbors at the minimum smoothing length cannot shrink:
    # stop (the || clause of density.c:326-328)
    bad = (low | (high & (hsml > 1.01 * min_hsml))) & ~stuck & active

    new_left = jnp.where(bad & low, jnp.maximum(hsml, left), left)
    new_right = jnp.where(bad & high,
                          jnp.where(right > 0, jnp.minimum(hsml, right),
                                    hsml), right)

    # bisection when bracketed, else Newton-ish step (density.c:65-95)
    both = (new_left > 0) & (new_right > 0)
    h_bis = (0.5 * (new_left ** 3 + new_right ** 3)) ** (1.0 / 3)
    safe_newton = (jnp.abs(wngb - des_ngb) < 0.5 * des_ngb) & \
        (jnp.abs(dhsml_fac) <= 2.0)  # guard wild derivative
    h_newt = hsml * (1 - (wngb - des_ngb)
                     / (ndims * jnp.maximum(wngb, 1e-30)) * dhsml_fac)
    h_grow = jnp.where(safe_newton & (new_right == 0), h_newt, hsml * 1.26)
    h_shrink = jnp.where(safe_newton & (new_left == 0), h_newt, hsml / 1.26)
    h_new = jnp.where(both, h_bis,
                      jnp.where(new_right == 0, h_grow, h_shrink))
    h_new = jnp.maximum(h_new, min_hsml)
    hsml = jnp.where(bad, h_new, hsml)
    return hsml, new_left, new_right, ~bad


@functools.partial(jax.jit,
                   static_argnames=("box_size", "use_limiter", "kernel"))
def hydro_pass(tree: Octree, tgt_sorted, cands,
               hsml_all, rho_all, pres_all, f_all, vel_all, csnd_all,
               divv_all, curl_all, dt_all, tgt_gid_orig,
               fac_mu, fac_vsic_fix, hubble_a2, visc_const,
               box_size=0.0, use_limiter: bool = True,
               kernel: Kernel = K3D):
    """Hydro pair force (hydro_evaluate, hydra.c:353-555).

    All *_all arrays are in SORTED particle order (gathered by candidate
    index); per-target values are looked up through tgt_sorted.  Returns
    (acc [nb,G,3], dt_entropy [nb,G], max_signal_vel [nb,G])."""
    nb, G = tgt_sorted.shape
    safe_t = jnp.maximum(tgt_sorted, 0)
    tvalid = tgt_sorted >= 0
    tpos = tree.pos_s[safe_t]
    h_i = hsml_all[safe_t]
    rho_i = rho_all[safe_t]
    p_over_rho2_i = pres_all[safe_t] / jnp.maximum(rho_i, 1e-37) ** 2 \
        * f_all[safe_t]
    cs_i = csnd_all[safe_t]
    vel_i = vel_all[safe_t]
    # Balsara switch f1 (hydra.c:380-382)
    f1 = jnp.abs(divv_all[safe_t]) / (
        jnp.abs(divv_all[safe_t]) + curl_all[safe_t]
        + 0.0001 * cs_i / fac_mu / jnp.maximum(h_i, 1e-30))
    dt_i = dt_all[safe_t]

    sv = jnp.maximum(cands.cand, 0)
    cvalid = cands.cand >= 0
    spos = tree.pos_s[sv]
    smass = tree.mass_s[sv]
    h_j = hsml_all[sv]
    rho_j = rho_all[sv]
    p_over_rho2_j = pres_all[sv] / jnp.maximum(rho_j, 1e-37) ** 2
    cs_j = csnd_all[sv]
    vel_j = vel_all[sv]
    f2 = jnp.abs(divv_all[sv]) / (
        jnp.abs(divv_all[sv]) + curl_all[sv]
        + 0.0001 * cs_j / fac_mu / jnp.maximum(h_j, 1e-30))
    dt_j = dt_all[sv]

    dxs = [tpos[:, :, None, d] - spos[:, None, :, d] for d in range(3)]
    dxs = _min_image(dxs, box_size)
    r2 = dxs[0] ** 2 + dxs[1] ** 2 + dxs[2] ** 2
    r = jnp.sqrt(r2)
    notself = sv[:, None, :] != safe_t[:, :, None]
    pairmask = ((r2 < h_i[:, :, None] ** 2) | (r2 < h_j[:, None, :] ** 2)) \
        & cvalid[:, None, :] & tvalid[:, :, None] & notself

    dvs = [vel_i[:, :, None, d] - vel_j[:, None, :, d] for d in range(3)]
    vdotr = dxs[0] * dvs[0] + dxs[1] * dvs[1] + dxs[2] * dvs[2]
    vdotr2 = vdotr + hubble_a2 * r2

    hinv_i = 1.0 / jnp.maximum(h_i, 1e-30)
    u_i = r * hinv_i[:, :, None]
    _, dwk_i = kernel_wk_dwk(u_i, hinv_i[:, :, None], kernel)
    dwk_i = jnp.where(r2 < h_i[:, :, None] ** 2, dwk_i, 0.0)
    hinv_j = 1.0 / jnp.maximum(h_j, 1e-30)
    u_j = r * hinv_j[:, None, :]
    _, dwk_j = kernel_wk_dwk(u_j, hinv_j[:, None, :], kernel)
    dwk_j = jnp.where(r2 < h_j[:, None, :] ** 2, dwk_j, 0.0)

    cs_sum = cs_i[:, :, None] + cs_j[:, None, :]
    mu_ij = fac_mu * vdotr2 / jnp.maximum(r, 1e-30)       # negative
    vsig = cs_sum - 3 * mu_ij
    approaching = (vdotr2 < 0) & pairmask
    max_signal = jnp.max(jnp.where(pairmask, cs_sum, 0.0), axis=-1)
    max_signal = jnp.maximum(
        max_signal, jnp.max(jnp.where(approaching, vsig, 0.0), axis=-1))

    rho_ij = 0.5 * (rho_i[:, :, None] + rho_j[:, None, :])
    visc = 0.25 * visc_const * vsig * (-mu_ij) / jnp.maximum(rho_ij, 1e-37) \
        * (f1[:, :, None] + f2[:, None, :])
    dwk_sum = dwk_i + dwk_j
    if use_limiter:
        # viscosity limiter (hydra.c:513-519); dropped under
        # NOVISCOSITYLIMITER (hydra.c:511)
        dt_pair = jnp.maximum(dt_i[:, :, None], dt_j[:, None, :])
        lim_ok = (dt_pair > 0) & (dwk_sum < 0)
        m_sum = 0.5 * (tree.mass_s[safe_t][:, :, None] + smass[:, None, :])
        limiter = 0.5 * fac_vsic_fix * vdotr2 / (
            m_sum * jnp.where(lim_ok, dwk_sum, -1.0)
            * jnp.maximum(r, 1e-30) * jnp.where(dt_pair > 0, dt_pair, 1.0))
        visc = jnp.where(lim_ok, jnp.minimum(visc, limiter), visc)
    visc = jnp.where(approaching, visc, 0.0)

    hfc_visc = 0.5 * smass[:, None, :] * visc * dwk_sum \
        / jnp.maximum(r, 1e-30)
    hfc = hfc_visc + smass[:, None, :] * (
        p_over_rho2_i[:, :, None] * dwk_i
        + (p_over_rho2_j * f_all[sv])[:, None, :] * dwk_j) \
        / jnp.maximum(r, 1e-30)
    hfc = jnp.where(pairmask, hfc, 0.0)
    hfc_visc = jnp.where(pairmask, hfc_visc, 0.0)

    acc = jnp.stack([-jnp.sum(hfc * dxs[d], axis=-1) for d in range(3)],
                    axis=-1)
    dt_entropy = jnp.sum(0.5 * hfc_visc * vdotr2, axis=-1)
    return acc, dt_entropy, max_signal


# ---------------------------------------------------------------------------
# Orchestration (density() + hydro_force() drivers, density.c:56 / hydra.c:50)
# ---------------------------------------------------------------------------

def _bucket(n: int, minimum: int = 64) -> int:
    import math as _m
    return max(minimum, 1 << _m.ceil(_m.log2(max(n, 1))))


class HydroSolver:
    """Host-side driver for the SPH passes over the shared octree."""

    def __init__(self, cfg, units):
        self.cfg = cfg
        self.units = units
        self.min_gas_hsml = cfg.min_gas_hsml_fractional * \
            cfg.softening[0] * 2.8  # MinGasHsml (gravtree.c:517)
        self.group = cfg.tree_group_size // 4 or 64
        self.cand_cap = 4096
        self._gathers = {}
        # TWODIMS: 2D-normalized kernel, column density / boxSize_Z
        # (allvars.h:117-125, density.c:492-496)
        self.kernel = Kernel.twodims(cfg.box_sizes[2]) if cfg.twodims \
            else K3D

    def _gather(self, depth: int, pairs: bool):
        key = (depth, pairs, self.cand_cap)
        if key not in self._gathers:
            box = self.cfg.box_sizes
            self._gathers[key] = make_sph_gather(
                depth=depth, bucket=self.cfg.tree_bucket_size,
                cand_cap=self.cand_cap, box_size=box,
                group_size=self.group, pairs=pairs)
        return self._gathers[key]

    def _blocks(self, tree: Octree, p, ti_current, n_gas_active_max):
        """Active-gas targets in sorted order, blocked [nb, G]."""
        mask_s = (p.ti_endstep == ti_current)[tree.order] \
            & (tree.hsml_s > 0)
        size = _bucket(n_gas_active_max, self.group)
        tgt = jnp.nonzero(mask_s, size=size, fill_value=-1)[0] \
            .astype(jnp.int32)
        pad = (-tgt.shape[0]) % self.group
        if pad:
            tgt = jnp.concatenate([tgt, jnp.full((pad,), -1, jnp.int32)])
        return tgt.reshape(-1, self.group)

    # ------------------------------------------------------------------
    def density(self, tree: Octree, p, sph, ti_current, n_active, depth,
                tbi: float):
        """Smoothing-length iteration + density sums for active gas.

        Returns the updated SphState (hsml, density, divvel, curlvel,
        dhsml factor, num_ngb, pressure)."""
        cfg = self.cfg
        box = cfg.box_sizes
        tgt = self._blocks(tree, p, ti_current, n_active)
        nb, G = tgt.shape
        order = tree.order
        safe = jnp.maximum(tgt, 0)
        orig = jnp.where(tgt >= 0, order[safe], p.n)   # scatter drop index

        hsml = sph.hsml[order][safe] * jnp.where(tgt >= 0, 1.0, 0.0)
        vel_pred_all = sph.vel_pred[order]
        vpt = vel_pred_all[safe]
        left = jnp.zeros_like(hsml)
        right = jnp.zeros_like(hsml)
        active = tgt >= 0
        rho = wngb = dhsml = divv = None
        rotv = None

        for it in range(MAXITER):
            gather = self._gather(depth, False)
            cands = gather(tree, tgt, hsml)
            if bool(cands.overflow):
                self.cand_cap = max(self.cand_cap * 2,
                                    _bucket(int(cands.max_cand) * 5 // 4))
                continue
            rho, wngb, dhsml, divv, rotv = density_pass(
                tree, tgt, hsml, vpt, cands, vel_pred_all, box_size=box,
                kernel=self.kernel)
            new_hsml, left, right, conv = hsml_update(
                hsml, left, right, wngb, dhsml, rho,
                float(cfg.des_num_ngb), float(cfg.max_num_ngb_deviation),
                self.min_gas_hsml, active, ndims=self.kernel.ndims)
            done = bool(jnp.all(conv | ~active))
            hsml = new_hsml
            if done:
                break

        # finalize (density.c:289-308)
        dhsml_fac = 1.0 / (1 + hsml * dhsml
                           / (self.kernel.ndims * jnp.maximum(rho, 1e-37)))
        curl = jnp.sqrt(jnp.sum(rotv ** 2, axis=-1)) \
            / jnp.maximum(rho, 1e-37)
        divv = divv / jnp.maximum(rho, 1e-37)
        ti_beg = p.ti_begstep[orig.clip(0, p.n - 1)]
        ti_end = p.ti_endstep[orig.clip(0, p.n - 1)]
        dt_entr = (ti_current - (ti_beg + ti_end) // 2).astype(jnp.float32) \
            * tbi
        ent = sph.entropy[orig.clip(0, p.n - 1)]
        dent = sph.dt_entropy[orig.clip(0, p.n - 1)]
        pressure = (ent + dent * dt_entr) \
            * jnp.maximum(rho, 1e-37) ** cfg.gamma

        def scat(dst, val):
            return dst.at[orig.reshape(-1)].set(val.reshape(-1), mode="drop")

        sph = sph.replace(
            hsml=scat(sph.hsml, hsml), density=scat(sph.density, rho),
            div_vel=scat(sph.div_vel, divv),
            curl_vel=scat(sph.curl_vel, curl),
            dhsml_density_factor=scat(sph.dhsml_density_factor, dhsml_fac),
            num_ngb=scat(sph.num_ngb, wngb),
            pressure=scat(sph.pressure, pressure))
        return sph

    # ------------------------------------------------------------------
    def hydro(self, tree: Octree, p, sph, ti_current, n_active, depth,
              tbi: float, time_now: float):
        """Hydro force pass for active gas (hydro_force, hydra.c:50)."""
        cfg, units = self.cfg, self.units
        box = cfg.box_sizes
        gm1 = cfg.gamma_minus1
        if cfg.comoving_integration:
            a = time_now
            h2 = (cfg.omega0 / a ** 3
                  + (1 - cfg.omega0 - cfg.omega_lambda) / a ** 2
                  + cfg.omega_lambda)
            hubble_a = units.hubble * math.sqrt(h2)
            hubble_a2 = a * a * hubble_a
            fac_mu = a ** (3 * gm1 / 2) / a
            fac_vsic_fix = hubble_a * a ** (3 * gm1)
        else:
            hubble_a2 = fac_mu = fac_vsic_fix = 1.0

        tgt = self._blocks(tree, p, ti_current, n_active)
        order = tree.order
        safe = jnp.maximum(tgt, 0)
        orig = jnp.where(tgt >= 0, order[safe], p.n)

        # per-particle fields in sorted order (gas only meaningful)
        hsml_all = sph.hsml[order]
        rho_all = jnp.maximum(sph.density[order], 1e-37)
        pres_all = sph.pressure[order]
        f_all = sph.dhsml_density_factor[order]
        vel_all = sph.vel_pred[order]
        csnd_all = jnp.sqrt(cfg.gamma * pres_all / rho_all)
        divv_all = sph.div_vel[order]
        curl_all = sph.curl_vel[order]
        dt_all = (p.ti_endstep[order] - p.ti_begstep[order]) \
            .astype(jnp.float32) * tbi

        for _ in range(4):
            gather = self._gather(depth, True)
            cands = gather(tree, tgt, hsml_all[safe])
            if not bool(cands.overflow):
                break
            self.cand_cap = max(self.cand_cap * 2,
                                _bucket(int(cands.max_cand) * 5 // 4))
        acc, dtent, maxsig = hydro_pass(
            tree, tgt, cands, hsml_all, rho_all, pres_all, f_all, vel_all,
            csnd_all, divv_all, curl_all, dt_all, orig,
            fac_mu, fac_vsic_fix, hubble_a2, cfg.art_bulk_visc_const,
            box_size=box, use_limiter=not cfg.no_viscosity_limiter,
            kernel=self.kernel)
        # finalize (hydra.c:317-320)
        rho_t = rho_all[safe]
        # under IsothermEqs gamma-1 = 0: DtEntropy stays 0 and the
        # entropy variable (= u = c_s^2) never changes (hydra.c:317-320)
        # finalize with the COMOVING density, no fac_egy — the reference
        # computes fac_egy but never uses it (hydra.c:89 is dead;
        # hydra.c:319: DtEntropy *= GAMMA_MINUS1/(hubble_a2 * rho^gm1))
        dtent = dtent * gm1 / (hubble_a2 * rho_t ** gm1)

        if cfg.sph_bnd_particles:
            # SPH_BND_PARTICLES (hydra.c:321-328): ID == 0 marks fixed
            # wall particles; no hydro acceleration or entropy change
            bnd = p.pid[orig.clip(0, p.n - 1)] == 0
            acc = jnp.where(bnd[..., None], 0.0, acc)
            dtent = jnp.where(bnd, 0.0, dtent)

        flat = orig.reshape(-1)
        sph = sph.replace(
            hydro_accel=sph.hydro_accel.at[flat].set(
                acc.reshape(-1, 3), mode="drop"),
            dt_entropy=sph.dt_entropy.at[flat].set(
                dtent.reshape(-1), mode="drop"),
            max_signal_vel=sph.max_signal_vel.at[flat].set(
                maxsig.reshape(-1), mode="drop"))
        return sph

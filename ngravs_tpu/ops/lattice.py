"""Periodic lattice (Ewald) correction tables.

Rebuild of the reference's per-pair lattice machinery: table generation
(`lattice_init`, forcetree.c:3611-3800), the Newtonian Ewald sums
(`ewald_psi`/`ewald_force`, ngravs.c:761-826 and :1170-1232, the classic
Hernquist-Bouchet-Suto form with alpha=2 and n,h in [-4,4]^3) and the
screened-Yukawa sums (`yukawa_lattice_psi`/`yukawa_lattice_force`,
ngravs.c:954-1150, Salin & Caillol 2000 with alpha=5.64 and n,h in [-5,5]^3).

Tables are (EN+1)^3 grids over the octant x in [0, 0.5]^3 (box fractions) of
the force correction (full periodic lattice minus nearest image, with the
nearest-image term re-added, exactly as the reference tabulates) and the
potential correction.  Generation runs vectorized float64 numpy on host and
is cached on disk like the reference's `lattice_spc_table_<EN>_<name>.dat`.

Device-side lookup is trilinear interpolation with octant sign folding
(`lattice_corr`, forcetree.c:3803-3900).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc  # available via jax's scipy? fall back below

CACHE_DIR_ENV = "NGRAVS_TPU_TABLE_DIR"


def _cache_dir():
    return os.environ.get(CACHE_DIR_ENV,
                          os.path.expanduser("~/.cache/ngravs_tpu_tables"))


# ---------------------------------------------------------------------------
# Native (C++/OpenMP) table generator — the reference computes these tables
# MPI-parallel in C (forcetree.c:3662-3726); here a ctypes-loaded shared
# library (native/lattice_tables.cpp), built on demand, with the vectorized
# numpy implementation below as the fallback.
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_lib():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    import ctypes
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src_dir = os.path.join(here, "native")
    lib = os.path.join(src_dir, "liblattice_tables.so")
    if not os.path.exists(lib) and os.path.exists(
            os.path.join(src_dir, "Makefile")):
        try:
            subprocess.run(["make", "-C", src_dir], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(lib):
        _NATIVE = False
        return None
    try:
        dll = ctypes.CDLL(lib)
        dbl_p = ctypes.POINTER(ctypes.c_double)
        dll.ewald_newton_tables.argtypes = [ctypes.c_int, dbl_p, dbl_p]
        dll.yukawa_lattice_tables.argtypes = [ctypes.c_int, ctypes.c_double,
                                              dbl_p, dbl_p]
        _NATIVE = dll
        return dll
    except OSError:
        _NATIVE = False
        return None


def _native_tables(kind: str, en: int, ym: float = 0.0):
    """(force [M,3], psi [M]) via the native generator, or None."""
    dll = _native_lib()
    if dll is None:
        return None
    import ctypes
    m = (en + 1) ** 3
    force = np.zeros((m, 3))
    psi = np.zeros(m)
    fp = force.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    pp = psi.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    if kind == "newton":
        dll.ewald_newton_tables(en, fp, pp)
    elif kind == "yukawa":
        dll.yukawa_lattice_tables(en, ctypes.c_double(ym), fp, pp)
    else:
        return None
    return force, psi


# ---------------------------------------------------------------------------
# Ewald summation kernels (vectorized over a batch of octant points x [M,3])
# ---------------------------------------------------------------------------

def ewald_force_newton(x: np.ndarray) -> np.ndarray:
    """Newtonian lattice force correction at octant points x [M,3] (box
    fractions).  Matches ngravs.c:1170-1232: + x/r^3 minus real-space and
    k-space Ewald sums, alpha=2, ranges [-4,4]."""
    alpha = 2.0
    m = x.shape[0]
    force = np.zeros((m, 3))
    r2 = (x * x).sum(1)
    nz = r2 > 0
    force[nz] = x[nz] / (r2[nz] ** 1.5)[:, None]
    rng = np.arange(-4, 5)
    for n0 in rng:
        for n1 in rng:
            for n2 in rng:
                dx = x - np.array([n0, n1, n2])
                r = np.sqrt((dx * dx).sum(1))
                r = np.maximum(r, 1e-30)
                val = erfc(alpha * r) \
                    + 2 * alpha * r / math.sqrt(math.pi) \
                    * np.exp(-alpha * alpha * r * r)
                force -= dx * (val / r ** 3)[:, None]
    for h0 in rng:
        for h1 in rng:
            for h2 in rng:
                h2n = h0 * h0 + h1 * h1 + h2 * h2
                if h2n == 0:
                    continue
                hdotx = x[:, 0] * h0 + x[:, 1] * h1 + x[:, 2] * h2
                val = 2.0 / h2n * math.exp(
                    -math.pi ** 2 * h2n / alpha ** 2) \
                    * np.sin(2 * math.pi * hdotx)
                force -= np.outer(val, [h0, h1, h2])
    force[~nz] = 0.0
    return force


def ewald_psi_newton(x: np.ndarray) -> np.ndarray:
    """Newtonian lattice potential correction (ngravs.c:761-816)."""
    alpha = 2.0
    m = x.shape[0]
    sum1 = np.zeros(m)
    sum2 = np.zeros(m)
    rng = np.arange(-4, 5)
    for n0 in rng:
        for n1 in rng:
            for n2 in rng:
                dx = x - np.array([n0, n1, n2])
                r = np.maximum(np.sqrt((dx * dx).sum(1)), 1e-30)
                sum1 += erfc(alpha * r) / r
    for h0 in rng:
        for h1 in rng:
            for h2 in rng:
                h2n = h0 * h0 + h1 * h1 + h2 * h2
                if h2n == 0:
                    continue
                hdotx = x[:, 0] * h0 + x[:, 1] * h1 + x[:, 2] * h2
                sum2 += 1.0 / (math.pi * h2n) * math.exp(
                    -math.pi ** 2 * h2n / alpha ** 2) \
                    * np.cos(2 * math.pi * hdotx)
    r = np.maximum(np.sqrt((x * x).sum(1)), 1e-30)
    return math.pi / alpha ** 2 - sum1 - sum2 + 1.0 / r


def yukawa_lattice_force(x: np.ndarray, ym: float) -> np.ndarray:
    """Screened-Yukawa lattice force correction (ngravs.c:1019-1150,
    Salin & Caillol), alpha=5.64, ranges [-5,5].  `ym` is the dimensionless
    screening mass YUKAWA_IMASS (per box length)."""
    alpha = 5.64
    m = x.shape[0]
    force = np.zeros((m, 3))
    r2 = (x * x).sum(1)
    nz = r2 > 0
    r0 = np.sqrt(r2[nz])
    force[nz] = (np.exp(-r0 * ym) * (ym + 1.0 / r0) / r2[nz])[:, None] * x[nz]
    rng = np.arange(-5, 6)
    for n0 in rng:
        for n1 in rng:
            for n2 in rng:
                dx = x - np.array([n0, n1, n2])
                r = np.maximum(np.sqrt((dx * dx).sum(1)), 1e-30)
                ep = np.exp(ym * r) * erfc(alpha * r + ym / (2 * alpha))
                en = np.exp(-ym * r) * erfc(alpha * r - ym / (2 * alpha))
                val = 0.5 * (ep + en)
                force -= dx * (val / r ** 3)[:, None]
                val = 0.5 * ym * (-ep + en) \
                    + 2 * alpha / math.sqrt(math.pi) * np.exp(
                        -alpha * alpha * r * r - ym * ym / (4 * alpha * alpha))
                force -= dx * (val / r ** 2)[:, None]
    ymk = ym / (2 * math.pi)
    for h0 in rng:
        for h1 in rng:
            for h2 in rng:
                h2n = h0 * h0 + h1 * h1 + h2 * h2
                if h2n == 0:
                    continue
                hdotx = x[:, 0] * h0 + x[:, 1] * h1 + x[:, 2] * h2
                val = 2 * math.exp(
                    -math.pi ** 2 * (h2n + ymk * ymk) / alpha ** 2) \
                    * np.sin(2 * math.pi * hdotx) / (h2n + ymk * ymk)
                force -= np.outer(val, [h0, h1, h2])
    force[~nz] = 0.0
    return force


def yukawa_lattice_psi(x: np.ndarray, ym: float) -> np.ndarray:
    """Screened-Yukawa lattice potential correction (ngravs.c:954-1014)."""
    alpha = 5.64
    m = x.shape[0]
    sum1 = np.zeros(m)
    sum2 = np.zeros(m)
    rng = np.arange(-5, 6)
    for n0 in rng:
        for n1 in rng:
            for n2 in rng:
                dx = x - np.array([n0, n1, n2])
                r = np.maximum(np.sqrt((dx * dx).sum(1)), 1e-30)
                sum1 += erfc(alpha * r + ym / (2 * alpha)) \
                    * np.exp(ym * r) / (2 * r)
                sum1 += erfc(alpha * r - ym / (2 * alpha)) \
                    * np.exp(-ym * r) / (2 * r)
    for h0 in rng:
        for h1 in rng:
            for h2 in rng:
                h2n = h0 * h0 + h1 * h1 + h2 * h2
                if h2n == 0:
                    continue
                hdotx = x[:, 0] * h0 + x[:, 1] * h1 + x[:, 2] * h2
                sum2 += 1.0 / (math.pi * h2n
                               + ym * ym / (4 * math.pi)) * math.exp(
                    -math.pi ** 2 * h2n / alpha ** 2
                    - ym * ym / (4 * alpha * alpha)) \
                    * np.cos(2 * math.pi * hdotx)
    r = np.maximum(np.sqrt((x * x).sum(1)), 1e-30)
    return math.pi / alpha ** 2 - sum1 - sum2 + np.exp(-ym * r) / r


def yukawa_madelung(ym: float) -> float:
    """Yukawa Madelung constant — the reference leaves this unimplemented
    and returns 0 (ngravs.c:896-948); reproduced for behavior parity."""
    return 0.0


NEWTON_MADELUNG = 2.8372975  # classic cubic-lattice value used by Gadget-2


# ---------------------------------------------------------------------------
# Table generation and caching
# ---------------------------------------------------------------------------

def _octant_points(en: int) -> np.ndarray:
    ii = np.arange(en + 1)
    g = np.stack(np.meshgrid(ii, ii, ii, indexing="ij"), axis=-1)
    return 0.5 * g.reshape(-1, 3) / en


def lattice_tables_for(kind: str, en: int, params: dict | None = None,
                       cache: bool = True) -> np.ndarray:
    """Compute (or load) the raw octant tables for one lattice kind.

    Returns [EN+1, EN+1, EN+1, 4] float64: fx, fy, fz, psi — in box-fraction
    units (the caller rescales by 1/L^2 and 1/L like forcetree.c:3750-3764).

    kinds: "none", "newton", "yukawa" (params: ym), "coloyuk" (params: ym).
    """
    params = params or {}
    en1 = en + 1
    if kind == "none":
        return np.zeros((en1, en1, en1, 4))
    tag = kind if kind == "newton" else f"{kind}_{params['ym']:.6e}"
    path = os.path.join(_cache_dir(), f"lattice_spc_table_{en}_{tag}.npy")
    if cache and os.path.exists(path):
        return np.load(path)
    x = _octant_points(en)
    if kind == "newton":
        nat = _native_tables("newton", en)
        f, p = nat if nat else (ewald_force_newton(x), ewald_psi_newton(x))
        p[0] = NEWTON_MADELUNG
    elif kind == "yukawa":
        ym = float(params["ym"])
        nat = _native_tables("yukawa", en, ym)
        f, p = nat if nat else (yukawa_lattice_force(x, ym),
                                yukawa_lattice_psi(x, ym))
        p[0] = yukawa_madelung(ym)
    elif kind == "coloyuk":
        ym = float(params["ym"])
        natn = _native_tables("newton", en)
        fn, pn = natn if natn else (ewald_force_newton(x),
                                    ewald_psi_newton(x))
        naty = _native_tables("yukawa", en, ym)
        fy, py = naty if naty else (yukawa_lattice_force(x, ym),
                                    yukawa_lattice_psi(x, ym))
        f, p = fy + fn, py + pn
        p[0] = NEWTON_MADELUNG + yukawa_madelung(ym)
    else:
        raise ValueError(f"unknown lattice kind {kind!r}")
    out = np.concatenate([f, p[:, None]], axis=1).reshape(en1, en1, en1, 4)
    if cache:
        os.makedirs(_cache_dir(), exist_ok=True)
        np.save(path, out)
    return out


def build_lattice_tables(wiring, en: int, box_size: float):
    """Per-pair [NG, NG, EN+1, EN+1, EN+1, 4] f32 device table, rescaled to
    length units (force /L^2, potential /L; forcetree.c:3750-3764).

    Each ForceLaw must expose `lattice_kind()` -> (kind, params)."""
    ng = wiring.n_gravs
    en1 = en + 1
    tabs = np.zeros((ng, ng, en1, en1, en1, 4), np.float64)
    for tg in range(ng):
        for sg in range(ng):
            kind, params = wiring.law(tg, sg).lattice_kind()
            tabs[tg, sg] = lattice_tables_for(kind, en, params)
    tabs[..., :3] /= box_size * box_size
    tabs[..., 3] /= box_size
    # pairs flattened tg*NG+sg, as lattice_correction expects
    return jnp.asarray(tabs.reshape((ng * ng,) + tabs.shape[2:]), jnp.float32)


def lattice_correction(tables, fac_intp, dx, dy, dz, pair_idx):
    """Trilinear octant lookup (lattice_corr, forcetree.c:3803-3900).

    tables: [NPAIR, EN+1, EN+1, EN+1, 4] (pairs flattened tg*NG+sg)
    fac_intp: 2*EN/BoxSize
    dx,dy,dz: displacement SOURCE - TARGET in length units (min-imaged), any
              broadcastable shape; pair_idx: same shape, int32 tg*NG+sg.
    Returns (fcx, fcy, fcz, pot) with octant signs applied; the caller adds
    acc += mass * fc to the attraction-positive accumulation.

    Sign convention validated against brute-force image sums (Yukawa,
    converged): with d = source - target, sign_i = +1 if d_i < 0 else -1
    (identical to lattice_corr, forcetree.c:3803 — the reference's walk
    passes node - target displacements).
    """
    en = tables.shape[1] - 1
    npair = tables.shape[0]
    tflat = tables.reshape(npair * (en + 1) ** 3, 4)

    def fold(d):
        sign = jnp.where(d < 0, 1.0, -1.0)
        return jnp.abs(d), sign

    ax, sx = fold(dx)
    ay, sy = fold(dy)
    az, sz = fold(dz)

    def cell(a):
        u = a * fac_intp
        i = jnp.clip(u.astype(jnp.int32), 0, en - 1)
        return i, u - i

    i, u = cell(ax)
    j, v = cell(ay)
    k, w = cell(az)

    base = pair_idx * (en + 1) ** 3
    idx = base + (i * (en + 1) + j) * (en + 1) + k

    def corner(di, dj, dk):
        return tflat[idx + (di * (en + 1) + dj) * (en + 1) + dk]

    f = ((1 - u) * (1 - v) * (1 - w))[..., None] * corner(0, 0, 0) \
        + ((1 - u) * (1 - v) * w)[..., None] * corner(0, 0, 1) \
        + ((1 - u) * v * (1 - w))[..., None] * corner(0, 1, 0) \
        + ((1 - u) * v * w)[..., None] * corner(0, 1, 1) \
        + (u * (1 - v) * (1 - w))[..., None] * corner(1, 0, 0) \
        + (u * (1 - v) * w)[..., None] * corner(1, 0, 1) \
        + (u * v * (1 - w))[..., None] * corner(1, 1, 0) \
        + (u * v * w)[..., None] * corner(1, 1, 1)
    return sx * f[..., 0], sy * f[..., 1], sz * f[..., 2], f[..., 3]

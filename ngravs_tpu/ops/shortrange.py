"""TreePM short-range transition tables for arbitrary force laws.

Rebuild of the reference's oversampled-FFT convolution machinery
(`performConvolution`, ngravs_core.c:72-159; tabulation at first tree
allocation, forcetree.c:3274-3354) using direct f64 quadrature — same math,
no index bookkeeping:

    C(u)  = 2 * int_0^inf  ghat(k) exp(-k^2/4) cos(k u) dk
    I(u)  = int_0^u C(u') du'
    ftab(u) = I(u)/u^2 - C(u)/u          (force,     scaled by 1/(4 pi a^2))
    ptab(u) = I(u)/u                     (potential, scaled by 1/(2 pi a))

where ghat is the law's Newton-normalized k-space Green's function
(`NormedGreensFxns`) in units where the TreePM Gaussian split is
exp(-k^2 * 0.25) (Z = 0.5, forcetree.c:3275), u = r / (2 * Asmth), and the
walk subtracts  mass * utor2wpi * ftab[int(asmthfac*r)]  from the full force
factor (forcetree.c:1958-2027; asmthfac = 0.5/Asmth * NTAB/3,
utor2wpi = 1/(4 pi Asmth^2), forcetree.c:1708-1711).

For all-Newton wirings this reproduces the classic analytic truncation
erf(u) - 2u/sqrt(pi) exp(-u^2) to table precision (verified in tests).

NOTE a deliberate divergence: the reference stores C(u)/u in its *potential*
table (forcetree.c:3340-3347), but the long-range potential is
(a/pi) I(u)/u — its own Newtonian limit check fails with C/u.  We tabulate
I(u)/u so the periodic potential is exact for Newton (pot_long = erf(u)/r).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wiring import GravityWiring

NTAB_DEFAULT = 2048  # Makefile.reference:52
UMAX = 3.0           # table spans u in [0, 3) (forcetree.c:3336)


def _normed_greens_f64(law, k: np.ndarray) -> np.ndarray:
    """Evaluate the law's normed Green's function; jnp math, f64-sampled."""
    g = law.normed_greens(jnp.asarray(k * k, jnp.float32),
                          jnp.asarray(k, jnp.float32))
    return np.asarray(jax.device_get(g), np.float64)


def shortrange_tables(wiring: GravityWiring, ntab: int = NTAB_DEFAULT,
                      kmax: float = 16.0, nk: int = 8001,
                      oversample: int = 8):
    """[NG, NG, ntab] (ftab, ptab) f32 arrays, indexed [target][source]."""
    ng = wiring.n_gravs
    k = np.linspace(0.0, kmax, nk)
    dk = k[1] - k[0]
    gauss = np.exp(-0.25 * k * k)

    u_i = UMAX / ntab * (np.arange(ntab) + 0.5)

    ftab = np.zeros((ng, ng, ntab))
    ptab = np.zeros((ng, ng, ntab))
    done = {}
    for tg in range(ng):
        for sg in range(ng):
            law = wiring.law(tg, sg)
            key = id(law)
            if key in done:
                ftab[tg, sg], ptab[tg, sg] = done[key]
                continue
            integ = _normed_greens_f64(law, k) * gauss
            # single-quadrature forms (no I/u^2 - C/u cancellation):
            #   ftab(u) = 2 int ghat e^{-k^2/4} (sin(ku) - ku cos(ku))/(k u^2) dk
            #   ptab(u) = 2 int ghat e^{-k^2/4} sin(ku)/(k u) dk
            f = np.empty(ntab)
            p = np.empty(ntab)
            ksafe = np.maximum(k, 1e-30)
            chunk = 256
            for lo in range(0, ntab, chunk):
                hi = min(lo + chunk, ntab)
                x = np.outer(u_i[lo:hi], k)            # [cu, nk]
                sinx, cosx = np.sin(x), np.cos(x)
                uu = u_i[lo:hi][:, None]
                fint = (sinx - x * cosx) / (ksafe * uu * uu)
                fint[:, 0] = 0.0             # k->0 limit: k^2 u / 3 -> 0
                f[lo:hi] = 2.0 * np.trapezoid(fint * integ, dx=dk, axis=1)
                pint = sinx / (ksafe * uu)
                pint[:, 0] = 1.0             # k->0 limit of sin(ku)/(ku)
                p[lo:hi] = 2.0 * np.trapezoid(pint * integ, dx=dk, axis=1)
            ftab[tg, sg], ptab[tg, sg] = f, p
            done[key] = (f, p)
    return (jnp.asarray(ftab, jnp.float32), jnp.asarray(ptab, jnp.float32))


def longrange_force_factor(ftab, asmth: float, ntab: int, r, pair_idx):
    """mass-normalized long-range force factor to subtract: utor2wpi *
    ftab[int(asmthfac * r)], 0 beyond the table (forcetree.c:1958-2027).

    ftab: [NG*NG, ntab] flattened pair tables; r any shape; pair_idx same
    shape (tg*NG+sg).  Caller multiplies by source mass and divides by r.
    """
    asmthfac = 0.5 / asmth * (ntab / UMAX)
    utor2wpi = 1.0 / (4 * math.pi * asmth * asmth)
    # linear interpolation between table midpoints (the reference floors,
    # forcetree.c:1962 — interpolation is strictly more accurate)
    t = r * asmthfac - 0.5
    idx = jnp.clip(t.astype(jnp.int32), 0, ntab - 2)
    frac = jnp.clip(t - idx, 0.0, 1.0)
    inside = r * asmthfac < ntab
    flat = ftab.reshape(-1)
    v0 = flat[pair_idx * ntab + idx]
    v1 = flat[pair_idx * ntab + idx + 1]
    val = v0 + frac * (v1 - v0)
    return jnp.where(inside, utor2wpi * val, 0.0), inside


def longrange_pot_factor(ptab, asmth: float, ntab: int, r, pair_idx):
    """mass-normalized long-range potential: utorwpi * ptab[...]
    (forcetree.c:2860-2863 scaling, corrected table content — see module
    docstring)."""
    asmthfac = 0.5 / asmth * (ntab / UMAX)
    utorwpi = 1.0 / (2 * math.pi * asmth)
    t = r * asmthfac - 0.5
    idx = jnp.clip(t.astype(jnp.int32), 0, ntab - 2)
    frac = jnp.clip(t - idx, 0.0, 1.0)
    inside = r * asmthfac < ntab
    flat = ptab.reshape(-1)
    v0 = flat[pair_idx * ntab + idx]
    v1 = flat[pair_idx * ntab + idx + 1]
    val = v0 + frac * (v1 - v0)
    return jnp.where(inside, utorwpi * val, 0.0), inside


def dump_transition_tables(wiring: GravityWiring, ftab, ptab,
                           asmth: float, box_size: float, output_dir: str,
                           forcetrace: bool = True) -> list:
    """NGRAVS_TREEPM_XITION_CHECK (+ NGRAVS_DEBUG_FORCETRACE): write the
    tabulated TreePM transition per gravity pair for plotting, in the
    reference's file layout (forcetree.c:3299-3391).

    Each unique law gets `ngravs_tpm_<name>_l<ntab>_ol0.txt` in
    `output_dir`, rows `u  C(u)  I(u)` — the reference dumps its raw
    convolution outputs temp=C(u), tempI=I(u) before the /u, /u^2
    divisions; ours store ftab = I/u^2 - C/u and ptab = I/u, so
    C = ptab - u*ftab and I = u*ptab.  With `forcetrace`, appends the
    untruncated vs truncated force trace (forcetree.c:3357-3383).
    Returns the list of files written.
    """
    import os

    ng = wiring.n_gravs
    f_np = np.asarray(ftab, np.float64)
    p_np = np.asarray(ptab, np.float64)
    ntab = f_np.shape[-1]
    u = UMAX / ntab * (np.arange(ntab) + 0.5)
    asmthfac = 0.5 / asmth * (ntab / UMAX)
    utor2wpi = 1.0 / (4 * math.pi * asmth * asmth)
    written, seen = [], set()
    for tg in range(ng):
        for sg in range(ng):
            name = wiring.names[tg][sg]
            if name in seen:     # write each unique law once, like the
                continue         # skipWrite loop (forcetree.c:3304-3309)
            seen.add(name)
            c_u = p_np[tg, sg] - u * f_np[tg, sg]
            i_u = u * p_np[tg, sg]
            path = os.path.join(output_dir,
                                f"ngravs_tpm_{name}_l{ntab}_ol0.txt")
            with open(path, "w") as fh:
                for i in range(ntab):
                    fh.write(f"{u[i]:.15e} {c_u[i]:.15e} {i_u[i]:.15e}\n")
                if forcetrace:
                    law = wiring.law(tg, sg)
                    fh.write("\n# Begin debug forcetrace output\n"
                             f"# Asmth: {asmth:f}\n")
                    r_tab = np.arange(ntab) / asmthfac
                    for i in range(ntab):
                        r = max(r_tab[i], 1e-12)
                        a_full = float(law.accel(1.0, 1.0, r * r, r, 1))
                        fh.write(f"{r:.15e} {a_full:.15e} "
                                 f"{a_full - utor2wpi * f_np[tg, sg, i]:.15e}\n")
                    if box_size > 0:
                        r = r_tab[-1]
                        while r < box_size * 0.5:
                            a_full = float(law.accel(1.0, 1.0, r * r, r, 1))
                            fh.write(f"{r:.15e} {a_full:.15e} 0.0\n")
                            r += box_size * 0.005
            written.append(path)
    return written

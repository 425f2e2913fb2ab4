"""Periodic particle-mesh (PM) long-range gravity.

Rebuild of `pm_periodic.c` (pmforce_periodic :204, pmpotential_periodic :798)
as XLA array programs: CIC scatter via `segment_sum`-style index adds, a
single `jnp.fft.rfftn`, the per-pair ngravs Green's-function multiply with
Gaussian truncation and CIC deconvolution (pm_periodic.c:436-520), inverse
FFT, 4th-order finite-difference gradient (pm_periodic.c:686-726), and CIC
gather back to the receiver particles.

The reference runs the whole pipeline once per (source nA, receiver nB)
gravity pair (pm_periodic.c:288-291); we do the same but share one forward
FFT per *source* gravity.

Units follow the reference's contract: Green's functions take k in mesh
cells in [-PMGRID/2, PMGRID/2], normalized so the Newtonian 4*pi*G/k_phys^2
becomes 1/k_mesh^2 (ngravs.c:818-824); physical scaling G/(pi*L) is applied
at the finite-difference stage (pm_periodic.c:232-238).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wiring import GravityWiring

ASMTH = 1.25   # Makefile.reference default; cfg.asmth overrides
RCUT = 4.5


def cic_assign(pos, weight, pmgrid: int, box: float, shift: float = 0.0):
    """Cloud-in-cell mass assignment -> [pmgrid]^3 grid
    (pm_periodic.c:297-331).  `shift` (in cells) staggers the grid for
    interlacing."""
    fac = pmgrid / box
    u = pos * fac + shift
    i0 = jnp.floor(u).astype(jnp.int32)
    d = u - i0
    i0 = jnp.mod(i0, pmgrid)
    i1 = jnp.mod(i0 + 1, pmgrid)
    grid = jnp.zeros((pmgrid, pmgrid, pmgrid), weight.dtype)
    for bx, wx in ((i0[:, 0], 1 - d[:, 0]), (i1[:, 0], d[:, 0])):
        for by, wy in ((i0[:, 1], 1 - d[:, 1]), (i1[:, 1], d[:, 1])):
            for bz, wz in ((i0[:, 2], 1 - d[:, 2]), (i1[:, 2], d[:, 2])):
                grid = grid.at[bx, by, bz].add(weight * wx * wy * wz)
    return grid


def cic_readout(grid, pos, pmgrid: int, box: float, shift: float = 0.0):
    """Trilinear interpolation of a grid at particle positions
    (pm_periodic.c:728-763)."""
    fac = pmgrid / box
    u = pos * fac + shift
    i0 = jnp.floor(u).astype(jnp.int32)
    d = u - i0
    i0 = jnp.mod(i0, pmgrid)
    i1 = jnp.mod(i0 + 1, pmgrid)
    out = jnp.zeros(pos.shape[:-1], grid.dtype)
    for bx, wx in ((i0[..., 0], 1 - d[..., 0]), (i1[..., 0], d[..., 0])):
        for by, wy in ((i0[..., 1], 1 - d[..., 1]), (i1[..., 1], d[..., 1])):
            for bz, wz in ((i0[..., 2], 1 - d[..., 2]), (i1[..., 2], d[..., 2])):
                out = out + grid[bx, by, bz] * wx * wy * wz
    return out


def _kgrid(pmgrid: int):
    """Mesh-cell wavenumbers for rfftn layout: kx,ky full, kz half."""
    k = np.fft.fftfreq(pmgrid) * pmgrid        # [-G/2, G/2)
    kz = np.arange(pmgrid // 2 + 1)
    kx = k[:, None, None]
    ky = k[None, :, None]
    kz = kz[None, None, :]
    return kx, ky, kz


def _deconv_smth(wiring: GravityWiring, tg: int, sg: int, pmgrid: int,
                 asmth_cells: float):
    """k-space multiplier: greens * exp(-k2*asmth2) * CIC-deconvolution^4
    (pm_periodic.c:456-515), as a numpy f64 [G,G,G/2+1] array baked per pair."""
    kx, ky, kz = _kgrid(pmgrid)
    k2 = kx * kx + ky * ky + kz * kz
    kmag = np.sqrt(k2)
    sinc = lambda t: np.where(t == 0, 1.0, np.sin(np.pi * t / pmgrid)
                              / np.where(t == 0, 1.0, np.pi * t / pmgrid))
    ff = sinc(kx) * sinc(ky) * sinc(kz)
    asmth2 = (2 * math.pi * asmth_cells / pmgrid) ** 2
    law = wiring.law(tg, sg)
    greens = np.asarray(jax.device_get(
        law.greens(jnp.asarray(k2), jnp.asarray(kmag))), np.float64)
    smth = greens * np.exp(-k2 * asmth2) / np.maximum(ff, 1e-8) ** 4
    smth[0, 0, 0] = 0.0  # kill DC mode (pm_periodic.c:519-520)
    return smth


class PMSolver:
    """Periodic PM force/potential for an ngravs wiring (single device).

    Per-pair k-space multipliers are precomputed on host in f64 and stored
    as device arrays; `forces` shares one rfftn per source gravity.
    """

    def __init__(self, wiring: GravityWiring, pmgrid: int, box: float,
                 n_gravs: int, g_const: float, asmth_cells: float = ASMTH,
                 gradient: str = "fd4", interlace: bool = False):
        self.pmgrid = int(pmgrid)
        self.box = float(box)
        self.n_gravs = n_gravs
        self.G = float(g_const)
        self.asmth_cells = float(asmth_cells)
        self.asmth = asmth_cells * box / pmgrid        # length units
        self.rcut = RCUT * self.asmth
        self.gradient = gradient
        assert gradient in ("fd4", "spectral"), gradient
        smth = np.stack([np.stack([
            _deconv_smth(wiring, tg, sg, self.pmgrid, asmth_cells)
            for sg in range(n_gravs)]) for tg in range(n_gravs)])
        self.smth = jnp.asarray(smth, jnp.float32)     # [NG,NG,G,G,G/2+1]
        # receiver groups per source: the convolution + gradient of every
        # receiver gravity wired to the SAME law from this source is
        # identical — compute it once and mask the readout by the union
        # of receiver types (9 -> 5 rounds for the three_species wiring)
        self.recv_groups = []
        for sg in range(n_gravs):
            groups = {}
            for tg in range(n_gravs):
                groups.setdefault(id(wiring.law(tg, sg)), []).append(tg)
            self.recv_groups.append(sorted(groups.values()))
        # spectral (ik) gradient wavenumbers (physical), Nyquist zeroed —
        # exact differentiation replacing the 4th-order stencil when
        # gradient="spectral" (the reference's FD is pm_periodic.c:686)
        if gradient == "spectral":
            g = self.pmgrid
            kx, ky, kz = _kgrid(g)
            kfac = 2 * math.pi / box
            def kz_(k):
                k = np.where(np.abs(k) == g // 2, 0.0, k)
                return jnp.asarray(k * kfac, jnp.float32)
            self.kvec = (kz_(kx), kz_(ky), kz_(kz))
        # grid interlacing (Hockney & Eastwood; Sefusatti+ 2016): a second
        # half-cell-staggered CIC assignment whose k-spectrum, phase-aligned
        # and averaged with the primary, cancels every odd-image alias of
        # the mass-assignment window; the force readout is symmetrized the
        # same way (average of the integer-grid and staggered-grid
        # interpolations).  Kills the near-grid anisotropy error the
        # reference's plain CIC + deconv^4 leaves at r of a few cells
        # (the tpmfp transition-bin floor), at 2x FFT cost.  Opt-in.
        self.interlace = bool(interlace)
        if self.interlace:
            g = self.pmgrid
            kx, ky, kz = _kgrid(g)
            ph = np.exp(1j * math.pi * (kx + ky + kz) / g)
            self.phase = jnp.asarray(ph, jnp.complex64)
            # The half-cell shift is sign-ambiguous on the Nyquist planes
            # (fftfreq yields k = -g/2, giving conj phase), so odd-alias
            # cancellation is ill-defined there; zero those modes of the
            # AVERAGED spectrum so both the assignment and every staggered
            # readout see an unambiguous (Nyquist-free) field.  The
            # Gaussian x deconv^4 multiplier leaves them negligible anyway.
            nyq = ((np.abs(kx) == g // 2) | (np.abs(ky) == g // 2)
                   | (kz == g // 2))
            self.nyqmask = jnp.asarray(np.where(nyq, 0.0, 1.0), jnp.float32)
        # the smth tables are passed as ARGUMENTS (not jit-closure
        # constants): at PMGRID 256 x NG^2 they are GB-scale and baked-in
        # constants blow up the serialized program
        self._forces = jax.jit(self._forces_impl)
        self._potential = jax.jit(self._potential_impl)

    # ------------------------------------------------------------------
    def _phi_k(self, pos, mass, grav, sg):
        w = jnp.where(grav == sg, mass, 0.0)
        rho_k = jnp.fft.rfftn(cic_assign(pos, w, self.pmgrid, self.box))
        if self.interlace:
            rho2_k = jnp.fft.rfftn(
                cic_assign(pos, w, self.pmgrid, self.box, shift=0.5))
            rho_k = 0.5 * (rho_k + self.phase * rho2_k) * self.nyqmask
        return rho_k

    def _read_field(self, f_k, pos):
        """Inverse-transform a k-space field and interpolate it at the
        particles; interlaced mode averages the integer-grid and
        half-cell-staggered interpolations (odd readout aliases cancel)."""
        g = self.pmgrid
        out = cic_readout(jnp.fft.irfftn(f_k, s=(g, g, g)),
                          pos, g, self.box)
        if self.interlace:
            f_b = jnp.fft.irfftn(f_k * jnp.conj(self.phase), s=(g, g, g))
            out = 0.5 * (out + cic_readout(f_b, pos, g, self.box, shift=0.5))
        return out

    def _forces_impl(self, pos, mass, grav, smth):
        """PM accelerations [N,3] (times G), all gravity pairs.

        Normalization: with the DFT pair rho_k = fftn(mass grid) and
        jnp.irfftn carrying 1/N^3, psi = (G N^3 / (pi L)) * irfftn(rho_k *
        greens * ...) equals minus the physical potential (greens being
        1/k_mesh^2-normalized, ngravs.c:382-400); acc = +grad(psi).
        Equivalent to the reference's fac = G/(pi L) with FFTW's
        unnormalized transforms (pm_periodic.c:231-238).
        """
        g = self.pmgrid
        fac = self.G / (math.pi * self.box) * (g ** 3)
        h = self.box / g
        acc = jnp.zeros_like(pos)
        for sg in range(self.n_gravs):
            rho_k = self._phi_k(pos, mass, grav, sg)
            for tgs in self.recv_groups[sg]:
                conv = rho_k * smth[tgs[0], sg]
                recv = grav == tgs[0]
                for tg in tgs[1:]:
                    recv = recv | (grav == tg)
                if self.gradient == "spectral":
                    # exact ik differentiation in k space
                    for dim in range(3):
                        a = self._read_field(1j * self.kvec[dim] * conv, pos)
                        acc = acc.at[:, dim].add(
                            jnp.where(recv, a * fac, 0.0))
                    continue
                psis = [(jnp.fft.irfftn(conv, s=(g, g, g)), 0.0)]
                if self.interlace:
                    psis.append((jnp.fft.irfftn(conv * jnp.conj(self.phase),
                                                s=(g, g, g)), 0.5))
                for dim in range(3):
                    # 4th-order centered difference (pm_periodic.c:686-726),
                    # averaged over the interlaced grids when enabled
                    a = 0.0
                    for psi, shift in psis:
                        d1 = (jnp.roll(psi, -1, axis=dim)
                              - jnp.roll(psi, 1, axis=dim))
                        d2 = (jnp.roll(psi, -2, axis=dim)
                              - jnp.roll(psi, 2, axis=dim))
                        grad = (4.0 / 3 * d1 - 1.0 / 6 * d2) / (2 * h)
                        a = a + cic_readout(grad, pos, g, self.box,
                                            shift=shift) / len(psis)
                    acc = acc.at[:, dim].add(jnp.where(recv, a * fac, 0.0))
        return acc

    def _potential_impl(self, pos, mass, grav, smth):
        """PM potential [N] (times G) — pmpotential_periodic
        (pm_periodic.c:798)."""
        g = self.pmgrid
        fac = self.G / (math.pi * self.box) * (g ** 3)
        pot = jnp.zeros(pos.shape[0], pos.dtype)
        for sg in range(self.n_gravs):
            rho_k = self._phi_k(pos, mass, grav, sg)
            for tgs in self.recv_groups[sg]:
                recv = grav == tgs[0]
                for tg in tgs[1:]:
                    recv = recv | (grav == tg)
                v = self._read_field(rho_k * smth[tgs[0], sg], pos)
                pot = pot - jnp.where(recv, v * fac, 0.0)
        return pot

    def forces(self, pos, mass, grav):
        return self._forces(pos, mass, grav, self.smth)

    def potential(self, pos, mass, grav):
        return self._potential(pos, mass, grav, self.smth)

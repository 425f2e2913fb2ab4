"""Cosmological drift/kick factor tables (reference driftfac.c).

The comoving KDK integrator needs three integrals of the expansion history
over each integer-timeline interval:

    drift:     int da / (H(a) a^3)
    gravkick:  int da / (H(a) a^2)
    hydrokick: int da / (H(a) a^(3*GAMMA-2))

The reference tabulates 1000 points in log(a) with GSL QAG (driftfac.c:26-59)
and linearly interpolates (driftfac.c:67-177).  Here the tables are built once
on host in float64 with composite Simpson integration at high resolution, and
lookups are vectorized jnp interpolation — usable inside jit on whole particle
arrays at once (the reference calls the scalar lookup per particle).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .constants import GAMMA_MINUS1, TIMEBASE

DRIFT_TABLE_LENGTH = 1000  # reference allvars.h:95


def hubble_of_a(a, omega0, omega_lambda, hubble):
    """H(a) in internal units (driftfac.c integrands / timestep.c:52-55)."""
    return hubble * np.sqrt(omega0 / a**3 + (1 - omega0 - omega_lambda) / a**2
                            + omega_lambda)


class DriftKickTables:
    """Precomputed factor tables over [time_begin, time_max] in log(a)."""

    def __init__(self, time_begin: float, time_max: float,
                 omega0: float, omega_lambda: float, hubble: float,
                 length: int = DRIFT_TABLE_LENGTH, oversample: int = 64,
                 gamma_minus1: float = GAMMA_MINUS1):
        self.log_begin = np.log(time_begin)
        self.log_max = np.log(time_max)
        self.length = length

        # integrate cumulatively on a fine grid, then sample the table points
        n_fine = length * oversample
        loga = np.linspace(self.log_begin, self.log_max, n_fine + 1)
        a = np.exp(loga)
        h = hubble_of_a(a, omega0, omega_lambda, hubble)
        # d(integral)/d(loga) = integrand(a) * a
        drift_d = a / (h * a**3)
        grav_d = a / (h * a**2)
        hydro_d = a / (h * a**(3 * gamma_minus1) * a)

        def cumulative(deriv):
            # composite trapezoid on the fine grid (error ~ (1/n_fine)^2,
            # far below float32 resolution at oversample=64)
            dx = np.diff(loga)
            c = np.concatenate([[0.0], np.cumsum(0.5 * dx * (deriv[1:] + deriv[:-1]))])
            return c[::oversample].copy()

        self.drift_table = cumulative(drift_d)
        self.gravkick_table = cumulative(grav_d)
        self.hydrokick_table = cumulative(hydro_d)
        # device copies for in-jit lookup
        self._tables = jnp.asarray(
            np.stack([self.drift_table, self.gravkick_table, self.hydrokick_table]),
            jnp.float32)

    def _lookup(self, table_idx: int, ti, timebase_interval: float):
        """Cumulative factor from time_begin to integer time ti (vectorized)."""
        t = self._tables[table_idx]
        # map integer time -> table coordinate: ti spans [0, TIMEBASE] over
        # [log_begin, log_max]; the table has `length` bins over the same span
        u = jnp.asarray(ti, jnp.float32) * (self.length / float(TIMEBASE))
        i0 = jnp.clip(u.astype(jnp.int32), 0, self.length - 1)
        frac = u - i0.astype(jnp.float32)
        return t[i0] + (t[i0 + 1] - t[i0]) * frac

    def drift_factor(self, ti0, ti1, timebase_interval: float = 0.0):
        """get_drift_factor (driftfac.c:67): factor for ti0 -> ti1."""
        return self._lookup(0, ti1, 0) - self._lookup(0, ti0, 0)

    def gravkick_factor(self, ti0, ti1, timebase_interval: float = 0.0):
        return self._lookup(1, ti1, 0) - self._lookup(1, ti0, 0)

    def hydrokick_factor(self, ti0, ti1, timebase_interval: float = 0.0):
        return self._lookup(2, ti1, 0) - self._lookup(2, ti0, 0)


class LinearTables:
    """Non-comoving stand-in: every factor is just dt = (ti1-ti0)*interval."""

    def __init__(self, timebase_interval: float):
        self.timebase_interval = timebase_interval

    def _dt(self, ti0, ti1):
        return (jnp.asarray(ti1, jnp.float32) - jnp.asarray(ti0, jnp.float32)) \
            * self.timebase_interval

    drift_factor = _dt
    gravkick_factor = _dt
    hydrokick_factor = _dt


def make_tables(cfg, units):
    """Factory: comoving -> DriftKickTables, else LinearTables."""
    if cfg.comoving_integration:
        return DriftKickTables(cfg.time_begin, cfg.time_max,
                               cfg.omega0, cfg.omega_lambda, units.hubble,
                               gamma_minus1=cfg.gamma_minus1)
    tbi = (cfg.time_max - cfg.time_begin) / TIMEBASE
    return LinearTables(tbi)

"""Integer timeline helpers (reference allvars.h:25, run.c, begrun.c).

The simulated timespan [time_begin, time_max] is mapped to integer ticks
[0, TIMEBASE]; comoving runs use log(a) spacing, Newtonian runs linear time.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import TIMEBASE


def timebase_interval(cfg) -> float:
    # timeline_time_max > time_max after a resume-with-extended-TimeMax
    # rescale (readjust_timebase, begrun.c:821-864)
    tmax = getattr(cfg, "timeline_time_max", 0.0) or cfg.time_max
    if cfg.comoving_integration:
        return (math.log(tmax) - math.log(cfg.time_begin)) / TIMEBASE
    return (tmax - cfg.time_begin) / TIMEBASE


def ti_to_time(cfg, ti):
    """Physical time (or scale factor) at integer time ti."""
    tbi = timebase_interval(cfg)
    if cfg.comoving_integration:
        return cfg.time_begin * np.exp(np.asarray(ti, np.float64) * tbi)
    return cfg.time_begin + np.asarray(ti, np.float64) * tbi


def time_to_ti(cfg, t) -> int:
    """Integer tick for a physical time, rounded down (run.c:206-225 uses this
    to place snapshot times on the timeline)."""
    tbi = timebase_interval(cfg)
    if cfg.comoving_integration:
        return int((math.log(t) - math.log(cfg.time_begin)) / tbi)
    return int((t - cfg.time_begin) / tbi)


def pow2_floor_i32(x):
    """Largest power of two <= x for positive int32 arrays (vectorized, exact —
    float log2 would lose precision above 2^24)."""
    import jax.numpy as jnp
    x = jnp.asarray(x, jnp.int32)
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return x - (x >> 1)

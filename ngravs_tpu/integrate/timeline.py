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


def pm_window_update(ti_next, pm_beg, pm_end, dt_disp, tbi: float):
    """Advance the PM (long-range) integer-timeline window at a PM step
    (timestep.c:350-408): the new PM step is the power-of-two floor of the
    displacement constraint, may only grow onto an aligned tick
    (timestep.c:357-362), and the long-range kick covers the midpoint window
    [old midpoint, new midpoint].

    Traceable (all jnp scalars).  Returns (tstart, tend, new_beg, new_end):
    kick velocity by accel_pm * gravkick_factor(tstart, tend).
    """
    import jax.numpy as jnp
    ti_next = jnp.asarray(ti_next, jnp.int32)
    pm_beg = jnp.asarray(pm_beg, jnp.int32)
    pm_end = jnp.asarray(pm_end, jnp.int32)
    ti_step = jnp.maximum(1, jnp.minimum(
        (jnp.asarray(dt_disp, jnp.float32) / tbi).astype(jnp.int32),
        TIMEBASE - ti_next))
    ti_step = pow2_floor_i32(ti_step)
    old = pm_end - pm_beg
    misaligned = ((TIMEBASE - pm_end) % jnp.maximum(ti_step, 1)) > 0
    ti_step = jnp.where((ti_step > old) & (old > 0) & misaligned,
                        old, ti_step)
    ti_step = jnp.where(ti_next >= TIMEBASE, 0, ti_step)
    tstart = (pm_beg + pm_end) // 2
    tend = pm_end + ti_step // 2
    return tstart, tend, pm_end, pm_end + ti_step

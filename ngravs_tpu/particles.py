"""Particle state as SoA pytrees.

The reference's AoS `struct particle_data P[]` / `struct sph_particle_data
SphP[]` (allvars.h:546-606) become structure-of-arrays pytrees: every field is
a `[N]` or `[N, 3]` device array, shardable over a mesh and friendly to XLA
vectorization.  Gas particles are kept at the head of the arrays (the reference
guarantees the same layout via `peano_hilbert_order`, peano.c:47-67).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    cls.replace = dataclasses.replace
    return cls


@_pytree_dataclass
class SphState:
    """Per-gas-particle SPH state (reference allvars.h:587-606).

    Arrays have length N (full particle count); entries past n_gas are unused
    padding so the SPH state shards identically to the particle arrays.
    """
    entropy: jnp.ndarray        # entropic function A
    density: jnp.ndarray
    hsml: jnp.ndarray           # smoothing length
    pressure: jnp.ndarray
    dt_entropy: jnp.ndarray
    hydro_accel: jnp.ndarray    # [N,3]
    vel_pred: jnp.ndarray       # [N,3] predicted velocity
    div_vel: jnp.ndarray
    curl_vel: jnp.ndarray
    dhsml_density_factor: jnp.ndarray
    max_signal_vel: jnp.ndarray
    num_ngb: jnp.ndarray

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "SphState":
        z1 = jnp.zeros((n,), dtype)
        z3 = jnp.zeros((n, 3), dtype)
        return SphState(entropy=z1, density=z1, hsml=z1, pressure=z1,
                        dt_entropy=z1, hydro_accel=z3, vel_pred=z3,
                        div_vel=z1, curl_vel=z1, dhsml_density_factor=z1,
                        max_signal_vel=z1, num_ngb=z1)


@_pytree_dataclass
class Particles:
    """Global particle state (reference allvars.h:546-581)."""
    pos: jnp.ndarray          # [N,3]
    vel: jnp.ndarray          # [N,3]
    mass: jnp.ndarray         # [N]
    pid: jnp.ndarray          # [N] int32 particle IDs
    ptype: jnp.ndarray        # [N] int32 Gadget type 0..5
    grav: jnp.ndarray         # [N] int32 gravity index (TypeToGrav[ptype])
    accel: jnp.ndarray        # [N,3] tree/short-range gravitational accel
    accel_pm: jnp.ndarray     # [N,3] long-range (PM) accel
    potential: jnp.ndarray    # [N]
    old_acc: jnp.ndarray      # [N] |accel| of previous step (relative opening)
    aphys_old: jnp.ndarray    # [N] |accel| at last step (PSEUDOSYMMETRIC
                              # first-order step prediction, allvars.h:574)
    ti_begstep: jnp.ndarray   # [N] int32, integer-timeline step start
    ti_endstep: jnp.ndarray   # [N] int32, integer-timeline step end
    grav_cost: jnp.ndarray    # [N] interaction count (load balancing)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def create(pos, vel, mass, pid, ptype, type_to_grav, dtype=jnp.float32) -> "Particles":
        pos = jnp.asarray(pos, dtype)
        n = pos.shape[0]
        ptype = jnp.asarray(ptype, jnp.int32)
        t2g = jnp.asarray(np.asarray(type_to_grav), jnp.int32)
        return Particles(
            pos=pos,
            vel=jnp.asarray(vel, dtype),
            mass=jnp.asarray(mass, dtype),
            pid=jnp.asarray(pid, jnp.int32),
            ptype=ptype,
            grav=t2g[ptype],
            accel=jnp.zeros((n, 3), dtype),
            accel_pm=jnp.zeros((n, 3), dtype),
            potential=jnp.zeros((n,), dtype),
            old_acc=jnp.zeros((n,), dtype),
            aphys_old=jnp.zeros((n,), dtype),
            ti_begstep=jnp.zeros((n,), jnp.int32),
            ti_endstep=jnp.zeros((n,), jnp.int32),
            grav_cost=jnp.zeros((n,), dtype),
        )

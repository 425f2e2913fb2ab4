"""Multi-device tests on the virtual 8-device CPU mesh — the coverage the
MPI reference never had (SURVEY.md §4 implication e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.constants import SOFTFAC_SPLINE
from ngravs_tpu.cosmology import make_tables
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.parallel.mesh import make_mesh, make_sharded_step, shard_particles
from ngravs_tpu.particles import Particles
from ngravs_tpu.units import set_units


@pytest.fixture
def system(rng):
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.05,) * 6, max_size_timestep=0.01,
        n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0), wiring="newton_yukawa",
        box_size=50.0)
    n = 4096
    pos = rng.uniform(0, 10, (n, 3))
    vel = rng.normal(0, 0.1, (n, 3))
    ptype = rng.integers(1, 3, n)  # halo + disk -> two gravities
    p = Particles.create(pos, vel, np.full(n, 1e-3), np.arange(n), ptype,
                         cfg.type_to_grav)
    return cfg, p


def test_sharded_step_matches_single_device(system):
    cfg, p = system
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)

    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    step = make_sharded_step(cfg, units, wiring, tables, mesh)
    p_out, min_end = step(ps, 0, 0, cfg.time_begin)

    # single-device reference: same forces via the unsharded kernel
    fsoft = jnp.asarray(np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)[p.ptype]
    acc_ref, pot_ref = direct_forces(wiring, p.pos, p.mass, p.grav, fsoft,
                                     chunk=512)
    acc_ref = np.asarray(acc_ref) * units.G

    acc_sh = np.asarray(jax.device_get(p_out.accel))[: p.n]
    scale = np.abs(acc_ref).max()
    np.testing.assert_allclose(acc_sh, acc_ref, atol=3e-5 * scale)
    assert int(min_end) > 0  # everyone got a step assigned


def test_sharded_step_multiple_iterations(system):
    cfg, p = system
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    step = make_sharded_step(cfg, units, wiring, tables, mesh)

    ti = 0
    from ngravs_tpu.integrate.timeline import ti_to_time
    for _ in range(3):
        ps, min_end = step(ps, ti, ti, float(ti_to_time(cfg, ti)))
        ti = int(min_end)
    assert np.isfinite(np.asarray(jax.device_get(ps.pos))).all()
    assert ti > 0


def test_padding_particles_inert(rng):
    """N not divisible by mesh size: sentinel padding must not affect forces."""
    cfg = SimulationConfig(time_begin=0, time_max=1.0,
                           gravity_constant_internal=1.0,
                           softening=(0.05,) * 6, wiring="newton")
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    n = 1001  # not a multiple of 8
    pos = rng.uniform(0, 5, (n, 3))
    p = Particles.create(pos, np.zeros((n, 3)), np.ones(n), np.arange(n),
                         np.ones(n), cfg.type_to_grav)
    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    assert ps.pos.shape[0] == 1008
    step = make_sharded_step(cfg, units, wiring, tables, mesh)
    p_out, _ = step(ps, 0, 0, 0.0)
    fsoft = jnp.full(n, 0.05 * SOFTFAC_SPLINE)
    acc_ref, _ = direct_forces(wiring, p.pos, p.mass, p.grav, fsoft, chunk=512)
    scale = float(np.abs(np.asarray(acc_ref)).max())
    np.testing.assert_allclose(np.asarray(jax.device_get(p_out.accel))[:n],
                               np.asarray(acc_ref) * units.G,
                               atol=3e-5 * scale * units.G)

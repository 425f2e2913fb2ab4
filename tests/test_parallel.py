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


def test_sharded_tree_step_matches_direct(system):
    """Replicated-tree target-parallel walk (tree_sharded): BH forces on the
    8-device mesh must match the single-device direct sum to tree accuracy."""
    from ngravs_tpu.parallel.tree_sharded import make_sharded_tree_step

    cfg, p = system
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    nloc = ps.pos.shape[0] // 8
    step = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, opening="bh")
    p_out, min_end = step(ps, 0, 0, cfg.time_begin)

    fsoft = jnp.asarray(np.array(cfg.softening, np.float32) * SOFTFAC_SPLINE)[p.ptype]
    acc_ref, _ = direct_forces(wiring, p.pos, p.mass, p.grav, fsoft, chunk=512)
    acc_ref = np.asarray(acc_ref) * units.G
    acc_sh = np.asarray(jax.device_get(p_out.accel))[: p.n]
    # BH theta=0.5 tree accuracy: per-particle relative error well under 1%
    err = np.linalg.norm(acc_sh - acc_ref, axis=1) / np.linalg.norm(acc_ref, axis=1)
    assert np.sqrt((err ** 2).mean()) < 0.01
    assert int(min_end) > 0


def test_reshard_by_morton_compact(system):
    """After resharding, each shard owns a contiguous Morton-key range and
    the multiset of particle IDs is preserved."""
    from ngravs_tpu.parallel.tree_sharded import reshard_by_morton
    from ngravs_tpu.ops.morton import morton_keys2

    cfg, p = system
    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    ps2 = reshard_by_morton(ps, mesh)
    pos = np.asarray(jax.device_get(ps2.pos))
    pid = np.asarray(jax.device_get(ps2.pid))
    assert sorted(pid.tolist()) == sorted(
        np.asarray(jax.device_get(ps.pid)).tolist())
    # keys must be globally non-decreasing across the concatenated shards
    lo = pos.min(axis=0)
    hi = pos.max(axis=0)
    ln = (hi - lo).max() * 1.0001 + 1e-30
    corner = (lo + hi) / 2 - ln / 2
    khi, klo = morton_keys2(jnp.asarray(pos), jnp.asarray(corner),
                            1.0 / ln, 10)
    keys = np.asarray(khi).astype(np.int64) * (1 << 31) + np.asarray(klo)
    assert (np.diff(keys) >= 0).all()


def test_sharded_pm_matches_single_device():
    """Slab-decomposed distributed FFT PM (pm_sharded) must reproduce the
    single-chip PMSolver forces and potential on the 8-device mesh."""
    from ngravs_tpu.models import laws as L
    from ngravs_tpu.models.wiring import GravityWiring
    from ngravs_tpu.ops.pm import PMSolver
    from ngravs_tpu.parallel.pm_sharded import ShardedPMSolver
    from jax.sharding import NamedSharding, PartitionSpec as P

    box, pmgrid, n = 100.0, 32, 1024
    w = GravityWiring([[L.Newtonian(), L.Newtonian()],
                       [L.Newtonian(), L.Yukawa(5.0, box, pmgrid=32)]])
    pm = PMSolver(w, pmgrid, box, 2, g_const=1.0)
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grav = (rng.random(n) < 0.4).astype(np.int32)

    acc_ref = np.asarray(pm.forces(pos, mass, grav))
    pot_ref = np.asarray(pm.potential(pos, mass, grav))

    mesh = make_mesh(8)
    sh = NamedSharding(mesh, P("shard"))
    put = lambda a: jax.device_put(jnp.asarray(a), sh)
    spm = ShardedPMSolver(pm, mesh, 2)
    acc_sh = np.asarray(jax.device_get(spm.forces(put(pos), put(mass), put(grav))))
    pot_sh = np.asarray(jax.device_get(spm.potential(put(pos), put(mass), put(grav))))

    scale = np.abs(acc_ref).max()
    np.testing.assert_allclose(acc_sh, acc_ref, atol=2e-5 * scale)
    np.testing.assert_allclose(pot_sh, pot_ref,
                               atol=2e-5 * np.abs(pot_ref).max())

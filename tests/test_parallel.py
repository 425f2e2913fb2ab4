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


@pytest.mark.slow
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
    p_out, min_end, _ = step(ps, 0, 0, cfg.time_begin)

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


def _gas_halo_system(n_gas=1024, n_halo=1024, box=1.0, seed=3):
    """Periodic gas+halo box for the full TreePM+SPH sharded step."""
    rng = np.random.default_rng(seed)
    m = round(n_gas ** (1 / 3))
    g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
         .reshape(-1, 3) + 0.5) / m * box
    g += rng.normal(0, 0.05 * box / m, g.shape)
    gas = np.mod(g, box)
    n_gas = len(gas)
    halo = rng.uniform(0, box, (n_halo, 3))
    pos = np.concatenate([gas, halo]).astype(np.float32)
    n = n_gas + n_halo
    vel = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    ptype = np.concatenate([np.zeros(n_gas, np.int32),
                            np.ones(n_halo, np.int32)])
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.02,) * 6, max_size_timestep=0.005,
        periodic=True, box_size=box, pmgrid=16,
        des_num_ngb=40, max_num_ngb_deviation=2,
        tree_depth=6, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4, n_gravs=1, wiring="newton",
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0)
    p = Particles.create(pos, vel, np.full(n, 1.0 / n, np.float32),
                         np.arange(n), ptype, cfg.type_to_grav)
    from ngravs_tpu.particles import SphState
    sph = SphState.zeros(n)
    h0 = box * (cfg.des_num_ngb / max(n_gas, 1)) ** (1 / 3)
    hsml = np.where(ptype == 0, h0, 0.0).astype(np.float32)
    sph = sph.replace(hsml=jnp.asarray(hsml),
                      entropy=jnp.full((n,), 0.05, jnp.float32))
    return cfg, p, sph


def _run_full_step(cfg, p, sph, n_dev):
    from ngravs_tpu.parallel.full_sharded import make_sharded_full_step

    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    mesh = make_mesh(n_dev)
    ps = shard_particles(p, mesh)
    sphs = jax.tree.map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("shard"))),
        sph)
    nloc = ps.pos.shape[0] // n_dev
    step = make_sharded_full_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, node_list_cap=16384,
                                  leaf_list_cap=16384, leaf_factor=8.0,
                                  pm_step=True)
    p2, sph2, min_end, ovf, pm_beg, pm_end = step(ps, sphs, 0, 0,
                                                  cfg.time_begin, 0, 0)
    assert not bool(ovf), "SPH candidate caps overflowed"
    assert int(pm_end) > 0  # PM window advanced (timestep.c:350-408)
    return (jax.device_get(p2), jax.device_get(sph2), int(min_end))


@pytest.mark.slow
def test_sharded_full_step_treepm_sph():
    """The single-program sharded TreePM+SPH step (BASELINE config-5
    structure): 8-device result must match the 1-device result, hydro
    forces conserve momentum, neighbor counts converge."""
    cfg, p, sph = _gas_halo_system()
    n = p.pos.shape[0]
    p8, s8, end8 = _run_full_step(cfg, p, sph, 8)
    p1, s1, end1 = _run_full_step(cfg, p, sph, 1)

    assert end8 == end1 > 0
    a_scale = np.abs(np.asarray(p1.accel)).max()
    np.testing.assert_allclose(np.asarray(p8.accel), np.asarray(p1.accel),
                               atol=3e-4 * a_scale)
    np.testing.assert_allclose(np.asarray(s8.density)[:1000],
                               np.asarray(s1.density)[:1000], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(s8.hsml)[:1000],
                               np.asarray(s1.hsml)[:1000], rtol=2e-3)

    # physics gates on the 8-device result
    gas = np.asarray(p8.ptype) == 0
    wngb = np.asarray(s8.num_ngb)[gas]
    assert np.abs(wngb - cfg.des_num_ngb).max() <= cfg.max_num_ngb_deviation + 1
    hacc = np.asarray(s8.hydro_accel)[gas]
    mass = np.asarray(p8.mass)[gas]
    mom = np.abs((mass[:, None] * hacc).sum(0))
    scale = (mass[:, None] * np.abs(hacc)).sum(0) + 1e-30
    assert (mom / scale < 1e-2).all()
    assert np.isfinite(np.asarray(p8.accel_pm)).all()
    assert np.abs(np.asarray(p8.accel_pm)).max() > 0


@pytest.mark.slow
def test_reshard_by_cost_balances_work(system):
    """domain_findSplit analog: shards get contiguous Morton ranges with
    near-equal measured work; padding rows are inert; forces per particle
    ID match the unresharded sharded-tree result."""
    from ngravs_tpu.cosmology import make_tables
    from ngravs_tpu.parallel.tree_sharded import (make_sharded_tree_step,
                                                  reshard_by_cost,
                                                  reshard_by_morton)

    cfg, p = system
    rng = np.random.default_rng(9)
    # synthetic skewed cost: particles near the origin are 20x dearer
    r = np.linalg.norm(np.asarray(p.pos) - 5.0, axis=1)
    cost = np.where(r < 3.0, 20.0, 1.0).astype(np.float32)
    p = p.replace(grav_cost=jnp.asarray(cost))
    mesh = make_mesh(8)

    p2, _ = reshard_by_cost(p, mesh, alloc_factor=1.6)
    n_dev = 8
    cap = p2.pos.shape[0] // n_dev
    pid2 = np.asarray(jax.device_get(p2.pid)).reshape(n_dev, cap)
    cost2 = np.asarray(jax.device_get(p2.grav_cost)).reshape(n_dev, cap)
    mass2 = np.asarray(jax.device_get(p2.mass)).reshape(n_dev, cap)
    live = pid2 >= 0
    # every real particle present exactly once
    ids = np.sort(pid2[live])
    np.testing.assert_array_equal(ids, np.sort(np.asarray(p.pid)))
    # padding inert
    assert (mass2[~live] == 0).all()
    # measured work balanced to ~the largest single weight
    work = ((1.0 + cost2) * live).sum(axis=1)
    ideal = (1.0 + cost).sum() / n_dev
    assert work.max() / ideal < 1.25, work / ideal

    # physics identical to the count-based reshard (same particles, same
    # replicated tree -> same forces per ID)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    step2 = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                   n_local=cap, opening="bh")
    pr2, _, _ = step2(p2, 0, 0, cfg.time_begin)
    p3 = reshard_by_morton(shard_particles(p, mesh), mesh)
    step3 = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                   n_local=p3.pos.shape[0] // n_dev,
                                   opening="bh")
    pr3, _, _ = step3(p3, 0, 0, cfg.time_begin)
    a2 = np.asarray(jax.device_get(pr2.accel))
    i2 = np.asarray(jax.device_get(pr2.pid))
    a3 = np.asarray(jax.device_get(pr3.accel))
    i3 = np.asarray(jax.device_get(pr3.pid))
    m2 = {int(i): a2[k] for k, i in enumerate(i2) if i >= 0}
    scale = np.abs(a3).max()
    # the padded tree has a slightly different bucket structure, so opening
    # decisions differ within the BH theta=0.5 approximation band (~1e-3)
    for k, i in enumerate(i3):
        if i >= 0:
            np.testing.assert_allclose(m2[int(i)], a3[k],
                                       atol=3e-3 * scale)


@pytest.mark.slow
def test_distributed_simulation_runs(tmp_path):
    """Pod-sharded main loop: multi-step TreePM+SPH run over the 8-device
    mesh with snapshot + energy output and timeline advance."""
    import os

    from ngravs_tpu.io.gadget_format import read_snapshot
    from ngravs_tpu.parallel.runner import DistributedSimulation

    cfg, p, sph = _gas_halo_system(n_gas=512, n_halo=512)
    cfg = cfg.replace(time_bet_snapshot=0.001, time_of_first_snapshot=0.001,
                      time_bet_statistics=0.0005, output_dir=str(tmp_path),
                      time_max=0.02, output_potential=True,
                      force_test=0.05, ngravs_en=16)
    mesh = make_mesh(8)
    sim = DistributedSimulation(cfg, p, sph=sph, mesh=mesh,
                                log_dir=str(tmp_path), entropy_is_u=True,
                                cand_cap=1024, fcap=16384)
    sim.run(max_steps=6)
    assert sim.time > 0 and sim.step_count == 6
    pg, sg = sim.gather_ordered()
    # original order restored: IDs match the input layout exactly
    np.testing.assert_array_equal(pg.pid, np.asarray(p.pid))
    assert np.isfinite(pg.accel).all()
    gas = pg.ptype == 0
    assert (sg.density[gas] > 0).all()
    # snapshot written PER SHARD (no full gather, io.c:94-112) and the
    # multi-file set reassembles to all particles
    from ngravs_tpu.io.gadget_format import read_snapshot_set
    snaps = sorted(f for f in os.listdir(tmp_path) if f.startswith("snap"))
    assert snaps, os.listdir(tmp_path)
    assert any(f.endswith(".0") for f in snaps), snaps  # one file per shard
    base = os.path.join(tmp_path, snaps[0].rsplit(".", 1)[0])
    data = read_snapshot_set(base)
    assert data.header.npart.sum() == p.pos.shape[0]
    assert sorted(np.asarray(data.pid)) == sorted(np.asarray(p.pid))
    assert np.isfinite(data.u).all() and (data.u > 0).all()
    # OUTPUTPOTENTIAL: POT block present, finite, includes the PM part
    assert data.pot is not None and np.isfinite(data.pot).all()
    assert np.abs(data.pot).max() > 0
    # energy log written
    elines = open(os.path.join(tmp_path, cfg.energy_file)).readlines()
    assert len(elines) >= 1
    # distributed FORCETEST: direct-oracle rows written on PM steps, and
    # the short-range + PM split reproduces the exact periodic force
    ft = os.path.join(tmp_path, "forcetest.txt")
    assert os.path.exists(ft)
    rows = np.loadtxt(ft).reshape(-1, 12)
    assert rows.shape[0] >= 1
    ad = rows[:, 5:8]
    at = rows[:, 8:11]
    rel = np.linalg.norm(at - ad, axis=1) \
        / np.maximum(np.linalg.norm(ad, axis=1), 1e-30)
    assert np.sqrt((rel ** 2).mean()) < 0.05, rel
    # restart dump round-trips through numpy
    path = sim.save_restart()
    z = np.load(path)
    assert int(z["ti_current"]) == sim.ti_current
    assert z["p_pos"].shape == (p.pos.shape[0], 3)


@pytest.mark.slow
def test_distributed_restart_roundtrip(tmp_path):
    """Distributed restart: save after k steps, resume in a fresh driver,
    and the continued trajectory matches an uninterrupted run."""
    from ngravs_tpu.parallel.runner import DistributedSimulation

    def make(td):
        cfg, p, sph = _gas_halo_system(n_gas=512, n_halo=512)
        cfg = cfg.replace(output_dir=str(td), time_max=0.02)
        return cfg, p, sph

    mesh = make_mesh(8)
    cfg, p, sph = make(tmp_path)
    simA = DistributedSimulation(cfg, p, sph=sph, mesh=mesh,
                                 log_dir=str(tmp_path), entropy_is_u=True,
                                 cand_cap=1024, fcap=16384)
    simA.run(max_steps=3)
    path = simA.save_restart()
    simA.run(max_steps=2)
    pA, sA = simA.gather_ordered()

    cfg2, p2, sph2 = make(tmp_path)
    simB = DistributedSimulation(cfg2, p2, sph=sph2, mesh=mesh,
                                 log_dir="", cand_cap=simA.cand_cap,
                                 fcap=16384)
    simB.resume(path)
    simB.run(max_steps=2)
    pB, sB = simB.gather_ordered()

    assert simB.step_count == simA.step_count
    assert simB.ti_current == simA.ti_current
    np.testing.assert_array_equal(pB.pid, pA.pid)
    np.testing.assert_allclose(pB.pos, pA.pos, atol=1e-6)
    np.testing.assert_allclose(pB.vel, pA.vel, atol=1e-6)
    np.testing.assert_allclose(sB.entropy, sA.entropy, rtol=1e-6)


def test_sharded_dt_displacement_matches_single_chip():
    """The cross-shard RMS-displacement constraint must equal the
    single-chip computation (find_dt_displacement_constraint,
    timestep.c:587-651)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.parallel.mesh import AXIS, sharded_dt_displacement
    from ngravs_tpu.particles import SphState

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cosmological import _cosmo_box

    cfg, p, sph = _cosmo_box(n_side=8)
    sim = Simulation(cfg, particles=p, sph=sph, log_dir="")
    ref = float(sim._dt_disp(p, cfg.time_begin))
    assert ref < cfg.max_size_timestep  # the constraint actually binds

    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    units = set_units(cfg)
    fn = jax.jit(jax.shard_map(
        lambda q: sharded_dt_displacement(cfg, units, q, cfg.time_begin),
        mesh=mesh, in_specs=(P(AXIS),), out_specs=P(), check_vma=False))
    got = float(fn(ps))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sharded_periodic_puretree_has_ewald():
    """Periodic pure-tree sharded step must include the lattice (Ewald)
    correction (begrun.c:47-49): forces match the single-chip solver,
    and differ from a naive minimum-image tree walk."""
    from ngravs_tpu.ops.solver import GravitySolver
    from ngravs_tpu.parallel.tree_sharded import make_sharded_tree_step

    box = 1.0
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.01,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box, ngravs_en=16,
        tree_depth=5, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4, wiring="newton")
    rng = np.random.default_rng(21)
    n = 512
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    p = Particles.create(pos, np.zeros((n, 3), np.float32),
                         np.full(n, 1.0 / n, np.float32), np.arange(n),
                         np.ones(n, np.int32), cfg.type_to_grav)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)

    solver = GravitySolver(cfg, wiring, np.array(cfg.softening) * SOFTFAC_SPLINE,
                           np.array(cfg.softening), units.G)
    p_ref, _, _ = solver.compute(p, 0, n, opening="bh")
    acc_ref = np.asarray(p_ref.accel)

    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    step = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=ps.pos.shape[0] // 8,
                                  opening="bh")
    p_out, _, ovf = step(ps, 0, 0, cfg.time_begin)
    assert not bool(ovf)
    acc_sh = np.asarray(jax.device_get(p_out.accel))[:n]
    scale = np.abs(acc_ref).max()
    # same tree geometry + same Ewald tables -> near-identical forces
    np.testing.assert_allclose(acc_sh, acc_ref, atol=3e-3 * scale)


@pytest.mark.slow
def test_sharded_tree_step_treepm_collisionless():
    """Collisionless distributed TreePM: the sharded tree step under PMGRID
    must do the Rcut-truncated short-range walk + sharded-FFT long-range
    force (pm_periodic.c:204 + forcetree.c:1623), matching the single-chip
    TreePM solver — not a full-range tree walk."""
    from ngravs_tpu.ops.solver import GravitySolver
    from ngravs_tpu.parallel.tree_sharded import make_sharded_tree_step

    box = 1.0
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.005,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box, pmgrid=16,
        tree_depth=5, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4, wiring="newton")
    rng = np.random.default_rng(33)
    n = 1024
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    p = Particles.create(pos, np.zeros((n, 3), np.float32),
                         np.full(n, 1.0 / n, np.float32), np.arange(n),
                         np.ones(n, np.int32), cfg.type_to_grav)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)

    solver = GravitySolver(cfg, wiring,
                           np.array(cfg.softening) * SOFTFAC_SPLINE,
                           np.array(cfg.softening), units.G)
    p_ref, _, _ = solver.compute(p, 0, n, opening="bh")
    acc_ref = np.asarray(p_ref.accel) + np.asarray(solver.pm_forces(p))

    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    step = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=ps.pos.shape[0] // 8,
                                  opening="bh", pm_step=True)
    p_out, _, ovf, pm_beg, pm_end = step(ps, 0, 0, cfg.time_begin, 0, 0)
    assert not bool(ovf)
    assert int(pm_end) > 0
    acc_sh = (np.asarray(jax.device_get(p_out.accel))
              + np.asarray(jax.device_get(p_out.accel_pm)))[:n]
    scale = np.abs(acc_ref).max()
    np.testing.assert_allclose(acc_sh, acc_ref, atol=3e-3 * scale)


@pytest.mark.slow
def test_distributed_matches_single_chip_trajectory():
    """Integrator parity: 6 steps of gas+halo TreePM+SPH through the
    DistributedSimulation match the single-chip Simulation (both on the
    reference's PM integer timeline) to tight tolerances."""
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.parallel.runner import DistributedSimulation

    cfg, p, sph = _gas_halo_system(n_gas=512, n_halo=512)
    simA = Simulation(cfg, particles=p, sph=sph, log_dir="")
    simA.run(max_steps=6)
    posA = np.asarray(simA.p.pos)
    velA = np.asarray(simA.p.vel)
    oA = np.argsort(np.asarray(simA.p.pid))

    cfg2, p2, sph2 = _gas_halo_system(n_gas=512, n_halo=512)
    simB = DistributedSimulation(cfg2, p2, sph=sph2, mesh=make_mesh(8),
                                 log_dir="", entropy_is_u=True,
                                 cand_cap=1024, fcap=16384)
    simB.run(max_steps=6)
    pB, _ = simB.gather_ordered()
    oB = np.argsort(pB.pid)

    assert np.isclose(float(simA.time), simB.time)
    box = cfg.box_size
    vscale = np.abs(velA).max()
    assert np.abs(posA[oA] - pB.pos[oB]).max() < 3e-4 * box
    assert np.abs(velA[oA] - pB.vel[oB]).max() < 1e-2 * vscale


@pytest.mark.slow
def test_let_tree_step_matches_replicated():
    """LET-mode sharded gravity (make_let_tree_step: local trees +
    sender-driven essential-row exchange, forcetree.c:345-431/766-819
    analog) must reproduce the replicated-tree step's accelerations.
    Per-shard memory in LET mode is o(N_total): no all_gather of the
    particle set exists anywhere in its program."""
    import jax
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.cosmology import make_tables
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.parallel.mesh import make_mesh, shard_particles
    from ngravs_tpu.parallel.tree_sharded import (make_let_tree_step,
                                                  make_sharded_tree_step,
                                                  reshard_by_morton)
    from ngravs_tpu.particles import Particles
    from ngravs_tpu.units import set_units

    rng = np.random.default_rng(11)
    n = 4096
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.8,) * 6, max_size_timestep=0.005,
        periodic=False, box_size=1000.0, n_gravs=2,
        type_to_grav=(0, 1, 0, 0, 0, 0), wiring="newton_yukawa",
        tree_depth=7, err_tol_theta=0.4)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    centers = rng.uniform(200, 800, (6, 3))
    k = rng.integers(0, 6, n)
    pos = (centers[k] + rng.normal(0, 25.0, (n, 3))).astype(np.float32)
    vel = rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    ptype = rng.integers(1, 3, n).astype(np.int32)
    p = Particles.create(pos, vel, np.full(n, 1.0 / n, np.float32),
                         np.arange(n), ptype, cfg.type_to_grav)
    p = p.replace(ti_endstep=jnp.full((n,), 8, jnp.int32))

    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    ps = reshard_by_morton(ps, mesh)
    nloc = ps.pos.shape[0] // 8

    step_rep = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                      n_local=nloc, opening="bh")
    step_let = make_let_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, opening="bh")
    pr, me_r, ovf_r = step_rep(ps, 0, 8, cfg.time_begin + 1e-4)
    pl, me_l, ovf_l = step_let(ps, 0, 8, cfg.time_begin + 1e-4)
    assert not bool(ovf_r) and not bool(ovf_l)
    ar = np.asarray(pr.accel)
    al = np.asarray(pl.accel)
    live = np.asarray(ps.pid) >= 0
    rel = (np.linalg.norm(al - ar, axis=1)
           / np.maximum(np.linalg.norm(ar, axis=1), 1e-12))[live]
    # both are BH-walk approximations of the same field; the LET cut is
    # at least as refined as the replicated walk's block tests
    assert np.sqrt((rel ** 2).mean()) < 2e-2, np.sqrt((rel ** 2).mean())
    assert int(me_l) == int(me_r)


def _collisionless_cfg(**kw):
    base = dict(
        time_begin=0.0, time_max=2.0, gravity_constant_internal=1.0,
        softening=(0.02,) * 6, max_size_timestep=0.02,
        n_gravs=1, type_to_grav=(0,) * 6, wiring="newton",
        err_tol_int_accuracy=0.02)
    base.update(kw)
    return SimulationConfig(**base)


def _small_halo(n=768, seed=11):
    """Centrally-concentrated blob: accelerations (hence criterion-0
    timesteps) spread over decades, so the step hierarchy is non-trivial."""
    rng = np.random.default_rng(seed)
    r = 0.05 + 3.0 * rng.random(n) ** 3
    u = rng.normal(size=(n, 3))
    pos = 5.0 + r[:, None] * u / np.linalg.norm(u, axis=1, keepdims=True)
    vel = rng.normal(0, 0.05, (n, 3))
    return pos, vel


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["flexsteps", "pseudosymmetric"])
def test_distributed_special_timestep_modes(mode):
    """FLEXSTEPS / PSEUDOSYMMETRIC on the 8-device mesh (timestep.c:85-246
    under MPI in the reference; make_mode_kick here): the sharded run
    advances the integer timeline with per-particle steps and stays
    finite.  FLEXSTEPS must produce step ends OFF the power-of-two grid
    (its entire point, timestep.c:196-199)."""
    from ngravs_tpu.parallel.runner import DistributedSimulation

    cfg = _collisionless_cfg(**{mode: True})
    pos, vel = _small_halo()
    n = pos.shape[0]
    p = Particles.create(pos, vel, np.full(n, 1.0 / n), np.arange(n),
                         np.ones(n, np.int32), cfg.type_to_grav)
    sim = DistributedSimulation(cfg, p, mesh=make_mesh(8))
    sim.run(max_steps=6)
    assert sim.step_count >= 3 and sim.ti_current > 0
    ends = np.asarray(jax.device_get(sim.p.ti_endstep))
    pid = np.asarray(jax.device_get(sim.p.pid))
    live = pid >= 0
    assert np.isfinite(np.asarray(jax.device_get(sim.p.pos))[live]).all()
    assert (ends[live] > 0).all()
    if mode == "flexsteps":
        # the defining FLEXSTEPS property (timestep.c:196-199): step ends
        # sit on per-ID phase-shifted grids, so SOME particle's end is
        # NOT aligned to its own step size — impossible under
        # SYNCHRONIZATION, where end % (end - beg) == 0 always
        begs = np.asarray(jax.device_get(sim.p.ti_begstep))
        steps = ends[live] - begs[live]
        ok = steps > 0
        assert ((ends[live][ok] % steps[ok]) != 0).any()


@pytest.mark.slow
def test_distributed_makeglass():
    """MAKEGLASS over the mesh (timestep.c:85-133): reversed-gravity
    displacement with the global pmax clamp; velocities stay zero and
    particles move toward uniformity."""
    from ngravs_tpu.parallel.runner import DistributedSimulation

    cfg = _collisionless_cfg(
        make_glass=True, periodic=True, box_size=10.0,
        comoving_integration=True, omega0=1.0, omega_lambda=0.0,
        hubble_param=1.0, time_begin=0.1, time_max=0.2,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30)
    rng = np.random.default_rng(5)
    n = 512
    pos = rng.uniform(0, 10.0, (n, 3))
    p = Particles.create(pos, np.zeros((n, 3)), np.full(n, 1.0 / n),
                         np.arange(n), np.ones(n, np.int32),
                         cfg.type_to_grav)
    sim = DistributedSimulation(cfg, p, mesh=make_mesh(8))
    pid0 = np.asarray(jax.device_get(sim.p.pid)).copy()
    p0 = np.asarray(jax.device_get(sim.p.pos)).copy()
    by_id0 = {int(i): p0[k] for k, i in enumerate(pid0) if i >= 0}
    sim.run(max_steps=3)
    live = np.asarray(jax.device_get(sim.p.pid)) >= 0
    pid1 = np.asarray(jax.device_get(sim.p.pid))
    pos1 = np.asarray(jax.device_get(sim.p.pos))
    vel1 = np.asarray(jax.device_get(sim.p.vel))
    assert np.abs(vel1[live]).max() == 0.0
    assert np.isfinite(pos1[live]).all()
    moved = [np.abs(pos1[k] - by_id0[int(i)]).max()
             for k, i in enumerate(pid1) if i >= 0]
    assert max(moved) > 0


@pytest.mark.slow
def test_let_treepm_step_and_driver():
    """LET-mode TreePM (gravtree.c:102-285 + pm_periodic.c:204): the
    sender-driven short-range exchange + sharded-FFT long range must match
    the replicated-tree TreePM step to tree accuracy, and the
    DistributedSimulation driver must run multi-step in LET mode."""
    from ngravs_tpu.parallel.runner import DistributedSimulation
    from ngravs_tpu.parallel.tree_sharded import (
        make_let_tree_step, make_sharded_tree_step, reshard_by_morton)
    from ngravs_tpu.parallel.mesh import shard_particles

    box = 50.0
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.2,) * 6, max_size_timestep=0.005,
        n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0),
        wiring="newton_yukawa", periodic=True, box_size=box, pmgrid=32,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30)
    rng = np.random.default_rng(9)
    n = 2048
    pos = rng.uniform(0, box, (n, 3))
    p = Particles.create(pos, rng.normal(0, 0.01, (n, 3)),
                         np.full(n, 1.0 / n), np.arange(n),
                         rng.integers(1, 3, n), cfg.type_to_grav)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    mesh = make_mesh(8)
    ps = reshard_by_morton(shard_particles(p, mesh), mesh)
    nloc = ps.pos.shape[0] // 8

    step_rep = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                      n_local=nloc, opening="bh",
                                      pm_step=True)
    step_let = make_let_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, opening="bh",
                                  pm_step=True)
    pr, _, ovf_r, *_ = step_rep(ps, 0, 8, cfg.time_begin, 0, 8)
    pl, _, ovf_l, *_ = step_let(ps, 0, 8, cfg.time_begin, 0, 8)
    assert not bool(ovf_r) and not bool(ovf_l)
    live = np.asarray(ps.pid) >= 0
    ar = np.asarray(pr.accel) + np.asarray(pr.accel_pm)
    al = np.asarray(pl.accel) + np.asarray(pl.accel_pm)
    rel = (np.linalg.norm(al - ar, axis=1)
           / np.maximum(np.linalg.norm(ar, axis=1), 1e-12))[live]
    assert np.sqrt((rel ** 2).mean()) < 2e-2, np.sqrt((rel ** 2).mean())

    # driver end-to-end in LET mode
    sim = DistributedSimulation(cfg, p, mesh=mesh, use_let=True)
    sim.run(max_steps=4)
    assert sim.step_count == 4 and sim.ti_current > 0
    live2 = np.asarray(jax.device_get(sim.p.pid)) >= 0
    assert np.isfinite(np.asarray(jax.device_get(sim.p.pos))[live2]).all()


@pytest.mark.slow
def test_distributed_scale_1e5_treepm_restart(tmp_path):
    """Realistic-occupancy multi-chip correctness (>=1e5 particles):
    cost-balanced resharding -> LET-mode sharded TreePM steps -> exact
    restart round-trip, on the 8-device CPU mesh.  The reference's
    balance machinery is domain.c:347-467; restart is restart.c:35."""
    import os

    from ngravs_tpu.parallel.runner import DistributedSimulation
    from ngravs_tpu.parallel.tree_sharded import reshard_by_cost

    box = 100.0
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.1,) * 6, max_size_timestep=0.002,
        n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0),
        wiring="newton_yukawa", periodic=True, box_size=box, pmgrid=32,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30)
    rng = np.random.default_rng(17)
    n = 100_000
    # clustered box: clump sizes drive real per-block demand variance
    nclump = 64
    centers = rng.uniform(0, box, (nclump, 3))
    k = rng.integers(0, nclump, n)
    pos = np.mod(centers[k] + rng.normal(0, 0.03 * box, (n, 3)), box)
    p = Particles.create(pos, rng.normal(0, 0.01, (n, 3)),
                         np.full(n, 1.0 / n), np.arange(n),
                         rng.integers(1, 3, n), cfg.type_to_grav)
    mesh = make_mesh(8)
    sim = DistributedSimulation(cfg, p, mesh=mesh, use_let=True,
                                log_dir=str(tmp_path))
    sim.run(max_steps=2)
    assert sim.step_count == 2

    # measured-cost balance at 1e5 occupancy with zero overflows
    cost = np.asarray(jax.device_get(sim.p.grav_cost))
    pid = np.asarray(jax.device_get(sim.p.pid))
    assert (cost[pid >= 0] > 0).any()
    ps2, _ = reshard_by_cost(sim.p, mesh, alloc_factor=1.25, box=box)
    n_dev, cap = 8, ps2.pos.shape[0] // 8
    live2 = (np.asarray(jax.device_get(ps2.pid)) >= 0).reshape(n_dev, cap)
    c2 = np.asarray(jax.device_get(ps2.grav_cost)).reshape(n_dev, cap)
    work = ((1.0 + c2) * live2).sum(axis=1)
    ideal = work.sum() / n_dev
    assert work.max() / ideal < 1.3, work / ideal

    # exact restart round-trip: a resumed twin reproduces the next step
    path = sim.save_restart(os.path.join(str(tmp_path), "restart.npz"))
    sim.step()
    end_a = {int(i): r for i, r in zip(
        np.asarray(jax.device_get(sim.p.pid)),
        np.asarray(jax.device_get(sim.p.pos))) if i >= 0}

    sim2 = DistributedSimulation(cfg, p, mesh=mesh, use_let=True,
                                 log_dir=str(tmp_path))
    sim2.resume(path)
    sim2.step()
    pid_b = np.asarray(jax.device_get(sim2.p.pid))
    pos_b = np.asarray(jax.device_get(sim2.p.pos))
    err = max(np.abs(pos_b[k] - end_a[int(i)]).max()
              for k, i in enumerate(pid_b) if i >= 0)
    assert err == 0.0, err


@pytest.mark.slow
def test_let_periodic_pure_tree_matches_replicated():
    """Periodic pure-tree LET (pmgrid=0, box>0): the local walk runs its
    Ewald lattice pass and the remote LET rows get the same correction in
    the dense eval (forcetree.c:2077-2432) — accelerations must match the
    replicated-tree step, which has applied the correction since round 3."""
    import jax
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.cosmology import make_tables
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.parallel.mesh import make_mesh, shard_particles
    from ngravs_tpu.parallel.tree_sharded import (make_let_tree_step,
                                                  make_sharded_tree_step,
                                                  reshard_by_morton)
    from ngravs_tpu.particles import Particles
    from ngravs_tpu.units import set_units

    rng = np.random.default_rng(13)
    n = 4096
    box = 1000.0
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.8,) * 6, max_size_timestep=0.005,
        periodic=True, box_size=box, n_gravs=2,
        type_to_grav=(0, 1, 0, 0, 0, 0), wiring="newton_yukawa",
        tree_depth=7, err_tol_theta=0.4, ngravs_en=16)
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    centers = rng.uniform(0, box, (6, 3))
    k = rng.integers(0, 6, n)
    pos = np.mod(centers[k] + rng.normal(0, 25.0, (n, 3)),
                 box).astype(np.float32)
    vel = rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    ptype = rng.integers(1, 3, n).astype(np.int32)
    p = Particles.create(pos, vel, np.full(n, 1.0 / n, np.float32),
                         np.arange(n), ptype, cfg.type_to_grav)
    p = p.replace(ti_endstep=jnp.full((n,), 8, jnp.int32))

    mesh = make_mesh(8)
    ps = shard_particles(p, mesh)
    ps = reshard_by_morton(ps, mesh)
    nloc = ps.pos.shape[0] // 8

    step_rep = make_sharded_tree_step(cfg, units, wiring, tables, mesh,
                                      n_local=nloc, opening="bh")
    step_let = make_let_tree_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, opening="bh")
    pr, me_r, ovf_r = step_rep(ps, 0, 8, cfg.time_begin + 1e-4)
    pl, me_l, ovf_l = step_let(ps, 0, 8, cfg.time_begin + 1e-4)
    assert not bool(ovf_r) and not bool(ovf_l)
    ar = np.asarray(pr.accel)
    al = np.asarray(pl.accel)
    live = np.asarray(ps.pid) >= 0
    rel = (np.linalg.norm(al - ar, axis=1)
           / np.maximum(np.linalg.norm(ar, axis=1), 1e-12))[live]
    assert np.sqrt((rel ** 2).mean()) < 2e-2, np.sqrt((rel ** 2).mean())
    assert int(me_l) == int(me_r)


@pytest.mark.slow
def test_let_full_step_treepm_sph_matches_replicated():
    """LET full step (make_let_full_step: local trees, sender-driven LET
    gravity exchange + SPH ghost exchange — density.c:115-285 /
    hydra.c:124-304 export symmetry) must reproduce the replicated-tree
    full step on the config-5 structure (TreePM + SPH).  No all_gather of
    the particle set exists anywhere in its program."""
    from ngravs_tpu.parallel.full_let_sharded import make_let_full_step
    from ngravs_tpu.parallel.full_sharded import make_sharded_full_step
    from ngravs_tpu.parallel.tree_sharded import reshard_by_cost

    cfg, p, sph = _gas_halo_system()
    units = set_units(cfg)
    wiring = build_wiring(cfg)
    tables = make_tables(cfg, units)
    n_dev = 8
    mesh = make_mesh(n_dev)
    # LET locality: shards own contiguous Morton ranges (cost-less
    # reshard_by_cost = count-balanced Morton decomposition)
    ps, sphs = reshard_by_cost(p, mesh, sph=sph)
    nloc = ps.pos.shape[0] // n_dev

    step_rep = make_sharded_full_step(cfg, units, wiring, tables, mesh,
                                      n_local=nloc, node_list_cap=16384,
                                      leaf_list_cap=16384, leaf_factor=8.0,
                                      opening="bh", pm_step=True)
    step_let = make_let_full_step(cfg, units, wiring, tables, mesh,
                                  n_local=nloc, opening="bh",
                                  pm_step=True)
    pr, sr, end_r, ovf_r, _, pmend_r = step_rep(ps, sphs, 0, 0,
                                                cfg.time_begin, 0, 0)
    pl, sl, end_l, ovf_l, _, pmend_l = step_let(ps, sphs, 0, 0,
                                                cfg.time_begin, 0, 0)
    assert not bool(ovf_r) and not bool(ovf_l)
    assert int(end_l) == int(end_r) > 0
    assert int(pmend_l) == int(pmend_r) > 0

    live = np.asarray(ps.pid) >= 0
    gas = (np.asarray(ps.ptype) == 0) & live
    # density / smoothing length: both sides sum the SAME exact neighbor
    # sets (replicated candidates vs local + ghost rows)
    np.testing.assert_allclose(np.asarray(sl.density)[gas],
                               np.asarray(sr.density)[gas], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(sl.hsml)[gas],
                               np.asarray(sr.hsml)[gas], rtol=2e-3)
    # hydro pair force (exact pair sums; f32 ordering noise)
    ha_r = np.asarray(sr.hydro_accel)[gas]
    ha_l = np.asarray(sl.hydro_accel)[gas]
    scale_h = np.abs(ha_r).max() + 1e-30
    np.testing.assert_allclose(ha_l, ha_r, atol=3e-3 * scale_h)
    # gravity: two BH approximations of the same field (different trees)
    ar = np.asarray(pr.accel)[live]
    al = np.asarray(pl.accel)[live]
    rel = (np.linalg.norm(al - ar, axis=1)
           / np.maximum(np.linalg.norm(ar, axis=1), 1e-12))
    assert np.sqrt((rel ** 2).mean()) < 2e-2, np.sqrt((rel ** 2).mean())
    # PM long-range identical
    np.testing.assert_allclose(np.asarray(pl.accel_pm)[live],
                               np.asarray(pr.accel_pm)[live],
                               atol=1e-5 * np.abs(
                                   np.asarray(pr.accel_pm)[live]).max())

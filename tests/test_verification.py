"""Verification machinery: FORCETEST harness, restart round-trip,
stop-file interruption — the reference's gravtree_forcetest.c / restart.c /
run.c:67-125 behaviors."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.diagnostics.forcetest import force_test, rms_error
from ngravs_tpu.integrate.runner import Simulation
from ngravs_tpu.particles import Particles


def _small_sim(tmp_path=None, n=1200, **kw):
    rng = np.random.default_rng(5)
    base = dict(
        time_begin=0.0, time_max=0.5, gravity_constant_internal=1.0,
        softening=(0.05,) * 6, max_size_timestep=0.005,
        tree_depth=7, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0, wiring="newton")
    base.update(kw)
    cfg = SimulationConfig(**base)
    pos = np.concatenate([rng.normal(0, 1.0, (n // 2, 3)),
                          rng.normal(4, 0.5, (n - n // 2, 3))]).astype(np.float32)
    vel = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    p = Particles.create(pos, vel, np.full(n, 1e-3, np.float32),
                         np.arange(n), np.ones(n, np.int32), cfg.type_to_grav)
    return Simulation(cfg, particles=p,
                      log_dir=str(tmp_path) if tmp_path else "")


def test_forcetest_accuracy_gate(tmp_path):
    """Tree forces vs direct summation: the FORCETEST harness reports rms
    relative error under the ErrTolForceAcc target."""
    sim = _small_sim(tmp_path)
    sim.compute_forces(full=True)
    idx, acc_d, acc_s, rel = force_test(sim, fraction=0.2)
    stats = rms_error(rel)
    assert stats["rms"] < 5e-3
    # forcetest.txt written with the reference's column layout
    path = os.path.join(str(tmp_path), "forcetest.txt")
    assert os.path.exists(path)
    row = open(path).readline().split()
    assert len(row) == 12


def test_restart_roundtrip(tmp_path):
    """restart(0)/restart(1): resumed trajectories continue identically."""
    sim = _small_sim(tmp_path)
    sim.run(max_steps=3)
    path = sim.save_restart()
    # continue the original
    sim.run(max_steps=2)
    pos_ref = np.asarray(sim.p.pos).copy()
    ti_ref = sim.ti_current
    # resume a fresh instance from the file and take the same steps
    sim2 = _small_sim(tmp_path)
    sim2.resume(path)
    sim2.run(max_steps=2)
    assert sim2.ti_current == ti_ref
    np.testing.assert_array_equal(np.asarray(sim2.p.pos), pos_ref)


def test_stop_file_interrupt(tmp_path):
    """A `stop` file in the output dir halts the loop and writes a restart
    checkpoint (run.c:71-76)."""
    sim = _small_sim(tmp_path)
    open(os.path.join(str(tmp_path), "stop"), "w").close()
    sim.run(max_steps=10)
    assert sim.step_count <= 2
    assert os.path.exists(os.path.join(str(tmp_path),
                                       sim.cfg.restart_file + ".npz"))


def test_restart_timemax_extension(tmp_path):
    """Resume with a larger TimeMax rescales the integer timeline by
    power-of-two halvings (readjust_timebase, begrun.c:821-864) and the run
    continues to the new end time."""
    sim = _small_sim(tmp_path)
    sim.run(max_steps=3)
    path = sim.save_restart()
    t_at_ckpt = sim.time
    ti_old = sim.ti_current

    # resume into a run with TimeMax tripled (old span 0.5 -> new span 1.5,
    # needs 2 halvings: timeline then covers 0.5 * 4 = 2.0)
    sim2 = _small_sim(tmp_path, time_max=1.5)
    sim2.resume(path)
    assert sim2.cfg.timeline_time_max == pytest.approx(2.0)
    assert sim2.ti_current == ti_old >> 2
    # tick rescale preserves physical time
    assert sim2.time == pytest.approx(t_at_ckpt, rel=1e-9, abs=1e-12)
    np.testing.assert_array_equal(np.asarray(sim2.p.ti_endstep),
                                  np.asarray(sim.p.ti_endstep) >> 2)

    # and the run terminates at the REQUESTED TimeMax, not the timeline end
    sim2.cfg = sim2.cfg.replace(max_size_timestep=0.2)
    sim2._build_kernels()
    sim2.run()
    # the loop-top Time>TimeMax check (run.c:32) permits at most one step of
    # overshoot past the requested TimeMax
    assert sim2.time <= 1.5 + 0.2
    assert sim2.time > 1.4


def test_restart_timemax_shrink(tmp_path):
    """Resume with a smaller TimeMax keeps the old timeline and stops
    early on Time > TimeMax (run.c:32)."""
    sim = _small_sim(tmp_path)
    sim.run(max_steps=3)
    path = sim.save_restart()
    sim2 = _small_sim(tmp_path, time_max=0.25, max_size_timestep=0.05)
    sim2.resume(path)
    assert sim2.cfg.timeline_time_max == pytest.approx(0.5)
    assert sim2.ti_current == sim.ti_current  # no rescale
    sim2.run()
    # at most one step of overshoot past TimeMax (loop-top check, run.c:32)
    assert sim2.time <= 0.25 + 0.05


def test_yukawa_forcetest_two_body_exact():
    """NGRAVS_YUKAWA_FORCETEST wiring (ngravs.c:213-282): same-type force
    is off, cross force is pure Yukawa, so the two-body answer is known in
    closed form — the reference's pathological TreePM-transition config."""
    import jax.numpy as jnp

    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.ops.solver import GravitySolver
    from ngravs_tpu.particles import Particles
    from ngravs_tpu.units import set_units

    box = 10000.0
    cfg = SimulationConfig(
        n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0), wiring="yukawa",
        softening=(1.0,) * 6, gravity_constant_internal=1.0,
        box_size=box)
    units = set_units(cfg)
    w = build_wiring(cfg)
    d = 50.0
    pos = np.array([[100.0, 100, 100], [100 + d, 100, 100]], np.float32)
    p = Particles.create(pos, np.zeros((2, 3)), [3.0, 5.0], [1, 2], [1, 2],
                         cfg.type_to_grav)
    solver = GravitySolver(cfg, w, np.array(cfg.softening) * 2.8,
                           np.array(cfg.softening), units.G)
    p2, _, _ = solver.compute(p, 0, 2)
    acc = np.asarray(p2.accel)

    law = w.law(0, 1)
    fac = float(law.force_factor(3.0, 5.0, d * d, d, 1.0 * 2.8, 1))
    expect0 = fac * np.array([d, 0, 0])          # target 0 <- source 1
    np.testing.assert_allclose(acc[0], expect0, rtol=2e-5, atol=1e-12)
    # Newton's 3rd law across the cross pair (mass-symmetric Yukawa)
    np.testing.assert_allclose(acc[1] * 5.0, -acc[0] * 3.0,
                               rtol=2e-5, atol=1e-10)

    # same-type pair: force off
    p_same = Particles.create(pos, np.zeros((2, 3)), [3.0, 5.0], [1, 2],
                              [1, 1], cfg.type_to_grav)
    p3, _, _ = solver.compute(p_same, 0, 2)
    assert np.abs(np.asarray(p3.accel)).max() < 1e-12


@pytest.mark.slow
def test_stock_equivalence(tmp_path):
    """NGRAVS_STOCK_TESTING gate: the rebuild must track the real C
    reference binary (MPI/GSL-stub single-rank build of the unmodified
    sources, Makefile.reference:51-99 stock options + OUTPUTPOTENTIAL)
    on GalaxyCollision — energy.txt component trajectories (global.c:22)
    and final-snapshot displacement, within the documented f32-vs-f64
    chaos tolerances.  Drives tools/stock_equivalence/compare.py, which
    writes stock_equivalence.json and exits nonzero on failure."""
    import subprocess
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable,
         os.path.join(repo, "tools", "stock_equivalence", "compare.py"),
         "--tmax", "0.03", "--workdir", str(tmp_path),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=3500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    res = json.loads(open(tmp_path / "stock_equivalence.json").read())
    assert res["pass"], res

import jax.numpy as jnp
import numpy as np
import pytest

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.constants import SOFTFAC_SPLINE
from ngravs_tpu.models.wiring import build_wiring
from ngravs_tpu.ops.direct import direct_forces, direct_forces_numpy


def _random_system(rng, n, n_gravs=1, soft=0.05):
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    grav = (rng.integers(0, n_gravs, n)).astype(np.int32)
    fsoft = np.full(n, soft * SOFTFAC_SPLINE, np.float32)
    return pos, mass, grav, fsoft


def test_two_body_newton():
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    pos = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    mass = jnp.array([2.0, 3.0])
    grav = jnp.zeros(2, jnp.int32)
    fsoft = jnp.full(2, 1e-4)
    acc, pot = direct_forces(w, pos, mass, grav, fsoft, chunk=2)
    # positive-acceleration convention: particle 0 pulled toward +x
    np.testing.assert_allclose(np.asarray(acc[0]), [3.0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(acc[1]), [-2.0, 0, 0], rtol=1e-5)
    # potential stored with the tree-walk sign convention: -sm/r
    np.testing.assert_allclose(np.asarray(pot), [-3.0, -2.0], rtol=1e-5)


def test_vs_numpy_oracle_newton(rng):
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    pos, mass, grav, fsoft = _random_system(rng, 257)
    acc, pot = direct_forces(w, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft), chunk=64)
    acc_np, pot_np = direct_forces_numpy(w, pos, mass, grav, fsoft)
    scale = np.abs(acc_np).max()
    np.testing.assert_allclose(np.asarray(acc), acc_np, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(pot), pot_np, rtol=2e-4)


def test_vs_numpy_oracle_multigravity(rng):
    cfg = SimulationConfig(n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0),
                           wiring="newton_yukawa", box_size=2.0)
    w = build_wiring(cfg)
    pos, mass, grav, fsoft = _random_system(rng, 150, n_gravs=2)
    acc, pot = direct_forces(w, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft), chunk=50)
    acc_np, pot_np = direct_forces_numpy(w, pos, mass, grav, fsoft)
    scale = np.abs(acc_np).max()
    np.testing.assert_allclose(np.asarray(acc), acc_np, atol=2e-5 * scale)


def test_momentum_conservation(rng):
    """Newton's 3rd law: total force sums to zero (equal masses per pair law)."""
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    pos, mass, grav, fsoft = _random_system(rng, 128)
    acc, _ = direct_forces(w, jnp.asarray(pos), jnp.asarray(mass),
                           jnp.asarray(grav), jnp.asarray(fsoft), chunk=128)
    ptot = np.asarray(mass[:, None] * np.asarray(acc)).sum(0)
    scale = np.abs(np.asarray(acc)).max() * mass.max()
    assert np.all(np.abs(ptot) < 1e-3 * scale)


def test_softened_pair_matches_spline():
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    h = 1.0
    r = 0.3
    pos = jnp.array([[0.0, 0, 0], [r, 0, 0]])
    mass = jnp.array([1.0, 1.0])
    acc, _ = direct_forces(w, pos, mass, jnp.zeros(2, jnp.int32),
                           jnp.full(2, h), chunk=2)
    from ngravs_tpu.models.laws import plummer_spline
    expect = float(plummer_spline(1.0, h, r)) * r
    np.testing.assert_allclose(float(acc[0, 0]), expect, rtol=1e-5)


def test_target_subset_and_padding(rng):
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    pos, mass, grav, fsoft = _random_system(rng, 100)
    args = (jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav), jnp.asarray(fsoft))
    acc_all, _ = direct_forces(w, *args, chunk=32)
    sel = jnp.array([3, 17, 42, 99, -1, -1], jnp.int32)
    acc_sub, _ = direct_forces(w, *args, tgt_idx=sel, chunk=4)
    np.testing.assert_allclose(np.asarray(acc_sub[:4]),
                               np.asarray(acc_all)[[3, 17, 42, 99]], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(acc_sub[4:]), 0)


def test_periodic_minimum_image():
    cfg = SimulationConfig(wiring="newton")
    w = build_wiring(cfg)
    box = 10.0
    # two particles separated by 9.5 along x: nearest image is 0.5 the other way
    pos = jnp.array([[0.25, 5, 5], [9.75, 5, 5]])
    mass = jnp.array([1.0, 1.0])
    acc, _ = direct_forces(w, pos, mass, jnp.zeros(2, jnp.int32),
                           jnp.full(2, 1e-3), box=box, chunk=2)
    assert float(acc[0, 0]) < 0  # pulled in -x across the boundary
    np.testing.assert_allclose(float(acc[0, 0]), -1.0 / 0.25, rtol=1e-4)

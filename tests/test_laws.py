import numpy as np
import pytest

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.constants import BAM_EPSILON, YUKAWA_IMASS
from ngravs_tpu.models import laws as L
from ngravs_tpu.models.wiring import GravityWiring, build_wiring


def test_newtonian_values():
    n = L.Newtonian()
    # AccelFxns semantics: accel(tm, sm, r2, r, 1) = sm / r2
    assert np.isclose(float(n.accel(1.0, 2.0, 4.0, 2.0, 1)), 0.5)
    assert np.isclose(float(n.potential(1.0, 2.0, 4.0, 2.0, 1)), 1.0)
    # force_factor = sm/r^3 outside the softening
    assert np.isclose(float(n.force_factor(1.0, 2.0, 4.0, 2.0, 0.1, 1)), 0.25)


def test_plummer_spline_matches_newton_at_h():
    """Gadget's spline force equals Newton exactly at r = h."""
    n = L.Newtonian()
    h = 1.3
    r = h * (1 - 1e-7)
    spline = float(n.spline(1.0, 1.0, h, r, 1))
    newton = 1.0 / h**3
    assert np.isclose(spline, newton, rtol=1e-4)
    # and the spline potential equals -1/r at the boundary
    spot = float(n.spline_pot(1.0, 1.0, h, h * (1 - 1e-7), 1))
    assert np.isclose(spot, -1.0 / h, rtol=1e-4)


def test_plummer_spline_branch_continuity():
    n = L.Newtonian()
    h = 1.0
    below = float(n.spline(1.0, 1.0, h, 0.5 * h - 1e-7, 1))
    above = float(n.spline(1.0, 1.0, h, 0.5 * h + 1e-7, 1))
    assert np.isclose(below, above, rtol=1e-4)


def test_plummer_spline_finite_at_origin():
    """fac = spline(r=0) is the finite central value 32/3 h^-3; the force
    itself vanishes through the dx factor."""
    n = L.Newtonian()
    assert np.isclose(float(n.spline(1.0, 1.0, 1.0, 0.0, 1)), 32.0 / 3.0, rtol=1e-5)


def test_yukawa_reduces_to_newton_at_small_r():
    box = 10000.0
    y = L.Yukawa(YUKAWA_IMASS, box)
    n = L.Newtonian()
    r = 1e-3 * box / YUKAWA_IMASS
    fy = float(y.accel(1.0, 1.0, r * r, r, 1))
    fn = float(n.accel(1.0, 1.0, r * r, r, 1))
    assert np.isclose(fy, fn, rtol=2e-3)


def test_yukawa_analytic():
    box, m = 100.0, 3.0
    y = L.Yukawa(YUKAWA_IMASS, box)
    ym = YUKAWA_IMASS / box
    r = 2.5
    expect = m * np.exp(-r * ym) * (ym / r + 1.0 / r**2)
    assert np.isclose(float(y.accel(1.0, m, r * r, r, 1)), expect, rtol=1e-6)


def test_coloyuk_is_sum():
    box = 50.0
    cy = L.ColoYuk(YUKAWA_IMASS, box)
    y = L.Yukawa(YUKAWA_IMASS, box)
    n = L.Newtonian()
    r = 1.7
    assert np.isclose(
        float(cy.accel(1.0, 2.0, r * r, r, 1)),
        float(y.accel(1.0, 2.0, r * r, r, 1)) + float(n.accel(1.0, 2.0, r * r, r, 1)),
        rtol=1e-6)


def test_bam_taylor_matches_exact_at_boundary():
    b = L.BamBam(BAM_EPSILON)
    tm = sm = 1e-5
    eta = 4 * np.pi * BAM_EPSILON / (tm + sm)
    for r in [0.099 / eta, 0.101 / eta]:
        # continuity across the Taylor/exact switch at r*eta = 0.1
        lo = float(b.accel(tm, sm, r * r, r * (1 - 1e-6), 1))
        hi = float(b.accel(tm, sm, r * r, r * (1 + 1e-6), 1))
        assert np.isclose(lo, hi, rtol=1e-5)


def test_bam_cross_symmetry():
    """sourcebambaryon(tm=baryon, sm=BAM) == sourcebaryonbam(tm=BAM, sm=baryon)
    with swapped masses (Newton's 3rd law as checked by ngravs_core.c:367-421)."""
    s1 = L.SourceBamBaryon(BAM_EPSILON)
    s2 = L.SourceBaryonBam(BAM_EPSILON)
    mb, mB, r = 2.0, 5.0, 0.3
    a = float(s1.accel(mb, mB, r * r, r, 1))
    b = float(s2.accel(mB, mb, r * r, r, 1))
    assert np.isclose(a, b, rtol=1e-6)


def test_wiring_l3_check_passes_builtin():
    for name in ["newton", "yukawa", "coloyuk", "newton_yukawa"]:
        cfg = SimulationConfig(n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0),
                               wiring=name, box_size=100.0)
        w = build_wiring(cfg)
        assert w.n_gravs == 2


def test_wiring_l3_check_catches_violation():
    bad = GravityWiring([[L.Newtonian(), L.Newtonian()],
                         [L.NegNewtonian(), L.Newtonian()]])
    with pytest.raises(ValueError):
        bad.check_l3_symmetry()


def test_unique_laws_grouping():
    cfg = SimulationConfig(n_gravs=2, type_to_grav=(0, 0, 1, 0, 0, 0),
                           wiring="newton")
    w = build_wiring(cfg)
    groups = w.unique_laws()
    assert len(groups) == 1 and len(groups[0][1]) == 4

    cfg2 = cfg.replace(wiring="newton_yukawa", box_size=10.0)
    w2 = build_wiring(cfg2)
    assert len(w2.unique_laws()) == 2
    m = w2.pair_index_matrix()
    assert m[0, 0] == m[1, 1] and m[0, 1] == m[1, 0] and m[0, 0] != m[0, 1]


def test_three_species_wiring_forces_match_direct():
    """BASELINE config-5 interaction matrix (N_GRAVS=3: Newton / Yukawa /
    Coulomb+Yukawa diagonals, symmetric Yukawa cross terms): L3 symmetry
    holds, the tree walk matches the direct oracle, and cross-species
    momentum is conserved."""
    import jax.numpy as jnp

    from ngravs_tpu.constants import SOFTFAC_SPLINE
    from ngravs_tpu.ops.direct import direct_forces
    from ngravs_tpu.ops.solver import GravitySolver
    from ngravs_tpu.particles import Particles
    from ngravs_tpu.units import set_units

    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.02,) * 6, n_gravs=3, type_to_grav=(0, 0, 1, 2, 0, 0),
        wiring="three_species", box_size=20.0,
        tree_depth=6, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4)
    w = build_wiring(cfg)  # includes the L3 probe (ngravs_core.c:367-421)
    assert w.n_gravs == 3
    assert len(w.unique_laws()) == 3

    rng = np.random.default_rng(11)
    n = 768
    pos = rng.uniform(0, 6, (n, 3)).astype(np.float32)
    ptype = rng.integers(2, 5, n).astype(np.int32)  # types 2,3,4 -> gravities
    p = Particles.create(pos, np.zeros((n, 3), np.float32),
                         rng.uniform(0.5, 1.5, n).astype(np.float32),
                         np.arange(n), ptype, cfg.type_to_grav)
    assert len(np.unique(np.asarray(p.grav))) == 3

    units = set_units(cfg)
    solver = GravitySolver(cfg, w, np.array(cfg.softening) * SOFTFAC_SPLINE,
                           np.array(cfg.softening), units.G)
    p_out, _, _ = solver.compute(p, 0, n, opening="bh")
    acc_tree = np.asarray(p_out.accel)

    fsoft = jnp.full(n, 0.02 * SOFTFAC_SPLINE)
    acc_d, _ = direct_forces(w, p.pos, p.mass, p.grav, fsoft, chunk=256)
    acc_d = np.asarray(acc_d) * units.G

    scale = np.abs(acc_d).max()
    err = np.linalg.norm(acc_tree - acc_d, axis=1) / np.maximum(
        np.linalg.norm(acc_d, axis=1), 1e-30 * scale)
    assert np.sqrt((err ** 2).mean()) < 0.01

    # Newton's 3rd law end-to-end: total momentum change vanishes
    mom = np.abs((np.asarray(p.mass)[:, None] * acc_d).sum(0))
    mscale = (np.asarray(p.mass)[:, None] * np.abs(acc_d)).sum(0)
    assert (mom / mscale < 1e-4).all()

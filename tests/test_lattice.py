"""Periodic lattice (Ewald) correction: physics validation.

Ground truth is a brute-force sum over periodic images of the screened
Yukawa force (absolutely convergent), mirroring the role of the reference's
FORCETEST in periodic mode (lattice tables: forcetree.c:3611; sums:
ngravs.c:954-1150, 1170-1232).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngravs_tpu.models import laws as L
from ngravs_tpu.models.wiring import GravityWiring
from ngravs_tpu.ops import lattice as LAT
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.ops.tree import build_tree, make_tree_forces

EN = 16  # coarse table for test speed; production default is 64


def _yuk_tables(ym, box, en=EN):
    tab = LAT.lattice_tables_for("yukawa", en, {"ym": ym}, cache=False)
    tabs = np.zeros((1, en + 1, en + 1, en + 1, 4))
    tabs[0] = tab
    tabs[..., :3] /= box * box
    tabs[..., 3] /= box
    return jnp.asarray(tabs, jnp.float32)


def test_yukawa_lattice_vs_brute_force():
    ym, box = 5.0, 2.0
    tabs = _yuk_tables(ym, box)
    fac_intp = 2 * EN / box
    rng = np.random.default_rng(0)
    for _ in range(3):
        t = rng.uniform(0, box, 3)
        s = rng.uniform(0, box, 3)
        d = s - t
        d = d - box * np.round(d / box)
        ymL = ym / box
        brute = np.zeros(3)
        for n0 in range(-10, 11):
            for n1 in range(-10, 11):
                for n2 in range(-10, 11):
                    dv = d + box * np.array([n0, n1, n2])
                    r = np.linalg.norm(dv)
                    brute += dv * np.exp(-ymL * r) * (ymL / r + 1 / r ** 2) / r
        r = np.linalg.norm(d)
        mi = d * np.exp(-ymL * r) * (ymL / r + 1 / r ** 2) / r
        fx, fy, fz, _ = LAT.lattice_correction(
            tabs, fac_intp, jnp.asarray(d[0]), jnp.asarray(d[1]),
            jnp.asarray(d[2]), jnp.int32(0))
        tot = mi + np.array([float(fx), float(fy), float(fz)])
        assert np.linalg.norm(tot - brute) / np.linalg.norm(brute) < 5e-3


def test_periodic_tree_matches_periodic_direct():
    """End-to-end: periodic pure-tree walk with lattice correction agrees
    with the (lattice-corrected) direct oracle."""
    n, box = 600, 10.0
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grav = np.zeros(n, np.int32)
    fsoft = np.full(n, 0.1, np.float32)
    wiring = GravityWiring([[L.Newtonian()]])

    tab = LAT.lattice_tables_for("newton", EN, cache=False)
    tabs = np.zeros((1, EN + 1, EN + 1, EN + 1, 4))
    tabs[0] = tab
    tabs[..., :3] /= box * box
    tabs[..., 3] /= box
    tabs = jnp.asarray(tabs, jnp.float32)

    acc_d, pot_d = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                                 jnp.asarray(grav), jnp.asarray(fsoft),
                                 box=box, lattice_tables=tabs)
    acc_d = np.asarray(acc_d)
    # momentum conservation of the periodic force
    mom = np.abs((np.asarray(mass)[:, None] * acc_d).sum(0))
    scale = (np.asarray(mass)[:, None] * np.abs(acc_d)).sum()
    assert (mom / scale < 1e-4).all()

    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(n, jnp.float32),
                      depth=7, n_gravs=1, bucket=16, box_size=box)
    walk = make_tree_forces(
        wiring, n_gravs=1, group_size=64, node_list_cap=2048,
        leaf_list_cap=2048, frontier_cap=2048, bucket=16, depth=7,
        theta=0.5, opening="bh", block_batch=4, box_size=box,
        use_pallas=False, lattice_tables=tabs)
    res = walk(tree, jnp.arange(n, dtype=jnp.int32))
    assert not bool(res.overflow)
    acc_t = np.zeros((n, 3), np.float32)
    acc_t[np.asarray(tree.order)] = np.asarray(res.acc)
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 1e-2  # theta=0.5 monopole + interp


def test_native_tables_match_numpy():
    """The C++/OpenMP table generator (native/lattice_tables.cpp) must agree
    with the vectorized numpy Ewald sums to machine precision."""
    nat = LAT._native_tables("newton", 6)
    if nat is None:
        pytest.skip("native library unavailable")
    x = LAT._octant_points(6)
    f, p = nat
    np.testing.assert_allclose(f, LAT.ewald_force_newton(x), atol=1e-12)
    np.testing.assert_allclose(p, LAT.ewald_psi_newton(x), atol=1e-12)
    naty = LAT._native_tables("yukawa", 6, 2.5)
    f2, p2 = naty
    np.testing.assert_allclose(f2, LAT.yukawa_lattice_force(x, 2.5),
                               atol=1e-12)
    np.testing.assert_allclose(p2, LAT.yukawa_lattice_psi(x, 2.5),
                               atol=1e-12)

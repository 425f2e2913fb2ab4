"""Octree build + walk correctness vs the direct-summation oracle.

Models the reference's verification strategy: FORCETEST compares tree forces
against direct summation (gravtree_forcetest.c:28); ErrTolForceAcc=0.005 is
the stock accuracy setting (Configuration.reference:73-75).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngravs_tpu.models import laws as L
from ngravs_tpu.models.wiring import GravityWiring
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.ops.tree import build_tree, make_tree_forces


def _system(n=1500, seed=1, n_gravs=1):
    rng = np.random.default_rng(seed)
    pos = np.concatenate([
        rng.normal(0, 1.0, (n // 2, 3)),
        rng.normal(4, 0.5, (n - n // 2, 3)),
    ]).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grav = rng.integers(0, n_gravs, n).astype(np.int32)
    fsoft = np.full(n, 0.05, np.float32)
    return pos, mass, grav, fsoft


def _tree_acc(wiring, pos, mass, grav, fsoft, aold, opening="bh",
              theta=0.5, depth=7, bucket=16, n_gravs=1):
    n = pos.shape[0]
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.asarray(aold),
                      depth=depth, n_gravs=n_gravs, bucket=bucket)
    walk = make_tree_forces(
        wiring, n_gravs=n_gravs, group_size=128, node_list_cap=2048,
        leaf_list_cap=2048, frontier_cap=2048, bucket=bucket, depth=depth,
        theta=theta, opening=opening, block_batch=4)
    res = walk(tree, jnp.arange(n, dtype=jnp.int32))
    assert not bool(res.overflow)
    order = np.asarray(tree.order)
    acc = np.zeros((n, 3), np.float32)
    pot = np.zeros(n, np.float32)
    acc[order] = np.asarray(res.acc)
    pot[order] = np.asarray(res.pot)
    return acc, pot


def test_build_mass_conservation():
    pos, mass, grav, fsoft = _system(800, n_gravs=2)
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(800, jnp.float32),
                      depth=6, n_gravs=2, bucket=8)
    lv = np.asarray(tree.node_level)
    m = np.asarray(tree.node_mass)
    term = np.asarray(tree.node_terminal)
    pc = np.asarray(tree.node_pcount)
    # each level's cells + terminal cells of shallower levels partition
    # the particle set (the build excludes particles below their terminal
    # node from deeper levels)
    for lvl in range(7):
        mt = m[lv == lvl].sum() + m[term & (lv < lvl)].sum()
        np.testing.assert_allclose(mt, mass.sum(), rtol=1e-5)
        assert pc[lv == lvl].sum() + pc[term & (lv < lvl)].sum() == 800
    # per-gravity totals
    for g in range(2):
        np.testing.assert_allclose(m[lv == 0][:, g].sum(),
                                   mass[grav == g].sum(), rtol=1e-5)


def test_tree_vs_direct_bh():
    pos, mass, grav, fsoft = _system()
    wiring = GravityWiring([[L.Newtonian()]])
    acc_t, pot_t = _tree_acc(wiring, pos, mass, grav, fsoft,
                             np.ones(len(pos), np.float32), "bh", theta=0.5)
    acc_d, pot_d = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                                 jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d, pot_d = np.asarray(acc_d), np.asarray(pot_d)
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 5e-3   # well under ErrTolForceAcc
    prel = np.abs(pot_t - pot_d) / np.maximum(np.abs(pot_d), 1e-12)
    assert np.sqrt((prel ** 2).mean()) < 1e-3


def test_tree_vs_direct_relative_criterion():
    pos, mass, grav, fsoft = _system()
    wiring = GravityWiring([[L.Newtonian()]])
    acc_d, _ = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d = np.asarray(acc_d)
    aold = (0.005 * np.linalg.norm(acc_d, axis=1)).astype(np.float32)
    acc_t, _ = _tree_acc(wiring, pos, mass, grav, fsoft, aold, "relative")
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    # the conservative block-opening beats the per-target reference bound
    assert np.sqrt((rel ** 2).mean()) < 1e-3


def test_tree_multigravity_newton_yukawa():
    pos, mass, grav, fsoft = _system(n_gravs=2)
    yuk = L.Yukawa(1.0, 50.0)
    wiring = GravityWiring([[L.Newtonian(), yuk], [yuk, L.Newtonian()]])
    acc_t, _ = _tree_acc(wiring, pos, mass, grav, fsoft,
                         np.ones(len(pos), np.float32), "bh", n_gravs=2)
    acc_d, _ = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d = np.asarray(acc_d)
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 5e-3


def test_tree_partial_targets():
    """Walking a subset of targets must give the same answers as full walks."""
    pos, mass, grav, fsoft = _system(600)
    wiring = GravityWiring([[L.Newtonian()]])
    n = len(pos)
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(n, jnp.float32),
                      depth=7, n_gravs=1, bucket=16)
    walk = make_tree_forces(
        wiring, n_gravs=1, group_size=64, node_list_cap=2048,
        leaf_list_cap=2048, frontier_cap=2048, bucket=16, depth=7,
        theta=0.5, opening="bh", block_batch=2)
    sub_idx = jnp.arange(0, n, 3, dtype=jnp.int32)  # every 3rd sorted index
    pad = jnp.concatenate([sub_idx, jnp.full((7,), -1, jnp.int32)])
    sub = walk(tree, pad)
    acc_s = np.asarray(sub.acc)[:len(sub_idx)]
    # accuracy gate vs direct for the same subset (block shapes differ from a
    # full walk, so answers agree only to the opening tolerance)
    acc_d, _ = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d = np.asarray(acc_d)[np.asarray(tree.order)[np.asarray(sub_idx)]]
    rel = np.linalg.norm(acc_s - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 5e-3


def test_deep_tree_clustered_core():
    """Fat-leaf regression: a tight core inside a huge halo needs depth > 10
    (dual-key Morton levels) or leaf buckets overflow and silently truncate."""
    rng = np.random.default_rng(3)
    n = 1500
    pos = np.concatenate([rng.normal(0, 0.01, (n // 2, 3)),
                          rng.normal(0, 10.0, (n - n // 2, 3))]).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grav = np.zeros(n, np.int32)
    fsoft = np.full(n, 0.005, np.float32)
    wiring = GravityWiring([[L.Newtonian()]])
    acc_d, _ = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d = np.asarray(acc_d)
    aold = (0.005 * np.linalg.norm(acc_d, axis=1)).astype(np.float32)
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.asarray(aold),
                      depth=16, n_gravs=1, bucket=16)
    term = np.asarray(tree.node_terminal)
    assert np.asarray(tree.node_pcount)[term].max() <= 16  # no fat leaves
    walk = make_tree_forces(
        wiring, n_gravs=1, group_size=64, node_list_cap=4096,
        leaf_list_cap=4096, frontier_cap=2048, bucket=16, depth=16,
        theta=0.5, opening="relative", block_batch=4, use_pallas=False)
    res = walk(tree, jnp.arange(n, dtype=jnp.int32))
    assert not bool(res.overflow)
    acc_t = np.zeros((n, 3), np.float32)
    acc_t[np.asarray(tree.order)] = np.asarray(res.acc)
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 1e-3

def test_walk_overflow_reports_true_demand():
    """Undersized list caps must flag overflow and report demands that, once
    adopted (with the solver's margin), make the walk succeed — the regrow
    contract of GravitySolver.compute (solver.py)."""
    pos, mass, grav, fsoft = _system(1200)
    wiring = GravityWiring([[L.Newtonian()]])
    n = len(pos)
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(n, jnp.float32),
                      depth=7, n_gravs=1, bucket=16)
    tgt = jnp.arange(n, dtype=jnp.int32)
    # leaf-chunk table sized to the tree's actual demand (what the solver's
    # pre-walk n_chunk_rows check guarantees, solver.py)
    lf = float(tree.n_chunk_rows) * 1.1 / n
    tiny = make_tree_forces(
        wiring, n_gravs=1, group_size=128, ent_cap=64, chunk_cap=64,
        frontier_cap=2048, bucket=16, depth=7, theta=0.5, opening="bh",
        block_batch=4, use_pallas=False, leaf_factor=lf)
    res = tiny(tree, tgt)
    assert bool(res.overflow)
    # an undersized leaf table must be flagged too (silent phantom-source
    # corruption regression: chunk ids past the leaf region)
    small_layout = make_tree_forces(
        wiring, n_gravs=1, group_size=128, ent_cap=8192, chunk_cap=8192,
        frontier_cap=2048, bucket=16, depth=7, theta=0.5, opening="bh",
        block_batch=4, use_pallas=False,
        leaf_factor=float(tree.n_chunk_rows) * 0.8 / n)
    assert bool(small_layout(tree, tgt).overflow)
    # regrow to the reported demand (power-of-two margin like the solver)
    import math as _m
    p2 = lambda x: 1 << _m.ceil(_m.log2(max(int(x), 64)))
    good = make_tree_forces(
        wiring, n_gravs=1, group_size=128, ent_cap=p2(res.max_ent),
        chunk_cap=p2(res.max_chunk), frontier_cap=2048, bucket=16,
        depth=7, theta=0.5, opening="bh", block_batch=4, use_pallas=False,
        leaf_factor=lf)
    res2 = good(tree, tgt)
    assert not bool(res2.overflow)
    acc_d, _ = direct_forces(wiring, jnp.asarray(pos), jnp.asarray(mass),
                             jnp.asarray(grav), jnp.asarray(fsoft))
    acc_d = np.asarray(acc_d)
    acc_t = np.zeros((n, 3), np.float32)
    acc_t[np.asarray(tree.order)] = np.asarray(res2.acc)
    rel = np.linalg.norm(acc_t - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 5e-3


def test_walk_static_matches_adaptive():
    """tree_forces_static (fixed shapes, usable under outer jit) must agree
    with the host-paced adaptive walk to f32 roundoff."""
    pos, mass, grav, fsoft = _system(900)
    wiring = GravityWiring([[L.Newtonian()]])
    n = len(pos)
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(n, jnp.float32),
                      depth=7, n_gravs=1, bucket=16)
    walk = make_tree_forces(
        wiring, n_gravs=1, group_size=64, ent_cap=4096, chunk_cap=4096,
        frontier_cap=2048, bucket=16, depth=7, theta=0.5, opening="bh",
        block_batch=4, use_pallas=False,
        leaf_factor=float(tree.n_chunk_rows) * 1.1 / n)
    tgt = jnp.arange(n, dtype=jnp.int32)
    res_a = walk(tree, tgt)
    res_s = walk.static(tree, tgt, fcap=65536)
    assert not bool(res_a.overflow) and not bool(res_s.overflow)
    np.testing.assert_allclose(np.asarray(res_s.acc), np.asarray(res_a.acc),
                               rtol=2e-4, atol=1e-6)


def test_ngravs_accumulator_node_exactness():
    """NGRAVS_ACCUMULATOR isolation (ngravs.c:163-210, SURVEY §4.3): for
    the BAM wiring, a node of K co-located equal-mass BAM sources evaluated
    through the walk's N-counting monopole must reproduce the exact direct
    sum; with the accumulator off the same monopole is measurably wrong."""
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.ops.tree import build_tree, make_tree_forces

    K = 16
    # K BAM particles co-located (tiny jitter), one distant baryon target
    rng = np.random.default_rng(4)
    src = 8.0 + rng.normal(0, 1e-4, (K, 3)).astype(np.float32)
    tgt = np.array([[1.0, 1.0, 1.0]], np.float32)
    pos = np.concatenate([tgt, src])
    n = K + 1
    mass = np.full(n, 2.0, np.float32)
    grav = np.concatenate([[0], np.ones(K)]).astype(np.int32)  # baryon, BAM
    fsoft = np.full(n, 0.05, np.float32)

    def walk_force(accumulator):
        cfg = SimulationConfig(n_gravs=2, wiring="bam",
                               ngravs_accumulator=accumulator,
                               softening=(0.05,) * 6)
        w = build_wiring(cfg)
        tree = build_tree(jnp.asarray(pos), jnp.asarray(mass),
                          jnp.asarray(grav), jnp.asarray(fsoft),
                          jnp.ones(n), depth=4, n_gravs=2, bucket=2)
        walk = make_tree_forces(w, n_gravs=2, group_size=8,
                                node_list_cap=256, leaf_list_cap=256,
                                bucket=2, depth=4, theta=0.7, opening="bh",
                                block_batch=1, use_pallas=False)
        # target is index 0 in original order; find its sorted slot
        order = np.asarray(tree.order)
        slot = int(np.nonzero(order == 0)[0][0])
        res = walk.static(tree, jnp.asarray([slot], jnp.int32), fcap=4096)
        return np.asarray(res.acc)[0], w

    acc_on, w = walk_force(True)
    acc_off, _ = walk_force(False)

    # exact direct sum: K individual (mass, N=1) contributions
    law = w.law(0, 1)      # BAM source -> baryon target
    exact = np.zeros(3)
    for j in range(K):
        d = src[j] - tgt[0]
        r = float(np.linalg.norm(d))
        fac = float(law.force_factor(2.0, 2.0, r * r, r, 0.05 * 2.8, 1))
        exact += fac * d

    err_on = np.linalg.norm(acc_on - exact) / np.linalg.norm(exact)
    err_off = np.linalg.norm(acc_off - exact) / np.linalg.norm(exact)
    assert err_on < 1e-4, (acc_on, exact)
    # without the accumulator the monopole treats the node as ONE particle
    # of the summed mass -> a systematically different BAM force
    assert err_off > 10 * max(err_on, 1e-6), (err_on, err_off)


def test_fused_walk_accuracy_vs_direct():
    """The fused work-queue walk (ops/walk.py — the production force path)
    against the O(N^2) oracle on a clumpy two-species system, at a size
    where multiple dequeue windows, deep leaves, and multi-batch block
    grouping are all exercised.  Guards the queue/flatten plumbing: a
    round-2 bug made the walk silently drop pushed visits (rms error ~1)
    while every small-N test stayed green."""
    import numpy as np
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.ops.walk import make_fused_walk
    from ngravs_tpu.ops.direct import direct_forces
    from ngravs_tpu.particles import Particles

    N, depth = 12000, 8
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.1,) * 6, max_size_timestep=0.01,
        periodic=False, box_size=1000.0, n_gravs=2,
        type_to_grav=(0, 1, 0, 0, 0, 0), wiring="newton_yukawa")
    rng = np.random.default_rng(7)
    centers = rng.uniform(0, 1000.0, (5, 3))
    k = rng.integers(0, 5, N)
    pos = np.mod(centers[k] + rng.normal(0, 20.0, (N, 3)),
                 1000.0).astype(np.float32)
    ptype = rng.integers(1, 3, N).astype(np.int32)
    p = Particles.create(pos, np.zeros_like(pos),
                         np.full(N, 1.0 / N, np.float32),
                         np.arange(N), ptype, cfg.type_to_grav)
    wiring = build_wiring(cfg)
    fsoft = jnp.full((N,), 0.1, jnp.float32)
    aold = jnp.full((N,), 1e-3, jnp.float32)
    tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold,
                      jnp.zeros_like(p.mass), depth=depth, n_gravs=2,
                      bucket=32)
    walk = make_fused_walk(wiring, n_gravs=2, depth=depth, bucket=32,
                           group_size=64, batch_blocks=128,
                           ent_cap=2048, chunk_cap=2048,
                           frontier_cap=4096,
                           ec=512, theta=0.5, opening="bh")
    tgt = jnp.arange(N, dtype=jnp.int32)
    res = jax.jit(lambda tr, tg: walk(tr, tg))(tree, tgt)
    assert not bool(res.overflow)
    acc_w = np.zeros((N, 3), np.float32)
    acc_w[np.asarray(tree.order)] = np.asarray(res.acc)
    acc_d, _ = direct_forces(wiring, p.pos, p.mass, p.grav, fsoft,
                             chunk=2048)
    acc_d = np.asarray(acc_d)
    err = (np.linalg.norm(acc_w - acc_d, axis=1)
           / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12))
    rms = float(np.sqrt((err ** 2).mean()))
    assert rms < 5e-3, rms
    assert float(err.max()) < 0.1, err.max()
    # interaction counts feed GravCost / timings parity (forcetree.c:1595)
    # — regression: the fused result-scatter once zeroed them
    nia = np.asarray(res.ninteract)
    assert nia.sum() > 0 and (nia > 0).mean() > 0.99, nia.sum()


def test_solver_recovers_from_mono_octet_overflow():
    """A too-small measured octet-caps tuple (mono-region/layout overflow)
    must be RECOVERED by GravitySolver.compute's retry loop — re-measured
    from the built tree, walk recompiled, forces produced — not raised as
    the 8-attempt RuntimeError (the TreeAllocFactor regrow contract,
    forcetree.c:3176)."""
    from ngravs_tpu.config import SimulationConfig
    from ngravs_tpu.constants import SOFTFAC_SPLINE
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.ops.solver import GravitySolver
    from ngravs_tpu.particles import Particles

    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(0.05,) * 6, max_size_timestep=0.01,
        wiring="newton", solver="tree", tree_depth=6,
        type_of_opening_criterion=0, err_tol_theta=0.6)
    rng = np.random.default_rng(7)
    n = 1024
    pos = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    p = Particles.create(pos, np.zeros_like(pos),
                         np.full(n, 1e-3, np.float32), np.arange(n),
                         np.ones(n, np.int32), cfg.type_to_grav)
    w = build_wiring(cfg)
    soft = np.array(cfg.softening, np.float32)
    solver = GravitySolver(cfg, w, soft * SOFTFAC_SPLINE, soft,
                           cfg.gravity_constant_internal)
    # poison the measured caps: far below the real octet occupancy at
    # every level -> build_octet_layout flags layout_ovf on first walk
    solver.octet_caps = tuple([1] * (solver.depth + 1))
    p2, n_ia, _ = solver.compute(p, 0, n, opening="bh")
    acc = np.asarray(p2.accel)
    assert np.isfinite(acc).all() and np.abs(acc).max() > 0
    # the poisoned caps were re-measured up to the real demand
    assert solver.octet_caps is not None
    assert sum(solver.octet_caps) > solver.depth + 1

    # cross-check the recovered forces against the direct sum
    wiring1 = w
    acc_d, _ = direct_forces(wiring1, jnp.asarray(pos),
                             jnp.asarray(p.mass), jnp.asarray(p.grav),
                             jnp.asarray(soft[1] * SOFTFAC_SPLINE
                                         * np.ones(n, np.float32)))
    acc_d = np.asarray(acc_d)
    rel = np.linalg.norm(acc - acc_d, axis=1) \
        / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12)
    assert np.sqrt((rel ** 2).mean()) < 5e-3

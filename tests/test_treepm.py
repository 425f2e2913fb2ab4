"""TreePM: PM long-range + short-range tree with tabulated transition.

Accuracy oracle: direct summation with Ewald lattice correction (the exact
periodic force), as in the reference's FORCETEST under PMGRID
(gravtree_forcetest.c:46-49).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import erf

from ngravs_tpu.config import SimulationConfig
from ngravs_tpu.models import laws as L
from ngravs_tpu.models.wiring import GravityWiring
from ngravs_tpu.ops import lattice as LAT
from ngravs_tpu.ops.direct import direct_forces
from ngravs_tpu.ops.pm import PMSolver
from ngravs_tpu.ops.shortrange import shortrange_tables, UMAX
from ngravs_tpu.ops.tree import build_tree, make_tree_forces


def test_shortrange_tables_newton_analytic():
    """The numeric transition tables must reproduce the classic analytic
    Newtonian truncation to near machine accuracy (ngravs_core.c:38-43)."""
    w = GravityWiring([[L.Newtonian()]])
    ftab, ptab = shortrange_tables(w, ntab=256)
    u = UMAX / 256 * (np.arange(256) + 0.5)
    fexp = np.pi * (erf(u) - 2 * u / np.sqrt(np.pi) * np.exp(-u * u)) / u ** 2
    pexp = np.pi * erf(u) / u
    assert np.abs(np.asarray(ftab)[0, 0] / fexp - 1).max() < 1e-5
    assert np.abs(np.asarray(ptab)[0, 0] / pexp - 1).max() < 1e-5


def _exact_periodic(w, pos, mass, grav, fsoft, box, en=16):
    tab = LAT.lattice_tables_for("newton", en, cache=False)
    tabs = np.zeros((1, en + 1, en + 1, en + 1, 4))
    tabs[0] = tab
    tabs[..., :3] /= box * box
    tabs[..., 3] /= box
    tabs = jnp.asarray(tabs, jnp.float32)
    acc, _ = direct_forces(w, jnp.asarray(pos), jnp.asarray(mass),
                           jnp.asarray(grav), jnp.asarray(fsoft),
                           box=box, lattice_tables=tabs)
    return np.asarray(acc)


def test_treepm_total_force_vs_exact():
    box, pmgrid, n = 100.0, 64, 700
    w = GravityWiring([[L.Newtonian()]])
    pm = PMSolver(w, pmgrid, box, 1, g_const=1.0)
    ftab, ptab = shortrange_tables(w, ntab=1024)
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grav = np.zeros(n, np.int32)
    fsoft = np.full(n, 0.5, np.float32)

    acc_exact = _exact_periodic(w, pos, mass, grav, fsoft, box)
    acc_pm = np.asarray(pm.forces(jnp.asarray(pos), jnp.asarray(mass),
                                  jnp.asarray(grav)))
    tree = build_tree(jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(grav),
                      jnp.asarray(fsoft), jnp.ones(n, jnp.float32),
                      depth=7, n_gravs=1, bucket=16, box_size=box)
    tpm = dict(sr_ftab=ftab, sr_ptab=ptab, asmth=pm.asmth, rcut=pm.rcut)
    walk = make_tree_forces(
        w, n_gravs=1, group_size=64, node_list_cap=2048, leaf_list_cap=2048,
        frontier_cap=2048, bucket=16, depth=7, theta=0.5, opening="bh",
        block_batch=4, box_size=box, use_pallas=False, treepm=tpm)
    res = walk(tree, jnp.arange(n, dtype=jnp.int32))
    assert not bool(res.overflow)
    acc_t = np.zeros((n, 3), np.float32)
    acc_t[np.asarray(tree.order)] = np.asarray(res.acc)
    tot = acc_t + acc_pm
    rel = np.linalg.norm(tot - acc_exact, axis=1) \
        / np.maximum(np.linalg.norm(acc_exact, axis=1), 1e-12)
    # Gadget's own TreePM error band is ~1% rms across the transition
    assert np.sqrt((rel ** 2).mean()) < 2.5e-2
    # short-range must vanish beyond Rcut: a particle pair at > rcut
    # interacts through PM only (checked implicitly by the total above)


@pytest.mark.slow
def test_treepm_simulation_runs():
    """End-to-end: periodic TreePM box through the Simulation main loop
    (PM stepping + long-range kick)."""
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.particles import Particles

    box, n = 50.0, 400
    rng = np.random.default_rng(3)
    cfg = SimulationConfig(
        time_begin=0.0, time_max=0.05, gravity_constant_internal=1.0,
        softening=(0.3,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box, pmgrid=32, ntab=512,
        tree_depth=6, tree_bucket_size=16, tree_group_size=64,
        tree_block_batch=4,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0, wiring="newton")
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    p = Particles.create(pos, vel, np.full(n, 1e-2, np.float32),
                         np.arange(n), np.ones(n, np.int32),
                         cfg.type_to_grav)
    sim = Simulation(cfg, particles=p, log_dir="")
    sim.run(max_steps=6)
    assert sim.time > 0
    acc = np.asarray(sim.p.accel)
    acc_pm = np.asarray(sim.p.accel_pm)
    assert np.isfinite(acc).all() and np.isfinite(acc_pm).all()
    assert np.abs(acc_pm).max() > 0  # PM actually ran
    assert sim.pm_ti_endstep > 0


def test_xition_check_dump(tmp_path):
    """NGRAVS_TREEPM_XITION_CHECK: the dumped u/C(u)/I(u) table round-trips
    to the short-range tables and the forcetrace truncated force matches
    ftab (forcetree.c:3299-3391)."""
    from ngravs_tpu.models import laws as L
    from ngravs_tpu.models.wiring import GravityWiring
    from ngravs_tpu.ops.shortrange import (dump_transition_tables,
                                           shortrange_tables)

    box = 100.0
    w = GravityWiring([[L.Newtonian(), L.Newtonian()],
                       [L.Newtonian(), L.Yukawa(5.0, box, pmgrid=32)]])
    ntab = 256
    ftab, ptab = shortrange_tables(w, ntab=ntab)
    asmth = 1.25 * box / 32
    files = dump_transition_tables(w, ftab, ptab, asmth, box, str(tmp_path))
    # one file per unique law name
    names = {w.names[i][j] for i in range(2) for j in range(2)}
    assert len(files) == len(names)
    for path in files:
        txt = open(path).read().split("\n# Begin debug forcetrace")
        rows = np.array([[float(x) for x in ln.split()]
                         for ln in txt[0].strip().splitlines()])
        assert rows.shape == (ntab, 3)
        u, c_u, i_u = rows.T
        # round-trip: ftab = I/u^2 - C/u, ptab = I/u
        name = path.split("ngravs_tpm_")[1].split("_l")[0]
        tg, sg = next((i, j) for i in range(2) for j in range(2)
                      if w.names[i][j] == name)
        np.testing.assert_allclose(i_u / u ** 2 - c_u / u,
                                   np.asarray(ftab)[tg, sg],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(i_u / u, np.asarray(ptab)[tg, sg],
                                   rtol=1e-5, atol=1e-6)
        assert "forcetrace" in txt[1] or len(txt) == 2


def test_closed_form_shortrange_matches_tables():
    """The closed-form Yukawa/ColoYuk TreePM truncation kernels
    (Salin-Caillol screened-Ewald split, laws.py kernel_shortrange) must
    match the f64-tabulated transition (forcetree.c:3274 analog) to the
    erfc-approximation error, across the whole transition band."""
    from ngravs_tpu.ops.shortrange import (longrange_force_factor,
                                           longrange_pot_factor)
    box, pmgrid, asmth_cells = 1000.0, 128, 1.25
    yuk = L.Yukawa(60.0, box, pmgrid, asmth_cells)
    colo = L.ColoYuk(60.0, box, pmgrid, asmth_cells)
    w = GravityWiring([[L.Newtonian(), yuk], [yuk, colo]])
    ftab, ptab = shortrange_tables(w, ntab=1000)
    asmth = asmth_cells * box / pmgrid
    ntab = ftab.shape[-1]
    for law, slots in w.unique_laws():
        ks = law.kernel_shortrange()
        assert ks is not None, law.name
        sf, sp = ks
        r = np.linspace(0.05 * asmth, 5.9 * asmth, 400)
        u = jnp.asarray(r / (2 * asmth))
        pair = slots[0][0] * w.n_gravs + slots[0][1]
        lr, _ = longrange_force_factor(jnp.asarray(ftab), asmth, ntab,
                                       jnp.asarray(r), pair)
        lrp, _ = longrange_pot_factor(jnp.asarray(ptab), asmth, ntab,
                                      jnp.asarray(r), pair)
        acc_full = np.asarray(law.accel(1.0, 1.0, r * r, r, 1.0))
        f_tab = acc_full - np.asarray(lr)
        f_cf = acc_full * np.asarray(sf(u))
        rel = np.abs(f_cf - f_tab) / np.maximum(np.abs(acc_full), 1e-30)
        assert rel.max() < 2e-5, (law.name, rel.max())
        p_full = np.asarray(law.potential(1.0, 1.0, r * r, r, 1.0))
        p_tab = p_full - np.asarray(lrp)
        p_cf = p_full * np.asarray(sp(u))
        relp = np.abs(p_cf - p_tab) / np.maximum(np.abs(p_full), 1e-30)
        assert relp.max() < 2e-5, (law.name, relp.max())


def test_forcetest_oracle_includes_ewald():
    """force_test's direct-sum oracle must be the TRUE periodic force:
    without ForceTest configured the solver skips building the Ewald
    oracle tables, and a bare minimum-image sum is ~20% rms off — the
    harness must build them on demand (begrun.c:47-49 analog)."""
    from ngravs_tpu.diagnostics.forcetest import force_test
    from ngravs_tpu.integrate.runner import Simulation
    from ngravs_tpu.particles import Particles

    box = 1000.0
    rng = np.random.default_rng(5)
    n = 512
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(box / 3000,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box, pmgrid=64,
        time_bet_snapshot=0.0, time_of_first_snapshot=1e30,
        time_bet_statistics=0.0, wiring="newton", ngravs_en=16)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = np.full(n, 1.0, np.float32)
    p = Particles.create(pos, np.zeros((n, 3), np.float32), mass,
                         np.arange(n), np.ones(n, np.int32),
                         cfg.type_to_grav)
    sim = Simulation(cfg, particles=p, log_dir="")
    sim.compute_forces(full=True)   # must refresh accel_pm too
    idx, acc_d, acc_s, rel = force_test(sim, fraction=0.5, write=False)
    fsoft = np.full(n, box / 3000 * 2.8, np.float32)
    exact = _exact_periodic(sim.wiring, np.asarray(sim.p.pos), mass,
                            np.zeros(n, np.int32), fsoft, box)
    rel_oracle = (np.linalg.norm(np.asarray(acc_d) - exact[idx], axis=1)
                  / np.maximum(np.linalg.norm(exact[idx], axis=1), 1e-12))
    assert np.sqrt((rel_oracle ** 2).mean()) < 1e-3, \
        "oracle is not the periodic force"
    assert np.sqrt((rel ** 2).mean()) < 0.03, rel


import pytest


@pytest.mark.parametrize("gradient", ["spectral", "fd4"])
def test_pm_interlacing_cuts_grid_anisotropy(gradient):
    """Grid interlacing (PMSolver interlace=True) averages a half-cell-
    staggered CIC assignment/readout pair in k space; the odd image
    aliases cancel and the near-grid force error drops several-fold.

    Truth: the same physical Gaussian-smoothed field computed on a 4x
    finer non-interlaced grid (same asmth in LENGTH units), where the
    grid error at the probed radii is negligible.  No reference analog —
    pm_periodic.c:297 uses a single grid."""
    from ngravs_tpu.models.wiring import build_wiring
    from ngravs_tpu.config import SimulationConfig

    box = 1000.0
    rng = np.random.default_rng(3)
    n = 512
    pos = np.empty((n, 3), np.float32)
    pos[0] = box / 2
    # probe ring: radii 6..12 coarse cells around the central mass —
    # the radii PM handles alone in TreePM (rcut = 4.5*asmth = 5.6 cells)
    r = rng.uniform(6, 12, n - 1) * box / 32
    u = rng.normal(size=(n - 1, 3)); u /= np.linalg.norm(u, axis=1)[:, None]
    pos[1:] = box / 2 + r[:, None] * u
    mass = np.full(n, 1e-6, np.float32); mass[0] = 1.0
    grav = np.zeros(n, np.int32)
    cfg = SimulationConfig(
        time_begin=0.0, time_max=1.0, gravity_constant_internal=1.0,
        softening=(1.0,) * 6, max_size_timestep=0.01,
        periodic=True, box_size=box, wiring="newton", pmgrid=32)
    w = build_wiring(cfg)

    pm_plain = PMSolver(w, 32, box, 1, 1.0, asmth_cells=1.25,
                        gradient=gradient)
    pm_inter = PMSolver(w, 32, box, 1, 1.0, asmth_cells=1.25,
                        gradient=gradient, interlace=True)
    # same asmth in length units on the 4x grid -> same physical field
    pm_fine = PMSolver(w, 128, box, 1, 1.0, asmth_cells=5.0,
                       gradient="spectral")

    jp = jnp.asarray(pos); jm = jnp.asarray(mass); jg = jnp.asarray(grav)
    a_plain = np.asarray(pm_plain.forces(jp, jm, jg))[1:]
    a_inter = np.asarray(pm_inter.forces(jp, jm, jg))[1:]
    a_fine = np.asarray(pm_fine.forces(jp, jm, jg))[1:]

    den = np.maximum(np.linalg.norm(a_fine, axis=1), 1e-12)
    rms = lambda a: float(np.sqrt((
        (np.linalg.norm(a - a_fine, axis=1) / den) ** 2).mean()))
    e_plain, e_inter = rms(a_plain), rms(a_inter)
    assert e_inter < 0.5 * e_plain, (e_plain, e_inter)
    # fd4 keeps its 4th-order stencil truncation error (~1e-3 at these
    # radii) after the aliases cancel; spectral differentiation has none
    assert e_inter < (1e-3 if gradient == "spectral" else 2e-3), e_inter

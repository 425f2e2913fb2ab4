"""Direct-summation force test (FORCETEST).

Rebuild of `gravity_forcetest()` (gravtree_forcetest.c:28): a random fraction
of the active particles gets exact O(N * Nsel) direct-summation forces —
including spline softening and, for periodic runs, the lattice correction
(force_treeevaluate_direct, forcetree.c:3428-3548) — appended to
`forcetest.txt` alongside the solver's forces:

    type  ti  pos[3]  acc_direct[3]  acc_tree[3]  id

This is the reference's definition of force error; `rms_error` summarizes the
relative-error distribution the way utilities/tpmfp.py bins it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.direct import direct_forces


def force_test(sim, fraction: float | None = None, seed: int = 42,
               write: bool = True):
    """Run the direct-sum test on the current state of a Simulation.

    Returns (idx, acc_direct, acc_solver, rel_err).  When `write`, appends
    forcetest.txt rows in the reference's layout
    (gravtree_forcetest.c:294-312)."""
    cfg = sim.cfg
    frac = cfg.force_test if fraction is None else fraction
    if frac <= 0:
        frac = 0.01
    p = sim.p
    n = p.n
    rng = np.random.default_rng(seed + sim.step_count)
    nsel = max(1, int(frac * n))
    idx = np.sort(rng.choice(n, size=nsel, replace=False)).astype(np.int32)

    fsoft = jnp.asarray(sim.force_soft)[p.ptype]
    if sim.cfg.adaptive_gravsoft_forgas and sim.sph is not None:
        fsoft = jnp.where(p.ptype == 0, sim.sph.hsml, fsoft)
    box = cfg.box_size if cfg.periodic else 0.0
    # exact periodic oracle: the Ewald tables built for FORCETEST even
    # under PMGRID (begrun.c:47-49; force_treeevaluate_direct,
    # forcetree.c:3471-3530)
    lat = getattr(sim.solver, "oracle_lattice_tables", None)
    if lat is None:
        lat = getattr(sim.solver, "lattice_tables", None)
    if lat is None and cfg.periodic:
        # the solver only pre-builds the Ewald oracle tables when
        # ForceTest is configured (begrun.c:47-49); harnesses calling
        # force_test() directly (tpmfp/rdep) need them regardless — a
        # bare minimum-image sum is NOT the periodic force (~20% rms off)
        from ..ops.lattice import build_lattice_tables
        lat = build_lattice_tables(sim.wiring, cfg.ngravs_en, cfg.box_size)
        sim.solver.oracle_lattice_tables = lat
    acc_d, _ = direct_forces(
        sim.wiring, p.pos, p.mass, p.grav, fsoft,
        tgt_idx=jnp.asarray(idx), box=box,
        lattice_tables=lat)
    acc_d = np.asarray(acc_d) * sim.units.G

    acc_s = np.asarray(p.accel)[idx]
    if cfg.pmgrid:
        acc_s = acc_s + np.asarray(p.accel_pm)[idx]
    num = np.linalg.norm(acc_s - acc_d, axis=1)
    den = np.maximum(np.linalg.norm(acc_d, axis=1), 1e-30)
    rel = num / den

    if write and sim.log_dir:
        import os
        path = os.path.join(sim.log_dir, "forcetest.txt")
        with open(path, "a") as f:
            pos = np.asarray(p.pos)[idx]
            ptype = np.asarray(p.ptype)[idx]
            pid = np.asarray(p.pid)[idx]
            for k in range(nsel):
                f.write(
                    f"{ptype[k]} {sim.ti_current} "
                    f"{pos[k,0]:g} {pos[k,1]:g} {pos[k,2]:g} "
                    f"{acc_d[k,0]:g} {acc_d[k,1]:g} {acc_d[k,2]:g} "
                    f"{acc_s[k,0]:g} {acc_s[k,1]:g} {acc_s[k,2]:g} "
                    f"{pid[k]}\n")
    return idx, acc_d, acc_s, rel


def rms_error(rel: np.ndarray) -> dict:
    """Summary statistics in the style of utilities/tpmfp.py's binned RMS."""
    return {
        "rms": float(np.sqrt((rel ** 2).mean())),
        "p50": float(np.percentile(rel, 50)),
        "p90": float(np.percentile(rel, 90)),
        "p99": float(np.percentile(rel, 99)),
        "max": float(rel.max()),
        "n": int(rel.size),
    }

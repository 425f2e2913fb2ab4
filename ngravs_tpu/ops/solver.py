"""Gravity solver front-end: octree or direct summation.

Rebuild of `gravity_tree()` (gravtree.c:27) as a host-side orchestrator over
jitted device kernels: build the tree from all particles, walk it for the
active targets, scatter accelerations/potentials back, times G
(gravtree.c:337-341).  The direct-summation path doubles as the FORCETEST
oracle (gravtree_forcetest.c:28).

Cap management: the walk's interaction-list/frontier caps are static shapes.
The solver starts from the config's caps and doubles any cap the walk reports
overflowing, recompiling — the TPU analog of Gadget growing its
TreeAllocFactor on "too many nodes" (forcetree.c:3176).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimulationConfig
from ..models.wiring import GravityWiring
from .direct import direct_forces
from .tree import build_tree, refresh_tree


class ForceResult(NamedTuple):
    acc: jnp.ndarray        # [N,3] updated in place for targets (times G)
    pot: jnp.ndarray        # [N]
    old_acc: jnp.ndarray    # [N]
    grav_cost: jnp.ndarray  # [N]
    overflow: jnp.ndarray   # scalar bool
    n_interactions: jnp.ndarray  # scalar


class CosmoCorrections:
    """Static cosmological correction factors (gravtree.c:302-316,344-358;
    potential.c:251-258,310-337).  H = 0 (Newtonian units) disables all."""

    def __init__(self, fac_acc_com, fac_acc_lam, fac_pot_r2,
                 madelung_by_grav):
        self.fac_acc_com = fac_acc_com
        self.fac_acc_lam = fac_acc_lam
        self.fac_pot_r2 = fac_pot_r2
        self.madelung_by_grav = madelung_by_grav


def cosmo_corrections(cfg, G: float, hubble: float,
                      lattice_tables=None) -> CosmoCorrections:
    import math as _m
    H2 = hubble * hubble
    open_box = not cfg.periodic and not cfg.pmgrid
    # comoving non-periodic: acc += 0.5 H^2 Omega0 pos (pre-G in the
    # reference, so it feeds OldAcc; post-G here, same value)
    fac_acc_com = (0.5 * H2 * cfg.omega0
                   if open_box and cfg.comoving_integration else 0.0)
    # Newtonian coordinates with vacuum energy: acc += OmegaLambda H^2 pos
    # (added after OldAcc in the reference)
    fac_acc_lam = (cfg.omega_lambda * H2
                   if open_box and not cfg.comoving_integration else 0.0)
    # potential r^2 terms (potential.c:310-337): comoving non-periodic
    # -0.5 Omega0 H^2 r^2; Newtonian -0.5 OmegaLambda H^2 r^2 (any box)
    if cfg.comoving_integration:
        fac_pot_r2 = -0.5 * cfg.omega0 * H2 if not cfg.periodic else 0.0
    else:
        fac_pot_r2 = -0.5 * cfg.omega_lambda * H2
    # comoving periodic: per-gravity Madelung ("LatticeZero") potential
    # term -G * psi0[g,g] * m^(2/3) * (3 Omega0 H^2 / (8 pi G))^(1/3)
    # (potential.c:251-258); psi0 is the origin value of the rescaled
    # lattice potential table
    madelung = None
    if (cfg.comoving_integration and cfg.periodic
            and lattice_tables is not None and H2 > 0):
        ng = cfg.n_gravs
        # the table origin holds the Madelung constant rescaled by 1/L
        # (build_lattice_tables); the reference's LatticeZero is the raw
        # dimensionless value (ngravs.c:133, used potential.c:256)
        psi0 = np.asarray(lattice_tables).reshape(
            ng, ng, *lattice_tables.shape[1:])[
            np.arange(ng), np.arange(ng), 0, 0, 0, 3] * cfg.box_size
        rho_fac = (cfg.omega0 * 3 * H2 / (8 * _m.pi * G)) ** (1.0 / 3)
        madelung = jnp.asarray(G * psi0 * rho_fac, jnp.float32)
    return CosmoCorrections(fac_acc_com, fac_acc_lam, fac_pot_r2, madelung)


def apply_cosmo_corrections(c: CosmoCorrections, pos, mass, grav, acc, pot):
    """Cosmological corrections on G-multiplied (acc, pot) rows.

    Returns (acc, old_acc_magnitude, pot): the comoving Omega0 term is
    inside OldAcc (reference adds it pre-G, gravtree.c:304-315), the
    Lambda term is not (added post-OldAcc, gravtree.c:344-358).  Traced
    code — the factors are static floats so disabled terms vanish."""
    if c.fac_acc_com:
        acc = acc + c.fac_acc_com * pos
    amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    if c.fac_acc_lam:
        acc = acc + c.fac_acc_lam * pos
    if c.fac_pot_r2:
        pot = pot + c.fac_pot_r2 * jnp.sum(pos * pos, axis=-1)
    if c.madelung_by_grav is not None:
        pot = pot - c.madelung_by_grav[grav] * mass ** (2.0 / 3)
    return acc, amag, pot


def _bucket(n: int, minimum: int = 256) -> int:
    return max(minimum, 1 << math.ceil(math.log2(max(n, 1))))


class GravitySolver:
    """Compiled gravity kernels for one simulation configuration."""

    def __init__(self, cfg: SimulationConfig, wiring: GravityWiring,
                 fsoft_by_type, soft_by_type, g_const: float,
                 hubble: float = 0.0):
        self.cfg = cfg
        self.wiring = wiring
        self.G = float(g_const)
        self.hubble = float(hubble)
        self.fsoft_by_type = jnp.asarray(fsoft_by_type)
        self.depth = cfg.tree_depth
        self._fat_warned = False
        self._rel_ready = False
        # cached tree for Gadget-style rebuild cadence: a full rebuild only
        # after TreeDomainUpdateFrequency * N force computations
        # (domain.c:76); between rebuilds moments are refreshed in place
        self._tree_cache = None
        self._forces_since_build = 0
        # periodic pure-tree runs need the lattice (Ewald) correction tables
        # (begrun.c:47-49: lattice_init when PERIODIC && !PMGRID); periodic
        # FORCETEST runs need them too — for the exact direct-sum oracle —
        # even under PMGRID (the `|| defined(FORCETEST)` in begrun.c:47),
        # but the short-range walk must NOT apply them (the mesh carries
        # the periodicity), so the oracle set is kept separate
        self.lattice_tables = None
        self.oracle_lattice_tables = None
        if cfg.periodic and (not cfg.pmgrid or cfg.force_test > 0):
            from .lattice import build_lattice_tables
            tabs = build_lattice_tables(wiring, cfg.ngravs_en, cfg.box_size)
            self.oracle_lattice_tables = tabs
            if not cfg.pmgrid:
                self.lattice_tables = tabs
        # TreePM: PM solver + short-range transition tables
        # (long_range_init, longrange.c:20; tabulation forcetree.c:3274)
        self.pm = None
        self.treepm = None
        if cfg.pmgrid:
            from .pm import PMSolver
            from .shortrange import shortrange_tables
            self.pm = PMSolver(wiring, cfg.pmgrid, cfg.box_size,
                               cfg.n_gravs, g_const, asmth_cells=cfg.asmth,
                               gradient=cfg.pm_gradient,
                               interlace=cfg.pm_interlace)
            self.pm.rcut = cfg.rcut * self.pm.asmth
            sr_ftab, sr_ptab = shortrange_tables(wiring, ntab=cfg.ntab)
            self.treepm = dict(sr_ftab=sr_ftab, sr_ptab=sr_ptab,
                               asmth=self.pm.asmth, rcut=self.pm.rcut)
            if cfg.ngravs_treepm_xition_check:
                # NGRAVS_TREEPM_XITION_CHECK (forcetree.c:3299-3391)
                from .shortrange import dump_transition_tables
                dump_transition_tables(wiring, sr_ftab, sr_ptab,
                                       self.pm.asmth, cfg.box_size,
                                       cfg.output_dir or ".")
        # fused single-dispatch walk caps (ops/walk.py) — per-BLOCK:
        # ent = accepted monopole nodes, chunk = leaf 8-row chunks,
        # frontier = per-level traversal slots (normalized to a tuple)
        from .walk import normalize_frontier_caps
        self.fcaps = dict(
            chunk=_bucket(cfg.walk_chunk_cap, 64),
            frontier=normalize_frontier_caps(cfg.walk_frontier_cap,
                                             self.depth))
        self.leaf_factor = 2.0  # leaf-chunk table rows per particle
        # measured per-level octet caps (walk.measure_octet_demand): the
        # static bound is ~10x a deep tree's real occupancy and the
        # packed mono region scales with its sum (walk.py
        # source_table_layout), so the first built tree sets these and
        # layout overflow re-measures
        self.octet_caps = None
        self._fns = {}   # (opening, caps-signature, n_targets) -> jitted fn

        c = cosmo_corrections(cfg, self.G, self.hubble, self.lattice_tables)
        self.fac_acc_com, self.fac_acc_lam = c.fac_acc_com, c.fac_acc_lam
        self.fac_pot_r2, self.madelung_by_grav = \
            c.fac_pot_r2, c.madelung_by_grav
        self._corr = c

    def _apply_corr(self, pos, mass, grav, acc, pot):
        return apply_cosmo_corrections(self._corr, pos, mass, grav, acc, pot)

    # ------------------------------------------------------------------
    def clamp_caps(self, n: int):
        """Clamp the fused-walk caps to theoretical maxima for an
        n-particle tree.  The config defaults target production sizes;
        small problems would otherwise pay full static shapes.  Demand
        can never exceed these bounds, so measured-demand growth is
        unaffected.  All caps are per-BLOCK (walk.py v3 row layout)."""
        from .walk import (frontier_slot_caps, normalize_frontier_caps,
                           octet_counts)
        slot_caps = frontier_slot_caps(n, self.depth,
                                       bucket=self.cfg.tree_bucket_size)
        n_oct = int(np.sum(octet_counts(n, self.depth,
                                        self.cfg.tree_bucket_size)))
        cap2 = ((int(n * self.leaf_factor) + 8 + 7) // 8) * 8
        fc = self.fcaps
        # unified chunk list: leaf chunks + n_gravs chunks per octet
        fc["chunk"] = min(fc["chunk"],
                          _bucket(cap2 // 8 + 1 + n_oct * self.cfg.n_gravs,
                                  64))
        fl = normalize_frontier_caps(fc["frontier"], self.depth)
        fc["frontier"] = tuple(min(f, c) for f, c in zip(fl, slot_caps))

    def grow_caps(self, max_ent: int, max_chunk: int, max_rows: int,
                  lvl_demand) -> None:
        """Resize the walk caps to measured peak demand (+25% margin,
        power-of-two buckets).  Per-level frontier demand equal to its
        cap means the level was truncated: at least double it.
        `max_chunk` is the peak per-block UNIFIED chunk demand; max_ent /
        max_rows are informational (record counts)."""
        from .walk import normalize_frontier_caps
        grow = lambda cur, mx: max(cur, _bucket(int(mx) * 5 // 4, 64))
        fc = self.fcaps
        fc["chunk"] = grow(fc["chunk"], max_chunk)
        fl = list(normalize_frontier_caps(fc["frontier"], self.depth))
        for lvl, d in enumerate(np.asarray(lvl_demand).reshape(-1)):
            if lvl > self.depth:
                break
            d = int(d)
            if d >= fl[lvl]:
                # clamp to the level's slot bound (8^lvl) like
                # normalize_frontier_caps — growing past it would just
                # oscillate against clamp_caps (a recompile each flip)
                fl[lvl] = min(max(fl[lvl] * 2, _bucket(d * 5 // 4, 64)),
                              8 ** min(lvl, 10))
        self.fcaps["frontier"] = tuple(fl)

    def tighten_caps(self, max_ent: int, max_chunk: int, lvl_demand,
                     max_rows: int = 0) -> bool:
        """Shrink caps toward measured demand (long runs: one recompile
        buys every later pass smaller static shapes).  Returns True if
        anything changed.  `max_rows` is the measured mono OCTET record
        demand; 0 keeps the mono cap unchanged."""
        from .walk import normalize_frontier_caps
        tight = lambda mx: _bucket(int(mx) * 5 // 4, 64)
        fc = dict(self.fcaps)
        fc["chunk"] = min(self.fcaps["chunk"], tight(max_chunk))
        fl = list(normalize_frontier_caps(self.fcaps["frontier"],
                                          self.depth))
        for lvl, d in enumerate(np.asarray(lvl_demand).reshape(-1)):
            if lvl > self.depth:
                break
            fl[lvl] = min(fl[lvl], tight(int(d)))
        fc["frontier"] = tuple(fl)
        changed = fc != self.fcaps
        self.fcaps = fc
        return changed

    # ------------------------------------------------------------------
    def _walk(self, want_pot: bool = True):
        """The fused single-dispatch walk (ops/walk.py), cached per caps."""
        cfg = self.cfg
        key = ("fwalk", self.depth, self.leaf_factor, want_pot,
               self.octet_caps) \
            + tuple(sorted(self.fcaps.items()))
        if key in self._fns:
            return self._fns[key]
        from .walk import make_fused_walk
        walk = make_fused_walk(
            self.wiring, n_gravs=cfg.n_gravs,
            depth=self.depth,
            bucket=cfg.tree_bucket_size,
            group_size=cfg.walk_group_size,
            batch_blocks=cfg.walk_batch_blocks,
            chunk_cap=self.fcaps["chunk"],
            frontier_cap=self.fcaps["frontier"],
            ec=cfg.walk_ec,
            theta=cfg.err_tol_theta,
            opening="relative",
            box_size=cfg.box_size if cfg.periodic else 0.0,
            leaf_factor=self.leaf_factor,
            want_pot=want_pot,
            lattice_tables=self.lattice_tables,
            treepm=self.treepm,
            octet_caps=self.octet_caps)
        self._fns[key] = walk
        return walk

    def _measure_octets(self, tree, n: int) -> None:
        """Set octet caps from the built tree's real per-level occupancy
        (x1.5 margin, rounded up to multiples of 64) so drifted rebuilds
        between measurements do not overflow AND re-measures of similar
        trees land on the SAME caps tuple — octet caps are part of the
        walk compile-cache key, so unbucketed caps would force a full
        fused-walk recompile on every re-measure."""
        from .walk import measure_octet_demand, octet_counts
        demand = measure_octet_demand(tree, n, self.depth,
                                      self.cfg.tree_bucket_size)
        bound = octet_counts(n, self.depth, self.cfg.tree_bucket_size)
        b64 = lambda x: ((max(x, 8) + 63) // 64) * 64 if x > 32 else \
            max(8, 1 << math.ceil(math.log2(max(x, 1))))
        new = tuple(
            min(b, b64(d * 3 // 2)) for d, b in zip(demand, bound))
        if new != self.octet_caps:
            # evict superseded compiled walks (stale entries would
            # accumulate unboundedly across overflow retries)
            self._fns = {k: v for k, v in self._fns.items()
                         if not (k[0] == "fwalk" and k[4] != new)}
            self.octet_caps = new

    def _tree_prep_fn(self, s: int, refresh: bool):
        """Jitted: build (or refresh) the tree + gather active targets."""
        key = ("prep", self.depth, s, refresh)
        if key in self._fns:
            return self._fns[key]
        cfg = self.cfg
        depth = self.depth
        fsoft_by_type = self.fsoft_by_type
        box = cfg.box_size if cfg.periodic else 0.0
        err_tol = cfg.err_tol_force_acc
        G = self.G

        if refresh:
            @jax.jit
            def fn(p, ti_current, hsml, cached):
                fsoft = fsoft_by_type[p.ptype]
                if cfg.adaptive_gravsoft_forgas:
                    # gas: spline softening = Hsml (gravtree.c:135-138)
                    fsoft = jnp.where(p.ptype == 0, hsml, fsoft)
                aold = err_tol * p.old_acc / G
                tree = refresh_tree(cached, p.pos, p.mass, p.grav, fsoft,
                                    aold, hsml, depth=depth,
                                    n_gravs=cfg.n_gravs,
                                    bucket=cfg.tree_bucket_size)
                mask_s = (p.ti_endstep == ti_current)[tree.order]
                tgt_sorted = jnp.nonzero(mask_s, size=s, fill_value=-1)[0] \
                    .astype(jnp.int32)
                return tree, tgt_sorted, jnp.zeros((), jnp.int32)
        else:
            @jax.jit
            def fn(p, ti_current, hsml, cached):
                fsoft = fsoft_by_type[p.ptype]
                if cfg.adaptive_gravsoft_forgas:
                    # gas: spline softening = Hsml (gravtree.c:135-138)
                    fsoft = jnp.where(p.ptype == 0, hsml, fsoft)
                aold = err_tol * p.old_acc / G  # walk works in G=1 units
                tree = build_tree(p.pos, p.mass, p.grav, fsoft, aold, hsml,
                                  depth=depth, n_gravs=cfg.n_gravs,
                                  bucket=cfg.tree_bucket_size, box_size=box,
                                  group_size=cfg.walk_group_size)
                mask_s = (p.ti_endstep == ti_current)[tree.order]
                tgt_sorted = jnp.nonzero(mask_s, size=s, fill_value=-1)[0] \
                    .astype(jnp.int32)
                # largest bucket-leaf occupancy: > bucket means the depth
                # limit truncates leaf evaluation (fat leaf) -> deepen
                fat = jnp.max(jnp.where(tree.node_terminal,
                                        tree.node_pcount, 0))
                return tree, tgt_sorted, fat

        self._fns[key] = fn
        return fn

    def _tree_scatter_fn(self, s: int, want_pot: bool):
        """Jitted: scatter walk results back to original particle order.
        Plain force passes leave p.potential untouched (the reference
        refreshes potentials only in dedicated compute_potential passes,
        potential.c:22; accelerations never read it)."""
        key = ("scatter", s, want_pot)
        if key in self._fns:
            return self._fns[key]
        G = self.G

        @jax.jit
        def fn(p, order, tgt_sorted, acc, pot, ninteract):
            valid = tgt_sorted >= 0
            # padding rows scatter out of bounds and are dropped
            orig = jnp.where(valid, order[jnp.maximum(tgt_sorted, 0)], p.n)
            safe = jnp.minimum(orig, p.n - 1)
            acc, amag, pot = self._apply_corr(
                p.pos[safe], p.mass[safe], p.grav[safe], acc * G, pot * G)
            new_acc = p.accel.at[orig].set(acc, mode="drop")
            new_pot = (p.potential.at[orig].set(pot, mode="drop")
                       if want_pot else p.potential)
            new_old = p.old_acc.at[orig].set(amag, mode="drop")
            new_cost = p.grav_cost.at[orig].set(
                ninteract.astype(p.grav_cost.dtype), mode="drop")
            n_ia = jnp.sum(jnp.where(valid, ninteract, 0))
            return p.replace(accel=new_acc, potential=new_pot,
                             old_acc=new_old, grav_cost=new_cost), n_ia

        self._fns[key] = fn
        return fn

    def _direct_fn(self, s: int):
        key = ("direct", s)
        if key in self._fns:
            return self._fns[key]
        cfg, wiring, G = self.cfg, self.wiring, self.G
        fsoft_by_type = self.fsoft_by_type
        box = cfg.box_size if cfg.periodic else 0.0

        @jax.jit
        def fn(p, ti_current, hsml):
            fsoft = fsoft_by_type[p.ptype]
            if cfg.adaptive_gravsoft_forgas:
                fsoft = jnp.where(p.ptype == 0, hsml, fsoft)
            mask = p.ti_endstep == ti_current
            tgt = jnp.nonzero(mask, size=s, fill_value=-1)[0].astype(jnp.int32)
            acc, pot = direct_forces(wiring, p.pos, p.mass, p.grav, fsoft,
                                     tgt_idx=tgt, box=box,
                                     chunk=min(1024, s),
                                     lattice_tables=self.lattice_tables)
            idx = jnp.where(tgt >= 0, tgt, p.n)  # padding dropped
            safe = jnp.minimum(idx, p.n - 1)
            acc, amag, pot = self._apply_corr(
                p.pos[safe], p.mass[safe], p.grav[safe], acc * G, pot * G)
            new_acc = p.accel.at[idx].set(acc, mode="drop")
            new_pot = p.potential.at[idx].set(pot, mode="drop")
            new_old = p.old_acc.at[idx].set(amag, mode="drop")
            npair = jnp.asarray(min(s * p.pos.shape[0], 2**31 - 1),
                                jnp.int32)
            return ForceResult(new_acc, new_pot, new_old, p.grav_cost,
                               jnp.zeros((), bool), npair)

        self._fns[key] = fn
        return fn

    def uses_direct(self, n: int) -> bool:
        """Whether compute() will take the exact O(N^2) path for n particles.

        An explicitly requested tree solver is honored even at small n
        (parity/production-path tests rely on this); only "auto"/"direct"
        configs reroute small problems to the exact sweep."""
        if self.treepm is not None:
            return False
        if self.cfg.solver == "direct":
            return True
        if self.cfg.solver == "tree":
            return False
        return (n <= 2 * self.cfg.tree_group_size
                or n <= self.cfg.direct_crossover)

    def pm_forces(self, p):
        """Long-range PM accelerations for ALL particles (long_range_force,
        longrange.c:56 -> pmforce_periodic)."""
        return self.pm.forces(p.pos, p.mass, p.grav)

    # ------------------------------------------------------------------
    def compute(self, p, ti_current, n_active: int, opening: str = "relative",
                hsml=None, want_pot: bool = False):
        """Compute forces for the active set; returns (particles', n_ia,
        tree) — the octree is shared with the SPH passes (hsml feeds the
        node hmax fields used by the symmetric neighbor search).

        `want_pot=False` (the default force pass) skips the potential
        accumulation entirely — roughly half the pair-evaluation FLOPs —
        and leaves p.potential stale, exactly like the reference
        (potentials only refresh in compute_potential passes).

        Handles walk-cap overflow by resizing the offending caps to the
        measured demand and recompiling (at most a few times per run).
        """
        if hsml is None:
            hsml = jnp.zeros((p.n,), p.mass.dtype)
        s = _bucket(min(n_active, p.n) if n_active else p.n)
        s = min(s, _bucket(p.n))
        # under TreePM the direct path would double-count the long range
        if self.uses_direct(p.n):
            r = self._direct_fn(s)(p, ti_current, hsml)
            p = p.replace(accel=r.acc, potential=r.pot, old_acc=r.old_acc,
                          grav_cost=r.grav_cost)
            return p, int(r.n_interactions), None

        if self.cfg.type_of_opening_criterion == 0:
            opening = "bh"
        elif opening == "relative" and not self._rel_ready:
            # the relative criterion needs a prior acceleration; with
            # OldAcc == 0 it would open every node (frontier explosion).
            # The reference bootstraps the first force computation with the
            # geometric criterion (accel.c:48-52); guard likewise here for
            # callers that skip the runner's bootstrap.
            if float(jax.device_get(jnp.max(p.old_acc))) == 0.0:
                opening = "bh"
            else:
                self._rel_ready = True
        from .morton import MAX_DEPTH
        self.clamp_caps(p.n)
        can_refresh = (self._tree_cache is not None
                       and self._forces_since_build
                       < self.cfg.tree_domain_update_frequency * p.n)
        while True:
            tree, tgt_sorted, fat = self._tree_prep_fn(s, can_refresh)(
                p, ti_current, hsml, self._tree_cache)
            if can_refresh:
                break
            fat_v, need = (int(x) for x in
                           jax.device_get((fat, tree.n_chunk_rows)))
            # leaf-chunk table capacity (walk layout) vs measured demand
            cap2 = ((int(p.n * self.leaf_factor) + 8 + 7) // 8) * 8
            if need > cap2:
                self.leaf_factor = need * 1.25 / p.n
            if fat_v <= self.cfg.tree_bucket_size and self.depth >= 1:
                break
            if self.depth >= MAX_DEPTH:
                if not self._fat_warned:
                    import warnings
                    warnings.warn(
                        f"octree bucket leaves still hold {fat_v} > "
                        f"{self.cfg.tree_bucket_size} particles at the "
                        f"maximum depth {MAX_DEPTH}; near-coincident "
                        "particles will interact via softened truncated "
                        "leaves")
                    self._fat_warned = True
                break
            # fat leaves: deepen the tree (recompiles build + walk);
            # per-level octet caps are depth-shaped -> re-measure
            self.depth = min(self.depth + 3, MAX_DEPTH)
            self.octet_caps = None
        if self.octet_caps is None:
            self._measure_octets(tree, p.n)
        for _ in range(8):
            res = self._walk(want_pot)(tree, tgt_sorted,
                                       opening_override=opening)
            ovf, lovf, me, mc, mr = (int(x) for x in jax.device_get(
                (res.overflow, res.layout_ovf, res.max_ent, res.max_chunk,
                 res.max_rows)))
            mf = jax.device_get(res.max_frontier)
            if not ovf:
                # shrink caps toward measured demand once per run: walk
                # cost is cap-proportional (static shapes), so one
                # recompile buys every later pass ~cap-slack x less work
                if not getattr(self, "_tightened", False):
                    self._tightened = True
                    self.tighten_caps(me, mc, mf, mr)
                break
            # resize each cap to the measured peak demand (+25% margin,
            # rounded to a power of two) and recompile once.  Truncated
            # demands (== cap) at least double.  Only an octet-LAYOUT
            # overflow needs an octet re-measure (it has no demand stat);
            # chunk/frontier overflows must not pay the [M]-sized host
            # fetch or churn the walk cache key.
            if lovf:
                self._measure_octets(tree, p.n)
            self.grow_caps(me, mc, mr, mf)
        else:
            raise RuntimeError(
                f"tree walk caps still overflowing at {self.fcaps}")
        p, n_ia = self._tree_scatter_fn(s, want_pot)(
            p, tree.order, tgt_sorted, res.acc, res.pot, res.ninteract)
        if can_refresh:
            self._forces_since_build += min(n_active, p.n)
        else:
            self._forces_since_build = min(n_active, p.n)
        self._tree_cache = tree
        return p, int(n_ia), tree

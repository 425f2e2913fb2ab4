"""CPU coverage for the TPU Pallas pairwise kernel (interpret mode).

The hot kernel (ops/pairwise_pallas.py) normally compiles only on TPU; the
Pallas interpreter lets the CPU suite pin its physics against the plain
jnp law evaluation — multi-gravity dispatch, softening-spline switch,
self/padding masking, and the analytic TreePM truncation
(forcetree.c:1958-2027)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngravs_tpu.models import laws as L
from ngravs_tpu.models.wiring import GravityWiring
from ngravs_tpu.ops.pairwise_pallas import make_pairwise_kernel


def _pack_sources(spos, smass, sgrav, ssoft, sgid, S_cap):
    S = len(spos)
    # column layout: FX FY FZ FMASS FSOFT FCOUNT IGRAV IGID
    # (pairwise_pallas.py:40)
    sp = np.zeros((1, 8, S_cap), np.float32)
    sp[0, 0, :S], sp[0, 1, :S], sp[0, 2, :S] = spos.T
    sp[0, 3, :S] = smass
    sp[0, 4, :S] = ssoft
    sp[0, 5, :S] = 1.0       # count (accumulator laws)
    sp[0, 6, :] = np.frombuffer(
        np.pad(sgrav, (0, S_cap - S)).astype(np.int32).tobytes(), np.float32)
    gid = np.full(S_cap, -1, np.int32)
    gid[:S] = sgid
    sp[0, 7, :] = np.frombuffer(gid.tobytes(), np.float32)
    return jnp.asarray(sp)


def _targets(tpos, tmass, tgrav, tfsoft, tgid):
    G = len(tpos)
    col = lambda a, d=None: jnp.asarray(
        np.asarray(a, d or np.float32).reshape(G, 1))
    return dict(x=col(tpos[:, 0]), y=col(tpos[:, 1]), z=col(tpos[:, 2]),
                mass=col(tmass), grav=col(tgrav, np.int32),
                fsoft=col(tfsoft), gid=col(tgid, np.int32))


@pytest.mark.parametrize("treepm", [False, True])
def test_pallas_kernel_matches_law_eval(treepm):
    rng = np.random.default_rng(3)
    box = 10.0
    asmth = 0.6 if treepm else 0.0
    w = GravityWiring([[L.Newtonian(), L.Newtonian()],
                       [L.Newtonian(), L.Yukawa(2.0, box, pmgrid=16)]]) \
        if not treepm else GravityWiring([[L.Newtonian()]])
    ng = w.n_gravs
    G, S = 16, 128
    tpos = rng.uniform(0, box, (G, 3)).astype(np.float32)
    spos = rng.uniform(0, box, (S, 3)).astype(np.float32)
    tmass = rng.uniform(0.5, 2, G).astype(np.float32)
    smass = rng.uniform(0.5, 2, S).astype(np.float32)
    tgrav = rng.integers(0, ng, G).astype(np.int32)
    sgrav = rng.integers(0, ng, S).astype(np.int32)
    tsoft = np.full(G, 0.3, np.float32)
    ssoft = np.full(S, 0.3, np.float32)
    tgid = np.arange(G, dtype=np.int32)
    sgid = np.arange(S, dtype=np.int32)
    sgid[:G] = tgid           # first G sources ARE the targets (self-mask)

    fn = make_pairwise_kernel(w, ng, group=G, s_chunk=S,
                              box_size=box, treepm_asmth=asmth,
                              interpret=True)
    acc, pot, nia = fn(_targets(tpos, tmass, tgrav, tsoft, tgid),
                       _pack_sources(spos, smass, sgrav, ssoft, sgid, S),
                       jnp.asarray([[S]], jnp.int32))
    acc = np.asarray(acc)[:G]
    pot = np.asarray(pot)[:G]
    nia = np.asarray(nia)[:G]

    # reference evaluation with the same laws, masks and min-image
    dx = spos[None, :, :] - tpos[:, None, :]
    dx -= box * np.round(dx / box)
    r2 = (dx ** 2).sum(-1)
    r = np.sqrt(r2)
    h = np.maximum(tsoft[:, None], ssoft[None, :])
    mask = sgid[None, :] != tgid[:, None]
    acc_ref = np.zeros((G, 3))
    pot_ref = np.zeros(G)
    for i in range(G):
        for j in range(S):
            if not mask[i, j]:
                continue
            law = w.law(int(tgrav[i]), int(sgrav[j]))
            rr, hh = float(r[i, j]), float(h[i, j])
            if treepm:
                sf, sp_ = law.kernel_shortrange()
                u = rr / (2 * asmth)
                if u >= 3.0:
                    continue
                if rr >= hh:
                    fac = float(law.accel(tmass[i], smass[j], rr * rr, rr, 1)
                                ) * float(sf(u)) / max(rr, 1e-37)
                    pp = -float(law.potential(tmass[i], smass[j],
                                              rr * rr, rr, 1)) * float(sp_(u))
                else:
                    fac = float(law.spline(tmass[i], smass[j], hh, rr, 1))
                    pp = float(law.spline_pot(tmass[i], smass[j], hh, rr, 1))
            else:
                fac = float(law.force_factor(tmass[i], smass[j], rr * rr,
                                             rr, hh, 1))
                pp = float(law.potential_factor(tmass[i], smass[j], rr * rr,
                                                rr, hh, 1))
            acc_ref[i] += fac * dx[i, j]
            pot_ref[i] += pp

    scale = np.abs(acc_ref).max()
    np.testing.assert_allclose(acc, acc_ref, atol=3e-5 * scale)
    np.testing.assert_allclose(pot, pot_ref, rtol=2e-4,
                               atol=2e-5 * np.abs(pot_ref).max())
    if not treepm:
        np.testing.assert_array_equal(nia, np.full(G, S - 1))

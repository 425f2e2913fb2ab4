"""Micro-benchmark: octet-traversal cost components at production shapes.

Replays the fused walk's per-level pattern (octet gather -> opening tests
-> expansion compaction) on synthetic data, at the exact shapes the 1e6
probe runs, isolating gather / tests / expansion so the real bottleneck is
measured instead of inferred (XLA dead-code-eliminates unused stages in
the real walk, which makes stage-delta timings lie).

Usage: python benchmarks/trav_micro.py [B] [mode]
  mode: gather | tests | expand | all
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
S = 4
NG = 2
W = 16
NOCT = 200_000            # octet table size at ~1e6 particles
# per-level frontier octet caps (1e6 tightened demand / 8)
FO_LS = [8, 51, 81, 107, 95, 72]
NBATCH = 123

rng = np.random.default_rng(0)
wtab8 = jnp.asarray(rng.uniform(size=(NOCT, 8, W)), jnp.float32)
lo_b = jnp.asarray(rng.uniform(0, 900, (B, S, 3)), jnp.float32)
hi_b = lo_b + 10.0
aold_s = jnp.full((B, S), 1e-3, jnp.float32)
fronts = [jnp.asarray(rng.integers(0, NOCT, (B, fo)), jnp.int32)
          for fo in FO_LS]


def level(foct, lvl, do_tests, do_expand):
    Fo = foct.shape[1]
    F = Fo * 8
    wno = wtab8[foct]                       # [B, Fo, 8, W]
    wn = wno.reshape(B, F, W)
    if not do_tests:
        return jnp.sum(wn)
    flags = jax.lax.bitcast_convert_type(wn[:, :, 3], jnp.int32)
    valid = (flags & 255) != 0
    center = wn[:, :, 0:3]
    cg = wn[:, :, 8:8 + 4 * NG].reshape(B, F, NG, 4)
    cm = cg[..., 0:3]
    m_g = cg[..., 3]
    cell_len = np.float32(1000.0 * 2.0 ** -lvl)
    big = np.float32(1e30)

    r2min = jnp.full((B, F, S), big)
    for g in range(NG):
        d2 = jnp.zeros((B, F, S), jnp.float32)
        for ax in range(3):
            dd = jnp.maximum(
                jnp.maximum(lo_b[:, None, :, ax] - cm[:, :, None, g, ax],
                            cm[:, :, None, g, ax] - hi_b[:, None, :, ax]),
                0.0)
            d2 = d2 + dd * dd
        r2min = jnp.minimum(r2min,
                            jnp.where(m_g[:, :, None, g] > 0, d2, big))
    mtot = jnp.sum(m_g, axis=-1)
    open_rel = (mtot[:, :, None] * cell_len * cell_len
                > r2min * r2min * aold_s[:, None, :])
    inter = jnp.ones((B, F, S), bool)
    for ax in range(3):
        gx = jnp.maximum(lo_b[:, None, :, ax] - center[:, :, None, ax],
                         center[:, :, None, ax] - hi_b[:, None, :, ax])
        inter = inter & (gx < 0.6 * cell_len)
    must = jnp.any(open_rel | inter, axis=-1)
    accept = valid & ~must
    expand = valid & must & ((flags & 1) == 0)
    if not do_expand:
        return jnp.sum(accept) + jnp.sum(expand)
    co = jax.lax.bitcast_convert_type(wn[:, :, 4], jnp.int32) % NOCT
    exp_ok = expand
    if MODE == "cumsum":
        pos = jnp.cumsum(exp_ok.astype(jnp.int32), axis=1)
        return jnp.sum(pos) + jnp.sum(accept)
    if MODE == "mmcs":
        # cumsum as a triangular matmul on the MXU
        tri = jnp.asarray(np.tril(np.ones((F, F), np.float32)))
        pos = (exp_ok.astype(jnp.float32) @ tri.T).astype(jnp.int32)
        idx = jnp.where(exp_ok, pos - 1, F)
        rows2 = np.arange(B, dtype=np.int32)[:, None]
        nf = jnp.zeros((B, F), jnp.int32).at[rows2, idx].set(co, mode="drop")
        return jnp.sum(nf) + jnp.sum(accept)
    if MODE == "sortc":
        # compaction by stable sort on the not-selected key
        key = jnp.where(exp_ok, 0, 1).astype(jnp.int32)
        _, nf = jax.lax.sort((key, co), num_keys=1, dimension=1)
        return jnp.sum(nf) + jnp.sum(accept)
    pos = jnp.cumsum(exp_ok.astype(jnp.int32), axis=1)
    idx = jnp.where(exp_ok, pos - 1, F)
    rows2 = np.arange(B, dtype=np.int32)[:, None]
    nf = jnp.zeros((B, F), jnp.int32).at[rows2, idx].set(co, mode="drop")
    return jnp.sum(nf) + jnp.sum(accept)


@jax.jit
def one_batch():
    acc = jnp.zeros((), jnp.float32)
    for lvl, f in enumerate(fronts):
        r = level(f, lvl + 2,
                  MODE in ("tests", "expand", "all", "cumsum", "mmcs",
                           "sortc"),
                  MODE in ("expand", "all", "cumsum", "mmcs", "sortc"))
        acc = acc + jnp.sum(r).astype(jnp.float32)
    return acc


def run():
    float(one_batch())
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        a = one_batch()
    float(a)
    dt = (time.time() - t0) / reps
    print(f"mode={MODE} B={B}: {dt*1e3:.2f} ms/batch "
          f"-> x{NBATCH} batches = {dt*NBATCH*1e3:.0f} ms/pass-equivalent")


run()

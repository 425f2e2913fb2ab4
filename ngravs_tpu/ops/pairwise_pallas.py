"""Pallas TPU kernel for batched pairwise force accumulation.

The hot op of the whole framework: evaluate the ngravs force-law matrix over
[targets x sources] tiles and accumulate accelerations/potentials.  Replaces
the inner loops of the reference's tree walk (forcetree.c:1536-1583) and
direct summation (forcetree.c:3428-3548).

Sources are *generalized*: a real particle or a tree-node monopole (per
gravity type) — both reduce to (pos, mass, gravity index, softening,
accumulator count, id).  The caller concatenates node entries and leaf
particles into one source list per target block, so a single kernel
invocation per block batch computes the entire interaction list.

Layout (per grid step (b, i)):
  * targets: [G, 1] column tiles (arrays stacked as [bb*G, 1])
  * sources: field-packed [bb, 8, S] arrays, blocks (1, 8, s_chunk) —
    row 0..5 of the float pack = x, y, z, mass, soft, count;
    row 0..1 of the int pack = gravity index, source id
  * pair tiles [G, Sc]: targets on sublanes, sources on lanes
  * accumulators in VMEM scratch [G, 8]; flushed to the output at the last
    source chunk of each block

All law math runs on the VPU inside VMEM — no HBM intermediates, unlike the
XLA fallback which materializes [G, S] planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.wiring import GravityWiring

# packed source-table rows ([8, S] blocks; 6/7 are bitcast int32)
FX, FY, FZ, FMASS, FSOFT, FCOUNT, IGRAV, IGID = 0, 1, 2, 3, 4, 5, 6, 7


def _pair_mask_expr(pair_slots, tg, sg):
    """OR of (tg==i)&(sg==j) over the law's slots — branch-free dispatch,
    avoiding a gather inside the kernel."""
    m = None
    for (i, j) in pair_slots:
        mij = (tg == i) & (sg == j)
        m = mij if m is None else (m | mij)
    return m


def make_pairwise_kernel(wiring: GravityWiring, n_gravs: int,
                         group: int, s_chunk: int = 512,
                         box_size: float = 0.0,
                         want_pot: bool = True,
                         accumulator: bool | None = None,
                         treepm_asmth: float = 0.0,
                         interpret: bool = False):
    """Returns fn(targets, sources) -> (acc [B*G,3], pot [B*G], nia [B*G]).

    targets: dict of [B*G, 1] arrays: x, y, z, mass, grav(i32), fsoft,
             gid(i32; -1 padding)
    sources: dict of [B, S] arrays: x, y, z, mass, grav(i32), soft,
             count, gid(i32; -1 padding, -2 node entries)
    """
    groups = wiring.unique_laws()
    single_law = len(groups) == 1
    periodic = box_size > 0
    use_count = wiring.accumulator if accumulator is None else accumulator
    treepm = treepm_asmth > 0
    inv2a = 0.5 / treepm_asmth if treepm else 0.0

    def law_factors(law, tmass, smass, r2, r, h, scount):
        """force/potential factors, analytic-truncated under TreePM
        (forcetree.c:1958-2027 with the law's closed form)."""
        if not treepm:
            fac = law.force_factor(tmass, smass, r2, r, h, scount)
            pot = law.potential_factor(tmass, smass, r2, r, h, scount) \
                if want_pot else None
            return fac, pot
        u = r * inv2a
        sf, sp = law.kernel_shortrange()
        unsoft = law.accel(tmass, smass, r2, r, scount) * sf(u) \
            / jnp.maximum(r, 1e-37)
        soft = law.spline(tmass, smass, h, r, scount)
        inside = u < 3.0
        fac = jnp.where(inside, jnp.where(r >= h, unsoft, soft), 0.0)
        pot = None
        if want_pot:
            punsoft = -law.potential(tmass, smass, r2, r, scount) * sp(u)
            psoft = law.spline_pot(tmass, smass, h, r, scount)
            pot = jnp.where(inside, jnp.where(r >= h, punsoft, psoft), 0.0)
        return fac, pot

    def kernel(nsrc, tx, ty, tz, tm, tg, tf, tgid, sp, out, accbuf):
        i = pl.program_id(1)
        ni = pl.num_programs(1)

        @pl.when(i == 0)
        def _():
            accbuf[:, :] = jnp.zeros_like(accbuf)

        # per-block early exit: chunks past this block's valid source count
        # cost only their (tiny) DMA, making walk cost demand-proportional
        # instead of worst-block-cap-proportional
        b = pl.program_id(0)

        @pl.when(i * s_chunk < nsrc[b])
        def _compute():
            sx = sp[0, FX:FX + 1, :]            # [1,Sc]
            sy = sp[0, FY:FY + 1, :]
            sz = sp[0, FZ:FZ + 1, :]
            smass = sp[0, FMASS:FMASS + 1, :]
            ssoft = sp[0, FSOFT:FSOFT + 1, :]
            sgid = pltpu.bitcast(sp[0, IGID:IGID + 1, :], jnp.int32)

            dx = sx - tx[:, :]                  # [1,Sc]-[G,1] -> [G,Sc]
            dy = sy - ty[:, :]
            dz = sz - tz[:, :]
            if periodic:
                dx = dx - box_size * jnp.round(dx * (1.0 / box_size))
                dy = dy - box_size * jnp.round(dy * (1.0 / box_size))
                dz = dz - box_size * jnp.round(dz * (1.0 / box_size))
            r2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(r2)
            h = jnp.maximum(tf[:, :], ssoft)
            tmass = tm[:, :]
            scount = sp[0, FCOUNT:FCOUNT + 1, :] if use_count else 1.0
            valid = (sgid != -1) & (tgid[:, :] >= 0) & (sgid != tgid[:, :])

            if single_law:
                law = groups[0][0]
                fac, pot = law_factors(law, tmass, smass, r2, r, h, scount)
            else:
                tgv = tg[:, :]
                sgv = pltpu.bitcast(sp[0, IGRAV:IGRAV + 1, :], jnp.int32)
                fac = jnp.zeros_like(r2)
                pot = jnp.zeros_like(r2) if want_pot else None
                for law, slots in groups:
                    m = _pair_mask_expr(slots, tgv, sgv)
                    f_k, p_k = law_factors(law, tmass, smass, r2, r, h,
                                           scount)
                    fac = jnp.where(m, f_k, fac)
                    if want_pot:
                        pot = jnp.where(m, p_k, pot)
            fac = jnp.where(valid, fac, 0.0)

            ax = jnp.sum(fac * dx, axis=1, keepdims=True)      # [G,1]
            ay = jnp.sum(fac * dy, axis=1, keepdims=True)
            az = jnp.sum(fac * dz, axis=1, keepdims=True)
            if want_pot:
                pp = jnp.sum(jnp.where(valid, pot, 0.0), axis=1, keepdims=True)
            else:
                pp = jnp.zeros_like(ax)
            nv = jnp.sum(jnp.where(valid, 1.0, 0.0), axis=1, keepdims=True)
            delta = jnp.concatenate(
                [ax, ay, az, pp, nv, jnp.zeros((ax.shape[0], 3), ax.dtype)],
                axis=1)
            accbuf[:, :] = accbuf[:, :] + delta

        @pl.when(i == ni - 1)
        def _():
            out[:, :] = accbuf[:, :]

    @jax.jit
    def fn(targets: dict, spacked, n_src):
        """spacked: [bb, 8, S] packed source table (see row constants);
        n_src: [bb, 1] int32 valid-source counts per block."""
        bg = targets["x"].shape[0]
        bb, _, s = spacked.shape
        assert bg == bb * group, (bg, bb, group)
        assert s % s_chunk == 0, (s, s_chunk)
        ns = s // s_chunk

        f32 = lambda a: a.astype(jnp.float32)
        i32 = lambda a: a.astype(jnp.int32)

        t_spec = pl.BlockSpec((group, 1), lambda b, i, *_: (b, 0),
                              memory_space=pltpu.VMEM)

        def s_index(b, i, nsrc):
            # clamp chunk steps past this block's live source count to the
            # last live chunk: consecutive equal indices elide the DMA, so
            # dead steps (skipped by the kernel's early exit) cost nothing
            last = jnp.maximum((nsrc[b] + s_chunk - 1) // s_chunk - 1, 0)
            return (b, 0, jnp.minimum(i, last))

        s_spec = pl.BlockSpec((1, 8, s_chunk), s_index,
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((group, 8), lambda b, i, *_: (b, 0),
                                memory_space=pltpu.VMEM)

        targs = [f32(targets["x"]), f32(targets["y"]), f32(targets["z"]),
                 f32(targets["mass"]), i32(targets["grav"]),
                 f32(targets["fsoft"]), i32(targets["gid"])]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bb, ns),
            in_specs=[t_spec] * 7 + [s_spec],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((group, 8), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bg, 8), jnp.float32),
            # interpret=True runs the kernel through the Pallas interpreter
            # so the TPU hot path is testable on the CPU suite
            interpret=interpret,
        )(n_src.reshape(-1).astype(jnp.int32), *targs, spacked)
        return out[:, :3], out[:, 3], out[:, 4].astype(jnp.int32)

    return fn

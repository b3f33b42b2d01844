"""Stripe-lane fused axial-attention kernels for SMALL spans.

MedT's local branch (reference axialnet.py:661-700, space-to-batch'd in
models/medt.py) runs axial attention at spans 16/8/4/2 over a huge stripe
count (batch x patch-grid x orthogonal axis ~ 10^4). The stripe-block
kernels in ops/pallas_axial_train.py put the span L on the lane axis — at
L=16 that wastes 7/8 of every (8, 128) f32 tile and most of the VPU, so
they only win for L >= 32 and the local branch fell back to XLA, which
materializes the (S, g, L, L) logits/softmax chain in HBM (hundreds of MB
per layer at batch 56 — the measured throughput ceiling of the whole model).

This module's kernels transpose the problem instead: the huge stripe axis S
lives on the LANES, the tiny span L on sublanes. Every elementwise op and
reduction then runs on fully-utilized (L, L, Sb) tiles, the L x L attention
matrix per stripe is built by VPU broadcasts (no MXU needed — contraction
depths c <= 16 at these widths), and the whole qk -> affine -> softmax ->
sv/sve chain stays in VMEM. HBM traffic drops from O(S L^2) logits tensors
to the O(S L) q/k/v/out tensors themselves.

Same contract as ``fused_attn_core`` (ops/pallas_axial_train.py) — the
factorized-BN affine fold, gating, and output BN stay in differentiable XLA
outside — but with inputs/outputs in stripe-last layout:

    q, k: (g, c, L, S);  v: (g, gp, L, S);  sv, sve: (g, gp, L, S)
    qemb: (c, L, L);  kemb_t[c, i, j] = kemb[c, j, i] (pre-swapped);
    vemb: (gp, L, L);  sim_affine: (g, 8) packed like pack_sim_affine.

Backward recomputes the softmax in VMEM (recompute beats HBM round-trips)
and accumulates table/affine gradients across the grid in resident blocks.
Reference math: axialnet.py:62-82.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _qk_lanes(q, k):
    """qk[i, j, s] = sum_c q[c, i, s] * k[c, j, s] via VPU broadcasts."""
    c = q.shape[0]
    acc = q[0][:, None, :] * k[0][None, :, :]
    for ci in range(1, c):
        acc += q[ci][:, None, :] * k[ci][None, :, :]
    return acc  # (L, L, S)


def _pos_logits(q, k, qemb, kemb_t):
    """qr[i,j,s] = sum_c q[c,i,s] qemb[c,i,j]; kr[i,j,s] = sum_c k[c,j,s]
    kemb_t[c,i,j] (tables broadcast over lanes)."""
    c = q.shape[0]
    qr = q[0][:, None, :] * qemb[0][:, :, None]
    kr = k[0][None, :, :] * kemb_t[0][:, :, None]
    for ci in range(1, c):
        qr += q[ci][:, None, :] * qemb[ci][:, :, None]
        kr += k[ci][None, :, :] * kemb_t[ci][:, :, None]
    return qr, kr


def _softmax_j(logits):
    mx = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - mx)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _sv_lanes(sim, v):
    """sv[p, i, s] = sum_j sim[i, j, s] * v[p, j, s]."""
    gp = v.shape[0]
    return jnp.stack(
        [jnp.sum(sim * v[p][None, :, :], axis=1) for p in range(gp)])


def _sve_lanes(sim, vemb):
    """sve[p, i, s] = sum_j sim[i, j, s] * vemb[p, i, j]."""
    gp = vemb.shape[0]
    return jnp.stack(
        [jnp.sum(sim * vemb[p][:, :, None], axis=1) for p in range(gp)])


def _fwd_kernel(q_ref, k_ref, v_ref, qemb_ref, kembt_ref, vemb_ref, aff_ref,
                sv_ref, sve_ref, *, has_pos: bool):
    g = q_ref.shape[0]
    for grp in range(g):
        aff = aff_ref[grp]
        logits = _qk_lanes(q_ref[grp], k_ref[grp]) * aff[0] + aff[1]
        if has_pos:
            qr, kr = _pos_logits(q_ref[grp], k_ref[grp], qemb_ref[...],
                                 kembt_ref[...])
            logits = logits + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        sim = _softmax_j(logits)
        sv_ref[grp] = _sv_lanes(sim, v_ref[grp])
        if has_pos:
            sve_ref[grp] = _sve_lanes(sim, vemb_ref[...])


def _bwd_kernel(q_ref, k_ref, v_ref, qemb_ref, kembt_ref, vemb_ref, aff_ref,
                dsv_ref, dsve_ref,
                dq_ref, dk_ref, dv_ref,
                dqemb_ref, dkembt_ref, dvemb_ref, daff_ref,
                *, has_pos: bool):
    step = pl.program_id(0)
    g = q_ref.shape[0]
    daff_rows = []
    for grp in range(g):
        aff = aff_ref[grp]
        q, k, v = q_ref[grp], k_ref[grp], v_ref[grp]
        dsv = dsv_ref[grp]
        c, gp = q.shape[0], v.shape[0]

        qk = _qk_lanes(q, k)
        logits = qk * aff[0] + aff[1]
        if has_pos:
            qemb, kemb_t, vemb = qemb_ref[...], kembt_ref[...], vemb_ref[...]
            qr, kr = _pos_logits(q, k, qemb, kemb_t)
            logits = logits + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        sim = _softmax_j(logits)

        # dv[p, j, s] = sum_i dsv[p, i, s] sim[i, j, s]
        dv_ref[grp] = jnp.stack(
            [jnp.sum(dsv[p][:, None, :] * sim, axis=0) for p in range(gp)])

        # dsim[i,j,s] = sum_p dsv[p,i,s] v[p,j,s] (+ sum_p dsve[p,i,s] vemb[p,i,j])
        dsim = dsv[0][:, None, :] * v[0][None, :, :]
        for p in range(1, gp):
            dsim += dsv[p][:, None, :] * v[p][None, :, :]
        if has_pos:
            dsve = dsve_ref[grp]
            for p in range(gp):
                dsim += dsve[p][:, None, :] * vemb[p][:, :, None]

        # softmax backward over j
        dlog = sim * (dsim - jnp.sum(sim * dsim, axis=1, keepdims=True))

        db = jnp.sum(dlog)
        if has_pos:
            daff_rows.append(jnp.stack(
                [jnp.sum(dlog * qk), db, jnp.sum(dlog * qr), db,
                 jnp.sum(dlog * kr), db,
                 jnp.zeros((), _F32), jnp.zeros((), _F32)]))
        else:
            z = jnp.zeros((), _F32)
            daff_rows.append(jnp.stack([jnp.sum(dlog * qk), db,
                                        z, z, z, z, z, z]))

        d_qk = dlog * aff[0]
        # dq[c,i,s] = sum_j d_qk[i,j,s] k[c,j,s] (+ sum_j d_qr[i,j,s] qemb[c,i,j])
        # dk[c,j,s] = sum_i d_qk[i,j,s] q[c,i,s] (+ sum_i d_kr[i,j,s] kemb_t[c,i,j])
        if has_pos:
            d_qr = dlog * aff[2]
            d_kr = dlog * aff[4]
            dq_ref[grp] = jnp.stack(
                [jnp.sum(d_qk * k[ci][None, :, :], axis=1)
                 + jnp.sum(d_qr * qemb[ci][:, :, None], axis=1)
                 for ci in range(c)])
            dk_ref[grp] = jnp.stack(
                [jnp.sum(d_qk * q[ci][:, None, :], axis=0)
                 + jnp.sum(d_kr * kemb_t[ci][:, :, None], axis=0)
                 for ci in range(c)])
            # table grads (summed over lanes s and, at step>0, the grid)
            dqe = jnp.stack([jnp.sum(d_qr * q[ci][:, None, :], axis=2)
                             for ci in range(c)])
            dke = jnp.stack([jnp.sum(d_kr * k[ci][None, :, :], axis=2)
                             for ci in range(c)])
            dve = jnp.stack([jnp.sum(sim * dsve[p][:, None, :], axis=2)
                             for p in range(gp)])
            first = (step == 0) if grp == 0 else False

            @pl.when(first)
            def _(dqe=dqe, dke=dke, dve=dve):
                dqemb_ref[...] = dqe
                dkembt_ref[...] = dke
                dvemb_ref[...] = dve

            @pl.when(jnp.logical_not(first))
            def _(dqe=dqe, dke=dke, dve=dve):
                dqemb_ref[...] = dqemb_ref[...] + dqe
                dkembt_ref[...] = dkembt_ref[...] + dke
                dvemb_ref[...] = dvemb_ref[...] + dve
        else:
            dq_ref[grp] = jnp.stack(
                [jnp.sum(d_qk * k[ci][None, :, :], axis=1) for ci in range(c)])
            dk_ref[grp] = jnp.stack(
                [jnp.sum(d_qk * q[ci][:, None, :], axis=0) for ci in range(c)])

    daff = jnp.stack(daff_rows)

    @pl.when(step == 0)
    def _():
        daff_ref[...] = daff

    @pl.when(step != 0)
    def _():
        daff_ref[...] = daff_ref[...] + daff


def _pick_sblock(S: int, g: int, c: int, gp: int, L: int,
                 budget_bytes: int = 3 << 20) -> int:
    """Largest lane block that divides S within a VMEM budget.

    Mosaic requires the minor (lane) block dim be a multiple of 128 or the
    whole axis, so candidates are 128-multiples dividing S (S itself as the
    fallback when no such divisor exists and S fits the budget).

    Live per-program arrays: q/k/v/sv/sve blocks ((g, 2c+3gp, L, Sb)) plus a
    handful of (L, L, Sb) working tiles."""
    per_lane = 4 * (g * (2 * c + 3 * gp) * L + 8 * L * L)
    cap = min(1024, budget_bytes // per_lane, S)
    for Sb in range((cap // 128) * 128, 0, -128):
        if S % Sb == 0:
            return Sb
    return S if S * per_lane <= budget_bytes else 0


def _interpret_default(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@jax.custom_vjp
def lanes_attn_core(q, k, v, qemb, kemb_t, vemb, sim_affine):
    """Fused small-span attention core in stripe-lane layout.

    Args:
      q, k: (g, c, L, S); v: (g, gp, L, S).
      qemb: (c, L, L); kemb_t: (c, L, L) pre-swapped so kr uses [c, i, j];
        vemb: (gp, L, L). Pass zero-shaped (0, L, L) tables for wopos.
      sim_affine: (g, 8), pack_sim_affine layout.
    Returns:
      (sv, sve), each (g, gp, L, S); sve is zeros for wopos.
    """
    return _fwd(q, k, v, qemb, kemb_t, vemb, sim_affine)


def _fwd(q, k, v, qemb, kemb_t, vemb, sim_affine, interpret=None):
    interpret = _interpret_default(interpret)
    g, c, L, S = q.shape
    gp = v.shape[1]
    has_pos = qemb.shape[0] > 0
    Sb = _pick_sblock(S, g, c, gp, L)
    grid = (S // Sb,)
    qk_spec = pl.BlockSpec((g, c, L, Sb), lambda i: (0, 0, 0, i),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((g, gp, L, Sb), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    cemb_spec = pl.BlockSpec((max(c, 1), L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((max(gp, 1), L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((g, gp, L, S), _F32)
    if not has_pos:
        # keep block shapes non-empty: feed (1, L, L) zero tables
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
        cemb_spec = pl.BlockSpec((1, L, L), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        pemb_spec = cemb_spec
    sv, sve = pl.pallas_call(
        functools.partial(_fwd_kernel, has_pos=has_pos),
        grid=grid,
        in_specs=[qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec],
        out_specs=(v_spec, v_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(q, k, v, qemb, kemb_t, vemb, sim_affine)
    if not has_pos:
        sve = jnp.zeros_like(sv)
    return sv, sve


def _fwd_rule(q, k, v, qemb, kemb_t, vemb, sim_affine):
    out = _fwd(q, k, v, qemb, kemb_t, vemb, sim_affine)
    return out, (q, k, v, qemb, kemb_t, vemb, sim_affine)


def _bwd_rule(residuals, grads, interpret=None):
    q, k, v, qemb, kemb_t, vemb, sim_affine = residuals
    dsv, dsve = grads
    interpret = _interpret_default(interpret)
    g, c, L, S = q.shape
    gp = v.shape[1]
    has_pos = qemb.shape[0] > 0
    Sb = _pick_sblock(S, g, c, gp, L, budget_bytes=2 << 20)
    grid = (S // Sb,)

    qk_spec = pl.BlockSpec((g, c, L, Sb), lambda i: (0, 0, 0, i),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((g, gp, L, Sb), lambda i: (0, 0, 0, i),
                          memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if not has_pos:
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
    cemb_spec = pl.BlockSpec((ce, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((pe, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    dq, dk, dv, dqe, dke_t, dve, daff = pl.pallas_call(
        functools.partial(_bwd_kernel, has_pos=has_pos),
        grid=grid,
        in_specs=[qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec, v_spec, v_spec],
        out_specs=(qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                   aff_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, c, L, S), _F32),
            jax.ShapeDtypeStruct((g, c, L, S), _F32),
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((pe, L, L), _F32),
            jax.ShapeDtypeStruct((g, 8), _F32),
        ),
        interpret=interpret,
    )(q, k, v, qemb, kemb_t, vemb, sim_affine, dsv, dsve)
    if not has_pos:
        zc = jnp.zeros((0, L, L), _F32)
        return dq, dk, dv, zc, zc, jnp.zeros((0, L, L), _F32), daff
    return dq, dk, dv, dqe, dke_t, dve, daff


lanes_attn_core.defvjp(_fwd_rule, _bwd_rule)


# probe/A-B escape hatch: set False to force the XLA core at small spans
LANES_ENABLED = True


def lanes_supported(span: int, groups: int, gp: int, stripes: int) -> bool:
    """Admission: small spans only (the stripe-block kernel owns L >= 32),
    lane axis long enough to fill tiles, everything fits the block budget."""
    return LANES_ENABLED and span <= 16 and stripes >= 128 and _pick_sblock(
        stripes, groups, max(gp // 2, 1), gp, span) >= 128

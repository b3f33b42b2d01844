"""Fused one-pass Pallas kernel for the similarity-BN batch moments.

The train-mode attention path folds the similarity BatchNorm's *batch*
statistics into a constant affine before the fused attention kernel runs
(ops/pallas_axial_train.py::fold_train_affine). Those statistics come from
``logit_moments_lanes`` / ``qk_moments_lanes`` — six factorized reductions
over q and k that avoid materializing the (S, g, L, L) logits (reference
BatchNorm2d over the stacked qk/qr/kr similarities, axialnet.py:74-75).

XLA lowers each of those einsums to a separate broadcast-multiply-reduce
fusion: the contraction depth is c <= 8, nothing hits the MXU, and q/k are
re-read from HBM per term — profiled as part of the ~sub-ms-op long tail
that rivals the attention kernels themselves (ROADMAP.md "the long tail").
This module computes ALL six moment sums in ONE pass over q/k per
(group, stripe-block) program: the (L, Sb) tiles stay in VMEM and every
term is VPU elementwise work sharing the same loads. The (c, d)-symmetric
second-moment terms are halved via d >= c with weight 2.

Mosaic layout discipline (the round-2 version of this kernel failed chip
compile with "Invalid relayout ... replicated in destination but not in
source"): every value inside the kernels is either a scalar, a (1, Sb) /
(L, 1) keepdims reduction, or a full (L, Sb) tile — never a
multi-channel reduction like ``jnp.sum((c, L, Sb), axis=1)``, whose
(c, Sb) result carries a sublane-replicated layout Mosaic cannot relayout
for non-singleton leading dims. Channel work is an unrolled Python loop
over 2-D per-channel tiles (c <= 8), the same pattern as the proven
attention kernels in ops/pallas_axial_lanes.py. The position tables enter
PRE-TRANSPOSED with the span on sublanes — (L, c) and (L, c*c) — so the
kernels take (L, 1) columns by static slicing instead of relayouting
lane-resident rows:

    r_q[c, i]    = sum_j qemb[c, i, j]          -> passed as r_q_t[i, c]
    E_q[c, d, i] = sum_j qemb[c, i, j] qemb[d, i, j] -> e_q_t[i, c*cdim+d]
    r_k, E_k analogous in [c, j, i] coordinates (kr reads kemb as [c,j,i]).

The custom VJP's backward is a mirrored one-pass kernel: dq/dk assembled
per (group, stripe-block) program, table gradients accumulated in
grid-resident constant-index blocks (the attention backward's dqemb
pattern), with the XLA einsum fallback retained for unadmitted shapes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_registry as _kreg

_F32 = jnp.float32

# probe/A-B escape hatch: set False to force the XLA moment einsums
MOMENTS_KERNEL_ENABLED = True

_VMEM_BUDGET = 6 << 20  # same derating as pallas_axial_lanes._VMEM_BUDGET


def _pick_sblock(S: int, c: int, L: int, bwd: bool = False) -> int:
    """Largest 128-multiple stripe block that divides S and fits VMEM.

    Live f32 per lane: q + k blocks (2cL) plus the (L,)-tall working
    products wq/wk and per-channel (1,)-tall sums, with 2x slack for
    Mosaic pipeline buffers; the backward adds the dq/dk output blocks.
    """
    per_lane = 4 * ((4 if bwd else 2) * c * L + 2 * L + 2 * c) * 2
    cap = min(1024, _VMEM_BUDGET // per_lane, S)
    for Sb in range((cap // 128) * 128, 0, -128):
        if S % Sb == 0:
            return Sb
    return S if S * per_lane <= _VMEM_BUDGET else 0


def _interpret_default(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _moments_kernel(qk_ref, rqt_ref, eqt_ref, rkt_ref, ekt_ref,
                    out_ref, *, has_pos: bool, cdim: int):
    """grid = (g, S // Sb); out accumulates (g, 8) moment sums.

    ``qk_ref`` is the FIRST HALF of the fused (g, 2gp, L, S) qkv tensor —
    the BlockSpec blocks axis 1 in gp-units and always picks block 0, i.e.
    rows [0:c]=q, [c:gp]=k; the v rows are never fetched. Sharing the
    attention kernels' fused operand means the XLA boundary materializes
    no q/k slices for the moments either.

    Row layout per group: [s1_qk, s2_qk, s1_qr, s2_qr, s1_kr, s2_kr, 0, 0]
    (first and second raw-moment sums; divide by n = S*L*L outside).
    """
    gi, si = pl.program_id(0), pl.program_id(1)
    c = cdim
    # per-channel (L, Sb) tiles; bf16 inputs upcast once in VMEM — exact,
    # matching an upcast outside the kernel bit-for-bit
    q = [qk_ref[0, ci].astype(_F32) for ci in range(c)]
    k = [qk_ref[0, c + ci].astype(_F32) for ci in range(c)]

    # qs/ks: (1, Sb) keepdims reductions (sublane axis collapses to 1)
    qs = [jnp.sum(q[ci], axis=0, keepdims=True) for ci in range(c)]
    ks = [jnp.sum(k[ci], axis=0, keepdims=True) for ci in range(c)]
    s1_qk = jnp.sum(qs[0] * ks[0])
    for ci in range(1, c):
        s1_qk += jnp.sum(qs[ci] * ks[ci])

    z = jnp.zeros((), _F32)
    s2_qk, s2_qr, s2_kr = z, z, z
    for ci in range(c):
        for di in range(ci, c):
            f = 1.0 if di == ci else 2.0
            wq = q[ci] * q[di]  # (L, Sb)
            wk = k[ci] * k[di]
            # m2_qk couples qq and kk per stripe: sum_s (sum_l wq)(sum_l wk)
            s2_qk += f * jnp.sum(jnp.sum(wq, axis=0, keepdims=True)
                                 * jnp.sum(wk, axis=0, keepdims=True))
            if has_pos:
                col = ci * c + di
                # (L, 1) static column slice broadcast over lanes
                s2_qr += f * jnp.sum(wq * eqt_ref[:, col:col + 1])
                s2_kr += f * jnp.sum(wk * ekt_ref[:, col:col + 1])
    if has_pos:
        s1_qr = jnp.sum(q[0] * rqt_ref[:, 0:1])
        s1_kr = jnp.sum(k[0] * rkt_ref[:, 0:1])
        for ci in range(1, c):
            s1_qr += jnp.sum(q[ci] * rqt_ref[:, ci:ci + 1])
            s1_kr += jnp.sum(k[ci] * rkt_ref[:, ci:ci + 1])
    else:
        s1_qr = s1_kr = z

    row = jnp.stack([s1_qk, s2_qk, s1_qr, s2_qr, s1_kr, s2_kr, z, z])

    @pl.when(si == 0)
    def _():
        out_ref[pl.ds(gi, 1), :] = row[None]

    @pl.when(si != 0)
    def _():
        out_ref[pl.ds(gi, 1), :] = out_ref[pl.ds(gi, 1), :] + row[None]


def _transpose_tables(r_q, e_q, r_k, e_k, L):
    """(c, L)/(c, c, L) tables -> span-on-sublanes (L, c)/(L, c*c)."""
    has_pos = r_q.shape[0] > 0
    if not has_pos:
        z2 = jnp.zeros((L, 1), _F32)
        return z2, z2, z2, z2, 0
    c = r_q.shape[0]
    rqt = jnp.transpose(r_q).astype(_F32)                      # (L, c)
    rkt = jnp.transpose(r_k).astype(_F32)
    eqt = jnp.transpose(e_q.reshape(c * c, L)).astype(_F32)    # (L, c*c)
    ekt = jnp.transpose(e_k.reshape(c * c, L)).astype(_F32)
    return rqt, eqt, rkt, ekt, c


@jax.custom_vjp
def moment_sums_core(qkv, r_q, e_q, r_k, e_k):
    """One-pass moment sums, (g, 8) (see _moments_kernel row layout).

    qkv: the attention kernels' fused (g, 2gp, L, S) tensor (rows [0:c]=q,
    [c:gp]=k, [gp:2gp]=v; only the q/k half is read). r_q/r_k: (c, L);
    e_q/e_k: (c, c, L). Pass zero-size (0, L) / (0, 0, L) tables for the
    wopos (qk-only) variant.
    """
    return _sums_fwd(qkv, r_q, e_q, r_k, e_k)


def _sums_fwd(qkv, r_q, e_q, r_k, e_k, interpret=None):
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = r_q.shape[0] > 0
    Sb = _pick_sblock(S, c, L)
    assert Sb >= 1, (S, c, L)
    grid = (g, S // Sb)
    # axis 1 blocked in gp-units, always block 0: the q|k rows only
    qk_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                           memory_space=pltpu.VMEM)
    rqt, eqt, rkt, ekt, _ = _transpose_tables(r_q, e_q, r_k, e_k, L)
    r_spec = pl.BlockSpec(rqt.shape, lambda gi, si: (0, 0),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec(eqt.shape, lambda gi, si: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_moments_kernel, has_pos=has_pos, cdim=c),
        grid=grid,
        in_specs=[qk_spec, r_spec, e_spec, r_spec, e_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g, 8), _F32),
        interpret=interpret,
    )(qkv, rqt, eqt, rkt, ekt)


def _sums_fwd_rule(qkv, r_q, e_q, r_k, e_k):
    return _sums_fwd(qkv, r_q, e_q, r_k, e_k), (qkv, r_q, e_q, r_k, e_k)


def _moments_bwd_kernel(qk_ref, rqt_ref, eqt_ref, rkt_ref, ekt_ref,
                        ct_ref,
                        dqk_ref, drqt_ref, deqt_ref, drkt_ref,
                        dekt_ref, *, has_pos: bool, cdim: int):
    """One-pass backward: dq/dk assembled per block into ONE fused dqk
    output (rows [0:c]=dq, [c:gp]=dk — the caller zero-pads the v rows),
    table grads accumulated in resident constant-index blocks across the
    whole grid (the same pattern as the attention backward's dqemb,
    pallas_axial_lanes.py). Same 2-D layout discipline as the forward
    kernel."""
    gi, si = pl.program_id(0), pl.program_id(1)
    ct = ct_ref[pl.ds(gi, 1), :][0]  # (8,) — the proven aff-row pattern
    c = cdim
    q = [qk_ref[0, ci].astype(_F32) for ci in range(c)]
    k = [qk_ref[0, c + ci].astype(_F32) for ci in range(c)]
    qs = [jnp.sum(q[ci], axis=0, keepdims=True) for ci in range(c)]  # (1,Sb)
    ks = [jnp.sum(k[ci], axis=0, keepdims=True) for ci in range(c)]

    # pair products, reduced both ways: over L (keepdims -> (1, Sb)) for
    # the per-stripe s2_qk chain and over Sb (keepdims -> (L, 1)) for the
    # e-table grads
    qq = [[None] * c for _ in range(c)]
    kk = [[None] * c for _ in range(c)]
    qql = [[None] * c for _ in range(c)]
    kkl = [[None] * c for _ in range(c)]
    for ci in range(c):
        for di in range(ci, c):
            wq = q[ci] * q[di]  # (L, Sb)
            wk = k[ci] * k[di]
            qq[ci][di] = qq[di][ci] = jnp.sum(wq, axis=0, keepdims=True)
            kk[ci][di] = kk[di][ci] = jnp.sum(wk, axis=0, keepdims=True)
            if has_pos:
                qql[ci][di] = qql[di][ci] = jnp.sum(wq, axis=1,
                                                    keepdims=True)
                kkl[ci][di] = kkl[di][ci] = jnp.sum(wk, axis=1,
                                                    keepdims=True)

    dq_rows, dk_rows = [], []
    for ci in range(c):
        acc_q = kk[ci][0] * q[0]          # (1, Sb) * (L, Sb)
        acc_k = qq[ci][0] * k[0]
        for di in range(1, c):
            acc_q += kk[ci][di] * q[di]
            acc_k += qq[ci][di] * k[di]
        dqc = ct[0] * ks[ci] + 2.0 * ct[1] * acc_q
        dkc = ct[0] * qs[ci] + 2.0 * ct[1] * acc_k
        if has_pos:
            acc_eq = eqt_ref[:, ci * c:ci * c + 1] * q[0]  # (L,1) * (L,Sb)
            acc_ek = ekt_ref[:, ci * c:ci * c + 1] * k[0]
            for di in range(1, c):
                col = ci * c + di
                acc_eq += eqt_ref[:, col:col + 1] * q[di]
                acc_ek += ekt_ref[:, col:col + 1] * k[di]
            dqc += ct[2] * rqt_ref[:, ci:ci + 1] + 2.0 * ct[3] * acc_eq
            dkc += ct[4] * rkt_ref[:, ci:ci + 1] + 2.0 * ct[5] * acc_ek
        dq_rows.append(dqc)
        dk_rows.append(dkc)
    dqk_ref[0, :c] = jnp.stack(dq_rows).astype(dqk_ref.dtype)
    dqk_ref[0, c:] = jnp.stack(dk_rows).astype(dqk_ref.dtype)

    if has_pos:
        # table grads in the transposed (L, c)/(L, c*c) layout: columns are
        # (L, 1) keepdims reductions, concatenated on lanes
        drqt = jnp.concatenate(
            [ct[2] * jnp.sum(q[ci], axis=1, keepdims=True)
             for ci in range(c)], axis=1)
        drkt = jnp.concatenate(
            [ct[4] * jnp.sum(k[ci], axis=1, keepdims=True)
             for ci in range(c)], axis=1)
        deqt = jnp.concatenate(
            [ct[3] * qql[ci][di] for ci in range(c) for di in range(c)],
            axis=1)
        dekt = jnp.concatenate(
            [ct[5] * kkl[ci][di] for ci in range(c) for di in range(c)],
            axis=1)
        first = jnp.logical_and(gi == 0, si == 0)

        @pl.when(first)
        def _():
            drqt_ref[...] = drqt
            deqt_ref[...] = deqt
            drkt_ref[...] = drkt
            dekt_ref[...] = dekt

        @pl.when(jnp.logical_not(first))
        def _():
            drqt_ref[...] = drqt_ref[...] + drqt
            deqt_ref[...] = deqt_ref[...] + deqt
            drkt_ref[...] = drkt_ref[...] + drkt
            dekt_ref[...] = dekt_ref[...] + dekt


def _sums_bwd_kernel_call(qkv, r_q, e_q, r_k, e_k, ct, Sb, interpret):
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = r_q.shape[0] > 0
    grid = (g, S // Sb)
    qk_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                           memory_space=pltpu.VMEM)
    rqt, eqt, rkt, ekt, _ = _transpose_tables(r_q, e_q, r_k, e_k, L)
    r_spec = pl.BlockSpec(rqt.shape, lambda gi, si: (0, 0),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec(eqt.shape, lambda gi, si: (0, 0),
                          memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                           memory_space=pltpu.VMEM)
    dqk, drqt, deqt, drkt, dekt = pl.pallas_call(
        functools.partial(_moments_bwd_kernel, has_pos=has_pos, cdim=c),
        grid=grid,
        in_specs=[qk_spec, r_spec, e_spec, r_spec, e_spec, ct_spec],
        out_specs=(qk_spec, r_spec, e_spec, r_spec, e_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, gp, L, S), qkv.dtype),
            jax.ShapeDtypeStruct(rqt.shape, _F32),
            jax.ShapeDtypeStruct(eqt.shape, _F32),
            jax.ShapeDtypeStruct(rkt.shape, _F32),
            jax.ShapeDtypeStruct(ekt.shape, _F32),
        ),
        interpret=interpret,
    )(qkv, rqt, eqt, rkt, ekt, ct)
    # cotangent must cover the full fused tensor: zero-pad the (never-read)
    # v rows. The pad fuses into the downstream dqkv addition with the
    # attention core's cotangent — no standalone materialization.
    dqkv = jnp.concatenate(
        [dqk, jnp.zeros((g, gp, L, S), qkv.dtype)], axis=1)
    if not has_pos:
        zr, ze = jnp.zeros_like(r_q), jnp.zeros_like(e_q)
        return dqkv, zr, ze, jnp.zeros_like(r_k), jnp.zeros_like(e_k)
    # un-transpose the table grads back to the caller's (c, L)/(c, c, L)
    dr_q = jnp.transpose(drqt)
    dr_k = jnp.transpose(drkt)
    de_q = jnp.transpose(deqt).reshape(c, c, L)
    de_k = jnp.transpose(dekt).reshape(c, c, L)
    return dqkv, dr_q, de_q, dr_k, de_k


def _sums_bwd_rule(residuals, ct, interpret=None):
    qkv, r_q, e_q, r_k, e_k = residuals
    g, r2, L, S = qkv.shape
    c = r2 // 4
    Sb = _pick_sblock(S, c, L, bwd=True)
    if Sb >= 128:
        return _sums_bwd_kernel_call(qkv, r_q, e_q, r_k, e_k, ct, Sb,
                                     _interpret_default(interpret))
    return _sums_bwd_xla(residuals, ct)


def _sums_bwd_xla(residuals, ct):
    """XLA fallback backward: same einsum count autodiff would produce
    (see module docstring); ct is (g, 8)."""
    qkv, r_q, e_q, r_k, e_k = residuals
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    in_dt = (qkv.dtype, qkv.dtype)
    q = qkv[:, :c].astype(_F32)  # einsums need f32 accumulation
    k = qkv[:, c:gp].astype(_F32)
    has_pos = r_q.shape[0] > 0
    qs = jnp.sum(q, axis=2)  # (g, c, S)
    ks = jnp.sum(k, axis=2)
    qq = jnp.einsum("gcls,gdls->gcds", q, q)  # (g, c, c, S)
    kk = jnp.einsum("gcls,gdls->gcds", k, k)

    c0 = ct[:, 0][:, None, None, None]  # s1_qk
    c1 = ct[:, 1][:, None, None, None]  # s2_qk
    dq = c0 * ks[:, :, None, :] + 2.0 * c1 * jnp.einsum(
        "gcds,gdls->gcls", kk, q)
    dk = c0 * qs[:, :, None, :] + 2.0 * c1 * jnp.einsum(
        "gcds,gdls->gcls", qq, k)

    def fuse(dq, dk):
        return jnp.concatenate(
            [dq.astype(in_dt[0]), dk.astype(in_dt[1]),
             jnp.zeros((g, gp, L, S), in_dt[0])], axis=1)

    if not has_pos:
        zr = jnp.zeros_like(r_q)
        ze = jnp.zeros_like(e_q)
        return (fuse(dq, dk), zr, ze,
                jnp.zeros_like(r_k), jnp.zeros_like(e_k))

    c2 = ct[:, 2][:, None, None, None]  # s1_qr
    c3 = ct[:, 3]                       # s2_qr
    c4 = ct[:, 4][:, None, None, None]  # s1_kr
    c5 = ct[:, 5]                       # s2_kr
    dq = dq + c2 * r_q[None, :, :, None] + 2.0 * jnp.einsum(
        "g,cdl,gdls->gcls", c3, e_q, q)
    dk = dk + c4 * r_k[None, :, :, None] + 2.0 * jnp.einsum(
        "g,cdl,gdls->gcls", c5, e_k, k)
    dr_q = jnp.einsum("g,gcls->cl", ct[:, 2], q)
    de_q = jnp.einsum("g,gcls,gdls->cdl", c3, q, q)
    dr_k = jnp.einsum("g,gcls->cl", ct[:, 4], k)
    de_k = jnp.einsum("g,gcls,gdls->cdl", c5, k, k)
    return (fuse(dq, dk), dr_q, de_q, dr_k, de_k)


moment_sums_core.defvjp(_sums_fwd_rule, _sums_bwd_rule)


def moments_kernel_supported(span: int, gp: int, stripes: int) -> bool:
    """Admission: lane axis long enough to fill (8, 128) tiles and the
    stripe block fits VMEM (always true at the model geometries; tiny L
    with short S falls back to the XLA einsums)."""
    c = max(gp // 2, 1)
    return (MOMENTS_KERNEL_ENABLED
            and _kreg.family_enabled(_kreg.FAMILY_MOMENTS)
            and stripes >= 128
            and _pick_sblock(stripes, c, span) >= 128)


def logit_moments_lanes_fused(qkv, qemb, kemb, core=None):
    """Drop-in for pallas_axial_train.logit_moments_lanes: one kernel pass.

    qkv: the attention kernels' fused (g, 2gp, L, S) tensor (only the q/k
    rows are read); qemb/kemb: (c, L, L) gate-folded tables in the
    all_emb coordinates (kr reads kemb as [c, j, i]).
    Returns (mean, var_biased, count) with mean/var shaped (3, g).

    ``core`` overrides the sums core — under an active mesh the caller
    passes the shard_map island (parallel/kernel_sharding.py
    shard_moments_core), which reduces per-device partials and combines
    them outside; qkv then carries its GLOBAL shape here, so n is right.
    """
    g, r2, L, S = qkv.shape
    n = S * L * L
    core = core or moment_sums_core
    r_q = jnp.sum(qemb, axis=2)                       # (c, i)
    e_q = jnp.einsum("cij,dij->cdi", qemb, qemb)      # (c, c, i)
    r_k = jnp.sum(kemb, axis=2)                       # (c, j)
    e_k = jnp.einsum("cji,dji->cdj", kemb, kemb)      # (c, c, j)
    sums = core(qkv, r_q, e_q, r_k, e_k)
    mean = jnp.stack([sums[:, 0], sums[:, 2], sums[:, 4]]) / n
    msq = jnp.stack([sums[:, 1], sums[:, 3], sums[:, 5]]) / n
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return mean, var, n


def qk_moments_lanes_fused(qkv, core=None):
    """Drop-in for pallas_axial_train.qk_moments_lanes (wopos: qk only)."""
    g, r2, L, S = qkv.shape
    n = S * L * L
    core = core or moment_sums_core
    zr = jnp.zeros((0, L), _F32)
    ze = jnp.zeros((0, 0, L), _F32)
    sums = core(qkv, zr, ze, zr, ze)
    m1 = sums[:, 0] / n
    m2 = sums[:, 1] / n
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return m1, var, n

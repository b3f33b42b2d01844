"""Fused axial-attention Pallas kernel (inference path).

The jnp reference path (ops/axial_attention.py) materializes five
(stripes, groups, L, L) tensors in HBM per attention layer (qk, qr, kr,
normalized logits, softmax). This kernel keeps a block of stripes resident in
VMEM and fuses the whole post-qkv attention core:

    qk/qr/kr logits -> folded-BN affine + 3-way sum -> softmax over keys
    -> sv (attn @ v) + sve (attn @ v-embedding) -> folded-BN affine + sum

into one pass: q/k/v are read from HBM once and only the final output is
written back — removing ~6x of HBM round-trips for the attention core.

Eval-mode BatchNorms are pure per-channel affines, so they fold exactly:
    scale' = gamma / sqrt(running_var + eps); shift' = beta - mean * scale'
and the frozen gates fold into the embedding tables / output scales
(f_qr -> q_emb, f_kr -> k_emb, f_sve -> v_emb, f_sv -> sv scale): since the
reference applies its gates *before* each BN, the running statistics already
describe the gated tensors and folding is exact. One kernel therefore serves
the plain, gated and wopos modes (wopos passes zero embeddings and zero
qr/kr/sve affines).

Layout: the attended axis L (span <= 64 at 128px inputs) is kept as the
trailing/lane dimension of every operand, so a whole (L, L) similarity tile
fits VMEM trivially — no online softmax needed. The grid blocks over
(stripe_block, group); stripes are the flattened batch x orthogonal-axis
dimension.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_registry as _kreg


def fused_eval_supported(span: int, gp: int) -> bool:
    """Whether one (stripe-block, group) program fits scoped VMEM.

    MEASURED on v5e: at span 256 (the 512px models' global branch) Mosaic's
    scoped stack for this kernel is 33-37M against the 16M limit and barely
    shrinks with the stripe block (36.95M at B=8, 33.19M at B=2) — the
    whole-(L, L)-tile design is infeasible there at any block size; those
    spans must stream instead (flash/flash2 in pallas_axial_lanes, which
    the eval router prefers wherever admitted). Spans <= 64 — every 128px
    geometry plus the 512px models' local branches — fit comfortably
    (~70 bytes per B*L^2 element with the 170k-element block cap in
    ``axial_attention_fused``).
    """
    del gp  # feasibility is set by the (L, L) tile size, not group planes
    return _kreg.family_enabled(_kreg.FAMILY_EVAL) and span <= 64


def _attn_kernel(q_ref, k_ref, v_ref,
                 qemb_ref, kemb_ref, vemb_ref,
                 simaff_ref, outaff_ref,
                 out_ref):
    """One (stripe_block, group) tile of fused axial attention.

    Block shapes (B = stripe block, L = span, c = gp//2, gp = group planes):
      q_ref, k_ref: (B, 1, c, L)      v_ref: (B, 1, gp, L)
      qemb_ref/kemb_ref: (1, c, L, L) vemb_ref: (1, gp, L, L)
      simaff_ref: (g, 8)  packed [qk_s, qk_b, qr_s, qr_b, kr_s, kr_b, 0, 0]
      outaff_ref: (g, 4, gp) packed [sv_scale, sv_shift, sve_scale, sve_shift]
      (affine tables ride whole into VMEM — tiny — and are indexed by the
      group grid coordinate, since TPU block shapes must tile by (8, 128))
      out_ref: (B, 1, gp, L)
    """
    f32 = jnp.float32
    q = q_ref[:, 0]        # (B, c, L)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    qemb = qemb_ref[...]   # (c, L, L): [c, i, j] — shared across groups
    kemb = kemb_ref[...]
    vemb = vemb_ref[...]   # (gp, L, L)

    # qk[b,i,j] = sum_c q[b,c,i] * k[b,c,j]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )                                        # (B, i, j)
    # qr[b,i,j] = sum_c q[b,c,i] * qemb[c,i,j]  — batch over i
    qr = jax.lax.dot_general(
        jnp.transpose(q, (2, 0, 1)),         # (i, B, c)
        jnp.transpose(qemb, (1, 0, 2)),      # (i, c, j)
        (((2,), (1,)), ((0,), (0,))),        # -> (i, B, j)
        preferred_element_type=f32,
    )
    qr = jnp.swapaxes(qr, 0, 1)              # (B, i, j)
    # kr[b,i,j] = sum_c k[b,c,j] * kemb[c,j,i] — batch over j
    kr = jax.lax.dot_general(
        jnp.transpose(k, (2, 0, 1)),         # (j, B, c)
        jnp.transpose(kemb, (1, 0, 2)),      # (j, c, i)
        (((2,), (1,)), ((0,), (0,))),        # -> (j, B, i)
        preferred_element_type=f32,
    )
    kr = jnp.transpose(kr, (1, 2, 0))        # (B, i, j)

    grp = pl.program_id(1)
    aff = simaff_ref[grp]
    logits = (qk * aff[0] + aff[1]) + (qr * aff[2] + aff[3]) \
        + (kr * aff[4] + aff[5])

    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    sim = e / jnp.sum(e, axis=-1, keepdims=True)   # (B, i, j)

    # sv[b,p,i] = sum_j v[b,p,j] * sim[b,i,j]
    sv = jax.lax.dot_general(
        v, sim, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )                                        # (B, p, i)
    # sve[b,p,i] = sum_j sim[b,i,j] * vemb[p,i,j] — batch over i
    sve = jax.lax.dot_general(
        jnp.swapaxes(sim, 0, 1),             # (i, B, j)
        jnp.transpose(vemb, (1, 2, 0)),      # (i, j, p)
        (((2,), (1,)), ((0,), (0,))),        # -> (i, B, p)
        preferred_element_type=f32,
    )
    sve = jnp.transpose(sve, (1, 2, 0))      # (B, p, i)

    oa = outaff_ref[grp]                     # (4, gp)
    out = (sv * oa[0][None, :, None] + oa[1][None, :, None]) \
        + (sve * oa[2][None, :, None] + oa[3][None, :, None])
    out_ref[:, 0] = out.astype(out_ref.dtype)


def axial_attention_fused(q, k, v, q_emb, k_emb, v_emb,
                          sim_affine, out_affine,
                          *, stripe_block: int = 32,
                          interpret: Optional[bool] = None):
    """Run the fused kernel.

    Args:
      q, k: (S, g, c, L) f32 — S stripes (batch x orthogonal axis).
      v: (S, g, gp, L).
      q_emb, k_emb: (c, L, L); v_emb: (gp, L, L) — group-shared tables.
      sim_affine: (g, 8) packed per-group [qk_s, qk_b, qr_s, qr_b, kr_s,
        kr_b, 0, 0] folded BN affines.
      out_affine: (g, 4, gp) packed [sv_scale, sv_shift, sve_scale, sve_shift].
    Returns:
      (S, g, gp, L) attention output.
    """
    if interpret is None:
        # the Mosaic lowering is TPU-only; interpret elsewhere (CPU tests)
        interpret = jax.default_backend() != "tpu"
    S, g, c, L = q.shape
    gp = v.shape[2]
    assert q_emb.ndim == 3, "tables are group-shared (c, L, L)" 
    # cap the stripe block so a program's scoped VMEM stays under budget.
    # Mosaic's measured scoped allocation for this kernel is ~70 bytes per
    # B*L*L element (~17 live f32 (B, L, L) tiles: logits/exp/softmax plus
    # relayout copies of the three dots) — the span-256 eval program of the
    # 512px models OOMed at B=8 (36.95M scoped vs 16M limit) under the old
    # 4-tile estimate. 170k elements keeps the worst case near ~12M.
    vmem_cap = max(1, 170_000 // (L * L))
    B = min(stripe_block, vmem_cap, S)
    while S % B:
        B -= 1
    grid = (S // B, g)

    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1, c, L), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, c, L), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, gp, L), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, L, L), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, L, L), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gp, L, L), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 4, gp), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1, gp, L), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, g, gp, L), q.dtype),
        interpret=interpret,
    )(q, k, v, q_emb, k_emb, v_emb, sim_affine, out_affine)


def _fold(scale, bias, mean, var, eps):
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def fused_eval_attention(x_qkv, relative,
                         sim_scale, sim_bias, sim_mean, sim_var,
                         out_scale, out_bias, out_mean, out_var,
                         *, gp: int, span: int, mode: str = "gated",
                         gates=(0.1, 0.1, 0.1, 1.0), eps: float = 1e-5,
                         stripe_block: int = 32,
                         interpret: Optional[bool] = None,
                         core=None):
    """Fold gates + BN running stats and call the kernel.

    Args:
      x_qkv: (S, L, g, 2*gp) post-(qkv projection + bn_qkv) tensor — the
        same intermediate the jnp path splits into q/k/v.
      relative: (2*gp, 2*span-1) table, or None for wopos.
      sim_*: (3, g) similarity BN params/stats ((g,) for wopos).
      out_*: (g, gp, 2) output BN params/stats ((g, gp) for wopos).
      core: overrides the kernel call — under an active mesh the caller
        passes the shard_map island (kernel_sharding.shard_eval_core around
        ``axial_attention_fused``); the folding glue here stays plain XLA,
        which GSPMD partitions around the island.
    Returns: (S, L, g, gp) output matching the jnp path's pre-reshape layout.
    """
    from .axial_attention import relative_logit_index

    S, L, g, _ = x_qkv.shape
    c = gp // 2
    qkv = jnp.transpose(x_qkv, (0, 2, 3, 1))  # (S, g, 2gp, L)
    q, k, v = qkv[:, :, :c], qkv[:, :, c:gp], qkv[:, :, gp:]

    f32 = jnp.float32
    if mode == "wopos":
        zero_c = jnp.zeros((c, L, L), f32)
        q_emb = k_emb = zero_c
        v_emb = jnp.zeros((gp, L, L), f32)
        qk_s, qk_b = _fold(sim_scale, sim_bias, sim_mean, sim_var, eps)  # (g,)
        sim_affine = jnp.zeros((g, 8), f32)
        sim_affine = sim_affine.at[:, 0].set(qk_s).at[:, 1].set(qk_b)
        sv_s, sv_b = _fold(out_scale, out_bias, out_mean, out_var, eps)  # (g, gp)
        out_affine = jnp.stack(
            [sv_s, sv_b, jnp.zeros_like(sv_s), jnp.zeros_like(sv_s)], axis=1
        )  # (g, 4, gp)
    else:
        f_qr, f_kr, f_sve, f_sv = [jnp.asarray(x, f32) for x in gates]
        if mode == "full":
            f_qr = f_kr = f_sve = f_sv = jnp.asarray(1.0, f32)
        idx = relative_logit_index(span)
        all_emb = relative[:, idx].astype(f32)          # (2gp, L, L)
        q_emb = all_emb[:c] * f_qr
        k_emb = all_emb[c:gp] * f_kr
        v_emb = all_emb[gp:] * f_sve
        s_sc, s_sh = _fold(sim_scale, sim_bias, sim_mean, sim_var, eps)  # (3, g)
        sim_affine = jnp.zeros((g, 8), f32)
        for row in range(3):
            sim_affine = sim_affine.at[:, 2 * row].set(s_sc[row])
            sim_affine = sim_affine.at[:, 2 * row + 1].set(s_sh[row])
        o_sc, o_sh = _fold(out_scale, out_bias, out_mean, out_var, eps)  # (g,gp,2)
        out_affine = jnp.stack(
            [o_sc[..., 0] * f_sv, o_sh[..., 0], o_sc[..., 1], o_sh[..., 1]],
            axis=1,
        )  # (g, 4, gp)

    import functools
    kernel = core or functools.partial(
        axial_attention_fused, stripe_block=stripe_block, interpret=interpret)
    out = kernel(q, k, v, q_emb, k_emb, v_emb, sim_affine, out_affine)
    return jnp.transpose(out, (0, 3, 1, 2))      # (S, L, g, gp)

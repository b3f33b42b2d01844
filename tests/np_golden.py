"""NumPy re-derivation of the reference axial-attention math, used as a golden.

This follows the *equations* documented in SURVEY.md §2 (component #5, citing
reference axialnet.py:52-92): stripe flattening, qkv BN, relative-position
gather, qk/qr/kr logits, stacked-similarity BN + sum, key softmax, sv/sve,
output BN + halves sum. It deliberately mirrors the reference's
permute/reshape order (NCHW stripes) while the production op works on NHWC —
agreement between the two is the parity evidence.
"""
from __future__ import annotations

import numpy as np


def np_bn_train(x, scale, bias, eps=1e-5):
    """Channel-axis-1 batch norm, training mode (biased variance), numpy."""
    axes = (0,) + tuple(range(2, x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)  # biased
    shape = [1, -1] + [1] * (x.ndim - 2)
    return (x - mean) / np.sqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)


def axial_attention_golden(
    x_nchw: np.ndarray,
    params: dict,
    *,
    groups: int,
    out_planes: int,
    span: int,
    width_axis: bool,
    mode: str = "gated",
    gates=(0.1, 0.1, 0.1, 1.0),
    stride: int = 1,
) -> np.ndarray:
    """Train-mode axial attention on an NCHW input, pure numpy.

    ``params`` uses the production op's parameter pytree (flax layout):
      qkv_kernel (C_in, 2*out), bn_qkv {scale,bias} (2*out,),
      relative (2*gp, 2*span-1),
      bn_similarity {scale,bias} (3, g) [or (g,) for wopos],
      bn_output {scale,bias} (g, gp, 2) [or (g, gp) for wopos].
    """
    gp = out_planes // groups
    n, c_in, h, w = x_nchw.shape

    if width_axis:
        xp = x_nchw.transpose(0, 2, 1, 3)  # (N, H, C, W): attend along W
    else:
        xp = x_nchw.transpose(0, 3, 1, 2)  # (N, W, C, H): attend along H
    b = n * xp.shape[1]
    L = xp.shape[3]
    assert L == span
    xs = xp.reshape(b, c_in, L)

    # qkv projection + BN
    qkv = np.einsum("io,bil->bol", params["qkv_kernel"], xs)
    qkv = np_bn_train(qkv, params["bn_qkv_scale"], params["bn_qkv_bias"])
    qkv = qkv.reshape(b, groups, 2 * gp, L)
    q, k, v = qkv[:, :, : gp // 2], qkv[:, :, gp // 2 : gp], qkv[:, :, gp:]

    qk = np.einsum("bgci,bgcj->bgij", q, k)

    if mode != "wopos":
        rel = params["relative"]
        idx = np.arange(span)[:, None] - np.arange(span)[None, :] + span - 1
        all_emb = rel[:, idx]  # (2gp, span, span)
        q_emb, k_emb, v_emb = all_emb[: gp // 2], all_emb[gp // 2 : gp], all_emb[gp:]
        qr = np.einsum("bgci,cij->bgij", q, q_emb)
        kr = np.einsum("bgci,cij->bgij", k, k_emb).transpose(0, 1, 3, 2)
        if mode in ("gated", "gated_sig"):
            f_qr, f_kr, f_sve, f_sv = gates
            if mode == "gated_sig":
                sig = lambda z: 1.0 / (1.0 + np.exp(-z))
                f_qr, f_kr, f_sve, f_sv = map(sig, (f_qr, f_kr, f_sve, f_sv))
            qr = qr * f_qr
            kr = kr * f_kr
        stacked = np.concatenate([qk, qr, kr], axis=1)  # (b, 3g, L, L)
        stacked = np_bn_train(
            stacked,
            params["bn_similarity_scale"].reshape(-1),
            params["bn_similarity_bias"].reshape(-1),
        )
        logits = stacked.reshape(b, 3, groups, L, L).sum(axis=1)
    else:
        logits = np_bn_train(
            qk, params["bn_similarity_scale"], params["bn_similarity_bias"]
        )

    e = np.exp(logits - logits.max(axis=3, keepdims=True))
    sim = e / e.sum(axis=3, keepdims=True)

    sv = np.einsum("bgij,bgcj->bgci", sim, v)
    if mode != "wopos":
        sve = np.einsum("bgij,cij->bgci", sim, v_emb)
        if mode in ("gated", "gated_sig"):
            sv = sv * f_sv
            sve = sve * f_sve
        # separate per-channel BN for the sv and sve halves, then sum
        sv_n = np_bn_train(
            sv.reshape(b, out_planes, L),
            params["bn_output_scale"][..., 0].reshape(-1),
            params["bn_output_bias"][..., 0].reshape(-1),
        )
        sve_n = np_bn_train(
            sve.reshape(b, out_planes, L),
            params["bn_output_scale"][..., 1].reshape(-1),
            params["bn_output_bias"][..., 1].reshape(-1),
        )
        out = sv_n + sve_n
    else:
        out = np_bn_train(
            sv.reshape(b, out_planes, L),
            params["bn_output_scale"].reshape(-1),
            params["bn_output_bias"].reshape(-1),
        )

    if width_axis:
        out = out.reshape(n, h, out_planes, w).transpose(0, 2, 1, 3)
    else:
        out = out.reshape(n, w, out_planes, h).transpose(0, 2, 3, 1)

    if stride > 1:
        n_, c_, hh, ww = out.shape
        out = out.reshape(n_, c_, hh // stride, stride, ww // stride, stride).mean(
            axis=(3, 5)
        )
    return out

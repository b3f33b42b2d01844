"""Fused axial-attention Pallas kernels for the TRAINING path.

The eval kernel (ops/pallas_axial.py) folds BatchNorm *running* statistics
into affines. In train mode the similarity BN normalizes with *batch*
statistics over every stripe — a global reduction the reference computes by
materializing the stacked (stripes, 3, g, L, L) logits tensor
(reference axialnet.py:74-75). The TPU-native trick that makes a fused train
kernel possible without that materialization: the logit moments factorize,

    E[qk]  = (1/L^2) (sum_i q_i) . (sum_j k_j)            per (stripe, g)
    E[qk^2]= (1/L^2) tr((Q^T Q)(K^T K))
    E[qr]  = (1/L^2) sum_{c,i} q[c,i] * (sum_j qemb[c,i,j])
    E[qr^2]= (1/L^2) sum_i q_i^T (sum_j e_ij e_ij^T) q_i   (same shape for kr)

— O(S L c^2) instead of O(S L^2 c), no HBM-resident logits. With the batch
moments known, the BN becomes a per-(stack, group) affine and the whole
logits -> affine -> softmax -> sv/sve chain fuses into ONE kernel pass.

Differentiation: ``fused_attn_core`` is the custom-VJP primitive covering
exactly that chain. Everything around it — gate scaling, the relative-table
gather, the moment computation, the affine folding, and the output BN — is
ordinary differentiable XLA, so JAX's autodiff assembles the complete
BN-coupled backward (the d(batch-stat) terms flow through the factorized
moment einsums; the direct terms come from this module's backward kernel).
The backward kernel recomputes logits/softmax in VMEM (recompute beats HBM
round-trips at these arithmetic intensities) and emits d_q/d_k/d_v plus
accumulated table and affine gradients in one pass.

Layouts match the eval kernel: stripes S = batch x orthogonal-axis, q/k as
(S, g, c, L), v as (S, g, gp, L), embedding tables in ``all_emb`` coordinates
(qemb[c, i, j]; kemb read as [c, j, i]; vemb[p, i, j]) — reference math at
axialnet.py:62-82.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_registry as _kreg

_F32 = jnp.float32


def _sim_tiles(q, k, qemb, kemb, aff):
    """Recompute (qk, qr, kr, sim) for one (stripe-block, group) tile.

    q, k: (B, c, L); qemb/kemb: (c, L, L); aff: (8,) packed
    [a_qk, b_qk, a_qr, b_qr, a_kr, b_kr, 0, 0].
    """
    # qk[b,i,j] = sum_c q[b,c,i] k[b,c,j]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
    # qr[b,i,j] = sum_c q[b,c,i] qemb[c,i,j]   (batch over i)
    qr = jax.lax.dot_general(
        jnp.transpose(q, (2, 0, 1)), jnp.transpose(qemb, (1, 0, 2)),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
    qr = jnp.swapaxes(qr, 0, 1)
    # kr[b,i,j] = sum_c k[b,c,j] kemb[c,j,i]   (batch over j)
    kr = jax.lax.dot_general(
        jnp.transpose(k, (2, 0, 1)), jnp.transpose(kemb, (1, 0, 2)),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
    kr = jnp.transpose(kr, (1, 2, 0))

    logits = (qk * aff[0] + aff[1]) + (qr * aff[2] + aff[3]) \
        + (kr * aff[4] + aff[5])
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    sim = e / jnp.sum(e, axis=-1, keepdims=True)
    return qk, qr, kr, sim


def _fwd_kernel(q_ref, k_ref, v_ref, qemb_ref, kemb_ref, vemb_ref, aff_ref,
                sv_ref, sve_ref):
    """Forward: logits -> folded-affine -> softmax -> (sv, sve).

    One program covers a stripe block ACROSS ALL GROUPS (static unrolled
    loop) — the grid is 1-D over stripe blocks. Folding the tiny per-group
    work into one program amortizes per-program overhead, which dominates at
    these geometries (c as small as 1, L <= 128).
    """
    g = q_ref.shape[1]
    for grp in range(g):
        _, _, _, sim = _sim_tiles(q_ref[:, grp], k_ref[:, grp],
                                  qemb_ref[...], kemb_ref[...], aff_ref[grp])
        v = v_ref[:, grp]
        # sv[b,p,i] = sum_j v[b,p,j] sim[b,i,j]
        sv = jax.lax.dot_general(
            v, sim, (((2,), (2,)), ((0,), (0,))), preferred_element_type=_F32)
        # sve[b,p,i] = sum_j sim[b,i,j] vemb[p,i,j]   (batch over i)
        sve = jax.lax.dot_general(
            jnp.swapaxes(sim, 0, 1), jnp.transpose(vemb_ref[...], (1, 2, 0)),
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
        sve = jnp.transpose(sve, (1, 2, 0))
        sv_ref[:, grp] = sv
        sve_ref[:, grp] = sve


def _bwd_kernel(q_ref, k_ref, v_ref, qemb_ref, kemb_ref, vemb_ref, aff_ref,
                dsv_ref, dsve_ref,
                dq_ref, dk_ref, dv_ref,
                dqemb_ref, dkemb_ref, dvemb_ref, daff_ref):
    """Backward: 1-D grid over stripe blocks, all groups per program.

    The table/affine gradient outputs use constant index maps, so their
    blocks stay VMEM-resident across the entire grid and accumulate in
    place (initialized at step 0)."""
    step = pl.program_id(0)
    g = q_ref.shape[1]
    daff_rows = []
    for grp in range(g):
        aff = aff_ref[grp]
        q, k, v = q_ref[:, grp], k_ref[:, grp], v_ref[:, grp]
        qemb, kemb, vemb = qemb_ref[...], kemb_ref[...], vemb_ref[...]
        dsv, dsve = dsv_ref[:, grp], dsve_ref[:, grp]

        qk, qr, kr, sim = _sim_tiles(q, k, qemb, kemb, aff)

        # d_v[b,p,j] = sum_i dsv[b,p,i] sim[b,i,j]
        dv = jax.lax.dot_general(
            dsv, sim, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)
        dv_ref[:, grp] = dv

        # d_sim = dsv @ v (over p)  +  sum_p dsve[b,p,i] vemb[p,i,j]
        dsim = jax.lax.dot_general(
            dsv, v, (((1,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
        t = jax.lax.dot_general(
            jnp.transpose(dsve, (2, 0, 1)), jnp.transpose(vemb, (1, 0, 2)),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (i,B,j)
        dsim = dsim + jnp.swapaxes(t, 0, 1)

        # softmax backward
        dlog = sim * (dsim - jnp.sum(sim * dsim, axis=-1, keepdims=True))

        # affine gradients (shared bias gradient for the three stacks)
        db = jnp.sum(dlog)
        daff_rows.append(jnp.stack(
            [jnp.sum(dlog * qk), db, jnp.sum(dlog * qr), db,
             jnp.sum(dlog * kr), db,
             jnp.zeros((), _F32), jnp.zeros((), _F32)]))

        d_qk = dlog * aff[0]
        d_qr = dlog * aff[2]
        d_kr = dlog * aff[4]

        # d_q[b,c,i] = sum_j d_qk[b,i,j] k[b,c,j]
        #            + sum_j d_qr[b,i,j] qemb[c,i,j]
        dq = jax.lax.dot_general(
            k, d_qk, (((2,), (2,)), ((0,), (0,))), preferred_element_type=_F32)
        t2 = jax.lax.dot_general(
            jnp.transpose(d_qr, (1, 0, 2)), jnp.transpose(qemb, (1, 0, 2)),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (i,B,c)
        dq_ref[:, grp] = dq + jnp.transpose(t2, (1, 2, 0))

        # d_k[b,c,j] = sum_i d_qk[b,i,j] q[b,c,i]
        #            + sum_i d_kr[b,i,j] kemb[c,j,i]
        dk = jax.lax.dot_general(
            q, d_qk, (((2,), (1,)), ((0,), (0,))), preferred_element_type=_F32)
        t3 = jax.lax.dot_general(
            jnp.transpose(d_kr, (2, 0, 1)), jnp.transpose(kemb, (1, 0, 2)),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (j,B,c)
        dk_ref[:, grp] = dk + jnp.transpose(t3, (1, 2, 0))

        # table gradients, accumulated across stripe blocks
        # d_qemb[c,i,j] = sum_b d_qr[b,i,j] q[b,c,i]
        t4 = jax.lax.dot_general(
            jnp.transpose(q, (2, 1, 0)), jnp.transpose(d_qr, (1, 0, 2)),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (i,c,j)
        dqe = jnp.transpose(t4, (1, 0, 2))
        # d_kemb[c,j,i] = sum_b d_kr[b,i,j] k[b,c,j]
        t5 = jax.lax.dot_general(
            jnp.transpose(k, (2, 1, 0)), jnp.transpose(d_kr, (2, 0, 1)),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (j,c,i)
        dke = jnp.transpose(t5, (1, 0, 2))
        # d_vemb[p,i,j] = sum_b dsve[b,p,i] sim[b,i,j]
        t6 = jax.lax.dot_general(
            jnp.transpose(dsve, (2, 1, 0)), jnp.transpose(sim, (1, 0, 2)),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32)  # (i,p,j)
        dve = jnp.transpose(t6, (1, 0, 2))

        first = (step == 0) if grp == 0 else False

        @pl.when(first)
        def _(dqe=dqe, dke=dke, dve=dve):
            dqemb_ref[...] = dqe
            dkemb_ref[...] = dke
            dvemb_ref[...] = dve

        @pl.when(jnp.logical_not(first))
        def _(dqe=dqe, dke=dke, dve=dve):
            dqemb_ref[...] = dqemb_ref[...] + dqe
            dkemb_ref[...] = dkemb_ref[...] + dke
            dvemb_ref[...] = dvemb_ref[...] + dve

    daff = jnp.stack(daff_rows)  # (g, 8)

    @pl.when(step == 0)
    def _():
        daff_ref[...] = daff

    @pl.when(step != 0)
    def _():
        daff_ref[...] = daff_ref[...] + daff


def _pick_block(S: int, L: int, budget_bytes: int) -> int:
    """Largest stripe block that divides S and keeps the live (B, L, L)
    similarity tiles within ``budget_bytes`` of VMEM."""
    cap = max(1, budget_bytes // (4 * L * L))
    B = min(32, cap, S)
    while S % B:
        B -= 1
    return B


def _interpret_default(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@jax.custom_vjp
def fused_attn_core(q, k, v, qemb, kemb, vemb, sim_affine):
    """Fused logits -> affine -> softmax -> (sv, sve). All f32.

    Args:
      q, k: (S, g, c, L); v: (S, g, gp, L).
      qemb/kemb: (c, L, L); vemb: (gp, L, L) — shared across groups (the
        model's relative table is per-layer, not per-group); gates
        pre-folded.
      sim_affine: (g, 8) packed [a_qk, b_qk, a_qr, b_qr, a_kr, b_kr, 0, 0].
    Returns:
      (sv, sve), each (S, g, gp, L).
    """
    return _fwd(q, k, v, qemb, kemb, vemb, sim_affine)


def _fwd(q, k, v, qemb, kemb, vemb, sim_affine, interpret=None):
    interpret = _interpret_default(interpret)
    S, g, c, L = q.shape
    gp = v.shape[2]
    B = _pick_block(S, L, 1 << 20)  # ~4 live (B,L,L) f32 tiles + blocks
    grid = (S // B,)
    qk_spec = pl.BlockSpec((B, g, c, L), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((B, g, gp, L), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    cemb_spec = pl.BlockSpec((c, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((gp, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((S, g, gp, L), _F32)
    sv, sve = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec],
        out_specs=(v_spec, v_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(q, k, v, qemb, kemb, vemb, sim_affine)
    return sv, sve


def _fused_fwd_rule(q, k, v, qemb, kemb, vemb, sim_affine):
    out = _fwd(q, k, v, qemb, kemb, vemb, sim_affine)
    return out, (q, k, v, qemb, kemb, vemb, sim_affine)


def _fused_bwd_rule(residuals, grads, interpret=None):
    q, k, v, qemb, kemb, vemb, sim_affine = residuals
    dsv, dsve = grads
    interpret = _interpret_default(interpret)
    S, g, c, L = q.shape
    gp = v.shape[2]
    B = _pick_block(S, L, 1 << 18)  # ~10 live (B,L,L) f32 tiles,
    # double-buffered in/out blocks, and the unrolled group loop — the
    # Mosaic scoped-vmem stack OOMs past this (measured at b56 MedT)
    grid = (S // B,)  # accumulator blocks (constant index) stay resident

    qk_spec = pl.BlockSpec((B, g, c, L), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((B, g, gp, L), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    cemb_spec = pl.BlockSpec((c, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((gp, L, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    daff_spec = pl.BlockSpec((g, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    dq, dk, dv, dqemb, dkemb, dvemb, daff = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec, v_spec, v_spec],
        out_specs=(qk_spec, qk_spec, v_spec, cemb_spec, cemb_spec, pemb_spec,
                   daff_spec),
        out_shape=(
            jax.ShapeDtypeStruct((S, g, c, L), _F32),
            jax.ShapeDtypeStruct((S, g, c, L), _F32),
            jax.ShapeDtypeStruct((S, g, gp, L), _F32),
            jax.ShapeDtypeStruct((c, L, L), _F32),
            jax.ShapeDtypeStruct((c, L, L), _F32),
            jax.ShapeDtypeStruct((gp, L, L), _F32),
            jax.ShapeDtypeStruct((g, 8), _F32),
        ),
        interpret=interpret,
    )(q, k, v, qemb, kemb, vemb, sim_affine, dsv, dsve)
    return dq, dk, dv, dqemb, dkemb, dvemb, daff


fused_attn_core.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def attn_core_xla(q, k, v, qemb, kemb, vemb, sim_affine, has_pos=True):
    """Same contract as ``fused_attn_core``, pure XLA.

    Even without the Pallas kernel, folding the factorized batch moments
    into a constant affine removes the stacked-(3, g) BN materialization and
    its backward from the train graph — XLA fuses the three logit einsums
    elementwise into the softmax input. Used for the tiny-span geometries
    (MedT's local branch, spans 2..16) where per-program kernel overhead
    exceeds the fusion win; tables arrive unbroadcast ((c, L, L), shared
    across groups) so the two cores are drop-in interchangeable.
    """
    a = sim_affine  # (g, 8)
    qk = jnp.einsum("sgci,sgcj->sgij", q, k,
                    preferred_element_type=_F32)
    logits = qk * a[:, 0, None, None] + a[:, 1, None, None]
    if has_pos:
        qr = jnp.einsum("sgci,cij->sgij", q, qemb,
                        preferred_element_type=_F32)
        kr = jnp.einsum("sgcj,cji->sgij", k, kemb,
                        preferred_element_type=_F32)
        logits = logits + (qr * a[:, 2, None, None] + a[:, 3, None, None]) \
            + (kr * a[:, 4, None, None] + a[:, 5, None, None])
    sim = jax.nn.softmax(logits, axis=-1)
    sv = jnp.einsum("sgij,sgpj->sgpi", sim, v,
                    preferred_element_type=_F32)
    if not has_pos:
        return sv, jnp.zeros_like(sv)
    sve = jnp.einsum("sgij,pij->sgpi", sim, vemb,
                     preferred_element_type=_F32)
    return sv, sve


# below this span the fused kernels' per-program overhead loses to XLA's
# batched einsums (measured on v5e; MedT's local branch runs at spans 2..16)
FUSED_TRAIN_MIN_SPAN = 32

_VMEM_BUDGET = 12 << 20  # leave headroom under the ~16MB/core VMEM


def fused_train_supported(span: int, groups: int, gp: int) -> bool:
    """Whether the kernels' group-resident tables + tiles fit VMEM.

    The backward pass holds the (g, c, L, L) q/k tables, the (g, gp, L, L)
    v table, and their gradient accumulators resident, plus ~8 live
    (B, L, L) working tiles.
    """
    c = gp // 2
    del groups  # tables are group-shared, not per-group
    table_bytes = 2 * (2 * c + gp) * span * span * 4
    tile_bytes = 8 * 8 * span * span * 4  # 8 live tiles at stripe block 8
    return (_kreg.family_enabled(_kreg.FAMILY_STRIPE)
            and table_bytes + tile_bytes <= _VMEM_BUDGET)


# ---------------------------------------------------------------------------
# differentiable XLA glue: factorized logit moments
# ---------------------------------------------------------------------------

def logit_moments(q, k, qemb, kemb):
    """Batch mean/variance of the (gated) qk/qr/kr logits per (3, g) channel,
    WITHOUT materializing any (S, g, L, L) tensor (see module docstring).

    Args:
      q, k: (S, g, c, L) f32; qemb/kemb: (c, L, L) gate-folded tables
        (``all_emb`` coordinates — kr reads kemb as [c, j, i]).
    Returns:
      (mean, var_biased, count) with mean/var shaped (3, g).
    """
    S, g, c, L = q.shape
    n = S * L * L
    qs = jnp.sum(q, axis=3)
    ks = jnp.sum(k, axis=3)
    m1_qk = jnp.einsum("sgc,sgc->g", qs, ks) / n
    qq = jnp.einsum("sgcl,sgdl->sgcd", q, q)
    kk = jnp.einsum("sgcl,sgdl->sgcd", k, k)
    m2_qk = jnp.einsum("sgcd,sgcd->g", qq, kk) / n

    r_q = jnp.sum(qemb, axis=2)                        # (c, i)
    m1_qr = jnp.einsum("sgci,ci->g", q, r_q) / n
    E_q = jnp.einsum("cij,dij->icd", qemb, qemb)       # (i, c, c)
    m2_qr = jnp.einsum("sgci,icd,sgdi->g", q, E_q, q) / n

    r_k = jnp.sum(kemb, axis=2)                        # (c, j)
    m1_kr = jnp.einsum("sgcj,cj->g", k, r_k) / n
    E_k = jnp.einsum("cji,dji->jcd", kemb, kemb)       # (j, c, c)
    m2_kr = jnp.einsum("sgcj,jcd,sgdj->g", k, E_k, k) / n

    mean = jnp.stack([m1_qk, m1_qr, m1_kr])            # (3, g)
    msq = jnp.stack([m2_qk, m2_qr, m2_kr])
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return mean, var, n


def qk_moments(q, k):
    """wopos variant: moments of qk only, per (g,) channel."""
    S, g, c, L = q.shape
    n = S * L * L
    qs = jnp.sum(q, axis=3)
    ks = jnp.sum(k, axis=3)
    m1 = jnp.einsum("sgc,sgc->g", qs, ks) / n
    qq = jnp.einsum("sgcl,sgdl->sgcd", q, q)
    kk = jnp.einsum("sgcl,sgdl->sgcd", k, k)
    m2 = jnp.einsum("sgcd,sgcd->g", qq, kk) / n
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return m1, var, n


def fold_train_affine(scale, bias, mean, var, eps: float = 1e-5):
    """gamma/beta + batch moments -> (a, b) with y = a*x + b."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a


def pack_sim_affine(g: int, a, b, mode: str):
    """Pack per-stack affines into the kernel's (g, 8) layout.

    a/b are (3, g) for full/gated modes or (g,) for wopos (rows 2..5 zero).
    """
    aff = jnp.zeros((g, 8), _F32)
    if mode == "wopos":
        return aff.at[:, 0].set(a).at[:, 1].set(b)
    for row in range(3):
        aff = aff.at[:, 2 * row].set(a[row]).at[:, 2 * row + 1].set(b[row])
    return aff


def logit_moments_lanes(q, k, qemb, kemb):
    """``logit_moments`` for stripe-LANE layout inputs q/k: (g, c, L, S).

    NOTE: a single-transpose glue feeding these was measured ~2% SLOWER
    end to end than the three-transpose chain XLA already fuses (405 vs
    413 imgs/s at MedT b56) — the batch-last einsum layout costs more than
    the saved copy — so the op glue keeps the stripe-major moments. Kept
    (tested bit-equal) for future layout experiments.
    """
    g, c, L, S = q.shape
    n = S * L * L
    q, k = q.astype(jnp.float32), k.astype(jnp.float32)  # bf16-safe sums
    qs = jnp.sum(q, axis=2)                            # (g, c, S)
    ks = jnp.sum(k, axis=2)
    m1_qk = jnp.einsum("gcs,gcs->g", qs, ks) / n
    qq = jnp.einsum("gcls,gdls->sgcd", q, q)
    kk = jnp.einsum("gcls,gdls->sgcd", k, k)
    m2_qk = jnp.einsum("sgcd,sgcd->g", qq, kk) / n

    r_q = jnp.sum(qemb, axis=2)                        # (c, i)
    m1_qr = jnp.einsum("gcis,ci->g", q, r_q) / n
    E_q = jnp.einsum("cij,dij->icd", qemb, qemb)       # (i, c, c)
    m2_qr = jnp.einsum("gcis,icd,gdis->g", q, E_q, q) / n

    r_k = jnp.sum(kemb, axis=2)                        # (c, j)
    m1_kr = jnp.einsum("gcjs,cj->g", k, r_k) / n
    E_k = jnp.einsum("cji,dji->jcd", kemb, kemb)       # (j, c, c)
    m2_kr = jnp.einsum("gcjs,jcd,gdjs->g", k, E_k, k) / n

    mean = jnp.stack([m1_qk, m1_qr, m1_kr])            # (3, g)
    msq = jnp.stack([m2_qk, m2_qr, m2_kr])
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return mean, var, n


def qk_moments_lanes(q, k):
    """``qk_moments`` for stripe-LANE layout inputs (g, c, L, S)."""
    g, c, L, S = q.shape
    n = S * L * L
    q, k = q.astype(jnp.float32), k.astype(jnp.float32)  # bf16-safe sums
    qs = jnp.sum(q, axis=2)
    ks = jnp.sum(k, axis=2)
    m1 = jnp.einsum("gcs,gcs->g", qs, ks) / n
    qq = jnp.einsum("gcls,gdls->sgcd", q, q)
    kk = jnp.einsum("gcls,gdls->sgcd", k, k)
    m2 = jnp.einsum("sgcd,sgcd->g", qq, kk) / n
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return m1, var, n


def logit_moments_raw(q, k, qemb, kemb):
    """``logit_moments`` on RAW pre-stripe layout q/k: (n, L, m, g, c).

    NOTE: measured ~25% SLOWER end to end than the stripe-major moments
    (311 vs 413 imgs/s at MedT b56): contracting over the second-major L
    axis forces XLA to insert the very transposes this was meant to save.
    Kept (tested equal) as documentation of the negative result.
    """
    n_, L, m_, g, c = q.shape
    n = n_ * m_ * L * L
    qs = jnp.sum(q, axis=1)                            # (n, m, g, c)
    ks = jnp.sum(k, axis=1)
    m1_qk = jnp.einsum("nmgc,nmgc->g", qs, ks) / n
    qq = jnp.einsum("nlmgc,nlmgd->nmgcd", q, q)
    kk = jnp.einsum("nlmgc,nlmgd->nmgcd", k, k)
    m2_qk = jnp.einsum("nmgcd,nmgcd->g", qq, kk) / n

    r_q = jnp.sum(qemb, axis=2)                        # (c, i=l)
    m1_qr = jnp.einsum("nlmgc,cl->g", q, r_q) / n
    E_q = jnp.einsum("cij,dij->icd", qemb, qemb)       # (i, c, c)
    m2_qr = jnp.einsum("nlmgc,lcd,nlmgd->g", q, E_q, q) / n

    r_k = jnp.sum(kemb, axis=2)                        # (c, j=l)
    m1_kr = jnp.einsum("nlmgc,cl->g", k, r_k) / n
    E_k = jnp.einsum("cji,dji->jcd", kemb, kemb)       # (j, c, c)
    m2_kr = jnp.einsum("nlmgc,lcd,nlmgd->g", k, E_k, k) / n

    mean = jnp.stack([m1_qk, m1_qr, m1_kr])
    msq = jnp.stack([m2_qk, m2_qr, m2_kr])
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return mean, var, n


def qk_moments_raw(q, k):
    """``qk_moments`` on RAW pre-stripe layout (n, L, m, g, c)."""
    n_, L, m_, g, c = q.shape
    n = n_ * m_ * L * L
    qs = jnp.sum(q, axis=1)
    ks = jnp.sum(k, axis=1)
    m1 = jnp.einsum("nmgc,nmgc->g", qs, ks) / n
    qq = jnp.einsum("nlmgc,nlmgd->nmgcd", q, q)
    kk = jnp.einsum("nlmgc,nlmgd->nmgcd", k, k)
    m2 = jnp.einsum("nmgcd,nmgcd->g", qq, kk) / n
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return m1, var, n

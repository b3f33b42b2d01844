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
lives on the LANES, the span L on sublanes. Two families share the layout:
the plain kernels below for spans 2..16 (whole (L, L, Sb) tile live), and
the key-streamed "flash" variants at the bottom of the file for spans
32..64 (online softmax over (L, Jb, Sb) key blocks — these replaced the
stripe-block kernels of ops/pallas_axial_train.py at mid spans, whose
c<=4-deep matmuls left the MXU ~99% idle). Every elementwise op and
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

from . import kernel_registry as _kreg

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


def _split_qkv(qkv_ref):
    """Load a fused (1, 2gp, L, Sb) qkv block and split the channel rows
    ([0:c]=q, [c:gp]=k, [gp:2gp]=v, c = gp//2) — static leading-axis
    slices of a loaded VMEM array, free under Mosaic. The fused operand is
    what kills the XLA boundary copies: the caller passes the projection's
    own (g, 2gp, L, S) tensor instead of three materialized slices, and
    the backward writes one dqkv instead of concat(dq, dk, dv)."""
    qkv = qkv_ref[0].astype(_F32)
    gp = qkv.shape[0] // 2
    c = gp // 2
    return qkv[:c], qkv[c:gp], qkv[gp:]


def _fwd_kernel(qkv_ref, qemb_ref, kembt_ref, vemb_ref, aff_ref,
                sv_ref, sve_ref, *, has_pos: bool):
    # one (group, stripe-block) per program: grid = (g, S // Sb). Per-program
    # VMEM is ~g-times smaller than an all-groups body, which is what admits
    # the wider-gp geometries and keeps Mosaic compile time low. The tiny
    # (g, 8) affine stays fully resident (a (1, 8) block would violate the
    # sublane tiling rule); each program reads its own row via pl.ds (a
    # plain [i] with a traced index is a gather, which has no Mosaic rule).
    aff = aff_ref[pl.ds(pl.program_id(0), 1), :][0]
    # qkv may arrive bf16 (halved HBM loads); upcast ONCE in VMEM — exact,
    # so the bf16-input path matches upcasting outside the kernel bit-for-bit
    q, k, v = _split_qkv(qkv_ref)
    logits = _qk_lanes(q, k) * aff[0] + aff[1]
    if has_pos:
        qr, kr = _pos_logits(q, k, qemb_ref[...], kembt_ref[...])
        logits = logits + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
    sim = _softmax_j(logits)
    sv_ref[0] = _sv_lanes(sim, v)
    if has_pos:
        sve_ref[0] = _sve_lanes(sim, vemb_ref[...])


def _bwd_kernel(qkv_ref, qemb_ref, kembt_ref, vemb_ref, aff_ref,
                dsv_ref, dsve_ref,
                dqkv_ref,
                dqemb_ref, dkembt_ref, dvemb_ref, daff_ref,
                *, has_pos: bool):
    """One (group, stripe-block) per program, grid = (g, S // Sb).

    dq/dk/dv write row ranges of ONE fused dqkv block (mirroring the fused
    input), so the XLA side sees a single (g, 2gp, L, S) cotangent with no
    concat. The table-gradient outputs use constant index maps, so their
    blocks stay VMEM-resident across the whole grid and accumulate in
    place; the daff block is constant along the inner (stripe) grid axis
    and accumulates per group."""
    gi = pl.program_id(0)
    si = pl.program_id(1)
    aff = aff_ref[pl.ds(gi, 1), :][0]
    q, k, v = _split_qkv(qkv_ref)
    dsv = dsv_ref[0]
    c, gp = q.shape[0], v.shape[0]

    qk = _qk_lanes(q, k)
    logits = qk * aff[0] + aff[1]
    if has_pos:
        qemb, kemb_t, vemb = qemb_ref[...], kembt_ref[...], vemb_ref[...]
        qr, kr = _pos_logits(q, k, qemb, kemb_t)
        logits = logits + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
    sim = _softmax_j(logits)

    # dv[p, j, s] = sum_i dsv[p, i, s] sim[i, j, s]
    dqkv_ref[0, gp:] = jnp.stack(
        [jnp.sum(dsv[p][:, None, :] * sim, axis=0)
         for p in range(gp)]).astype(dqkv_ref.dtype)

    # dsim[i,j,s] = sum_p dsv[p,i,s] v[p,j,s] (+ sum_p dsve[p,i,s] vemb[p,i,j])
    dsim = dsv[0][:, None, :] * v[0][None, :, :]
    for p in range(1, gp):
        dsim += dsv[p][:, None, :] * v[p][None, :, :]
    if has_pos:
        dsve = dsve_ref[0]
        for p in range(gp):
            dsim += dsve[p][:, None, :] * vemb[p][:, :, None]

    # softmax backward over j
    dlog = sim * (dsim - jnp.sum(sim * dsim, axis=1, keepdims=True))

    db = jnp.sum(dlog)
    if has_pos:
        daff = jnp.stack(
            [jnp.sum(dlog * qk), db, jnp.sum(dlog * qr), db,
             jnp.sum(dlog * kr), db,
             jnp.zeros((), _F32), jnp.zeros((), _F32)])
    else:
        z = jnp.zeros((), _F32)
        daff = jnp.stack([jnp.sum(dlog * qk), db, z, z, z, z, z, z])

    @pl.when(jnp.logical_and(si == 0, gi == 0))
    def _():
        daff_ref[...] = jnp.zeros_like(daff_ref)

    daff_ref[pl.ds(gi, 1), :] = daff_ref[pl.ds(gi, 1), :] + daff[None]

    d_qk = dlog * aff[0]
    # dq[c,i,s] = sum_j d_qk[i,j,s] k[c,j,s] (+ sum_j d_qr[i,j,s] qemb[c,i,j])
    # dk[c,j,s] = sum_i d_qk[i,j,s] q[c,i,s] (+ sum_i d_kr[i,j,s] kemb_t[c,i,j])
    if has_pos:
        d_qr = dlog * aff[2]
        d_kr = dlog * aff[4]
        dqkv_ref[0, :c] = jnp.stack(
            [jnp.sum(d_qk * k[ci][None, :, :], axis=1)
             + jnp.sum(d_qr * qemb[ci][:, :, None], axis=1)
             for ci in range(c)]).astype(dqkv_ref.dtype)
        dqkv_ref[0, c:gp] = jnp.stack(
            [jnp.sum(d_qk * q[ci][:, None, :], axis=0)
             + jnp.sum(d_kr * kemb_t[ci][:, :, None], axis=0)
             for ci in range(c)]).astype(dqkv_ref.dtype)
        # table grads (tables shared across groups): accumulated over the
        # ENTIRE grid in resident constant-index blocks
        dqe = jnp.stack([jnp.sum(d_qr * q[ci][:, None, :], axis=2)
                         for ci in range(c)])
        dke = jnp.stack([jnp.sum(d_kr * k[ci][None, :, :], axis=2)
                         for ci in range(c)])
        dve = jnp.stack([jnp.sum(sim * dsve[p][:, None, :], axis=2)
                         for p in range(gp)])
        first = jnp.logical_and(gi == 0, si == 0)

        @pl.when(first)
        def _():
            dqemb_ref[...] = dqe
            dkembt_ref[...] = dke
            dvemb_ref[...] = dve

        @pl.when(jnp.logical_not(first))
        def _():
            dqemb_ref[...] = dqemb_ref[...] + dqe
            dkembt_ref[...] = dkembt_ref[...] + dke
            dvemb_ref[...] = dvemb_ref[...] + dve
    else:
        dqkv_ref[0, :c] = jnp.stack(
            [jnp.sum(d_qk * k[ci][None, :, :], axis=1)
             for ci in range(c)]).astype(dqkv_ref.dtype)
        dqkv_ref[0, c:gp] = jnp.stack(
            [jnp.sum(d_qk * q[ci][:, None, :], axis=0)
             for ci in range(c)]).astype(dqkv_ref.dtype)


_VMEM_BUDGET = 9 << 20  # of the 16MB scoped-vmem limit; the estimates below
# measure ~1.9x under Mosaic's true scoped allocation (spills, pipeline
# slack), so 9MB estimated targets ~15.9MB real — measured at the edge: the
# flash FORWARD at (gp=4, span=64, Sb=256) compiles and runs (+5% MedT
# end-to-end over the 6MB budget's Sb=128), while 12MB (bwd Sb=256) OOMs
# the scoped stack at 18.2M. The BACKWARD holds ~2x the live state and its
# real/estimated ratio runs higher (gp=8 span=32 bwd at Sb=256 fails), so
# it keeps the proven 6MB derate:
_VMEM_BUDGET_BWD = 6 << 20


def _per_lane_bytes(g: int, c: int, gp: int, L: int, bwd: bool) -> int:
    """f32 bytes per lane of live per-PROGRAM state (x2 on the grid-blocked
    arrays for Mosaic's double buffering, plus (L, L) working tiles).
    One group per program — g does not enter."""
    del g
    if bwd:
        # in: q,k,v,dsv,dsve; out: dq,dk,dv  -> 4c + 4gp channels
        arrays = 2 * (4 * c + 4 * gp) * L
        tiles = 12 * L * L
    else:
        # in: q,k,v; out: sv,sve  -> 2c + 3gp channels
        arrays = 2 * (2 * c + 3 * gp) * L
        tiles = 8 * L * L
    return 4 * (arrays + tiles)


def _pick_sblock(S: int, g: int, c: int, gp: int, L: int,
                 bwd: bool = False) -> int:
    """Largest lane block that divides S within the VMEM budget, or 0.

    Mosaic requires the minor (lane) block dim be a multiple of 128 or the
    whole axis, so candidates are 128-multiples dividing S (S itself as the
    fallback when no such divisor exists and S fits the budget).

    The backward uses the derated ``_VMEM_BUDGET_BWD`` (same asymmetry as
    ``_flash_pick_sblock``): it holds ~2x the live state and its
    real/estimated scoped-VMEM ratio runs higher, so the 9MB forward budget
    would target ~17MB real > the 16MB limit."""
    per_lane = _per_lane_bytes(g, c, gp, L, bwd)
    budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET
    cap = min(1024, budget // per_lane, S)
    for Sb in range((cap // 128) * 128, 0, -128):
        if S % Sb == 0:
            return Sb
    return S if S * per_lane <= budget else 0


def _interpret_default(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@jax.custom_vjp
def lanes_attn_core(qkv, qemb, kemb_t, vemb, sim_affine):
    """Fused small-span attention core in stripe-lane layout.

    Args:
      qkv: (g, 2*gp, L, S) — channel rows [0:c]=q, [c:gp]=k, [gp:2gp]=v,
        c = gp//2 (the qkv projection's own layout: ONE tensor in, so the
        XLA boundary never materializes q/k/v slices, and the backward
        returns ONE dqkv with no concat).
      qemb: (c, L, L); kemb_t: (c, L, L) pre-swapped so kr uses [c, i, j];
        vemb: (gp, L, L). Pass zero-shaped (0, L, L) tables for wopos.
      sim_affine: (g, 8), pack_sim_affine layout.
    Returns:
      (sv, sve), each (g, gp, L, S); sve is zeros for wopos.
    """
    return _fwd(qkv, qemb, kemb_t, vemb, sim_affine)


def _fwd(qkv, qemb, kemb_t, vemb, sim_affine, interpret=None):
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb = _pick_sblock(S, g, c, gp, L)
    assert Sb >= 1, (S, g, c, gp, L)
    grid = (g, S // Sb)
    qkv_spec = pl.BlockSpec((1, 2 * gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                          memory_space=pltpu.VMEM)
    cemb_spec = pl.BlockSpec((max(c, 1), L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((max(gp, 1), L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((g, gp, L, S), _F32)
    if not has_pos:
        # keep block shapes non-empty: feed (1, L, L) zero tables
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
        cemb_spec = pl.BlockSpec((1, L, L), lambda gi, si: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        pemb_spec = cemb_spec
    sv, sve = pl.pallas_call(
        functools.partial(_fwd_kernel, has_pos=has_pos),
        grid=grid,
        in_specs=[qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec],
        out_specs=(v_spec, v_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(qkv, qemb, kemb_t, vemb, sim_affine)
    if not has_pos:
        sve = jnp.zeros_like(sv)
    return sv, sve


def _fwd_rule(qkv, qemb, kemb_t, vemb, sim_affine):
    out = _fwd(qkv, qemb, kemb_t, vemb, sim_affine)
    return out, (qkv, qemb, kemb_t, vemb, sim_affine)


def _bwd_rule(residuals, grads, interpret=None):
    qkv, qemb, kemb_t, vemb, sim_affine = residuals
    dsv, dsve = grads
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb = _pick_sblock(S, g, c, gp, L, bwd=True)
    assert Sb >= 1, (S, g, c, gp, L)
    grid = (g, S // Sb)

    qkv_spec = pl.BlockSpec((1, 2 * gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                          memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if not has_pos:
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
    cemb_spec = pl.BlockSpec((ce, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((pe, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                            memory_space=pltpu.VMEM)

    dqkv, dqe, dke_t, dve, daff = pl.pallas_call(
        functools.partial(_bwd_kernel, has_pos=has_pos),
        grid=grid,
        in_specs=[qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec, v_spec, v_spec],
        out_specs=(qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                   aff_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, 2 * gp, L, S), qkv.dtype),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((pe, L, L), _F32),
            jax.ShapeDtypeStruct((g, 8), _F32),
        ),
        interpret=interpret,
    )(qkv, qemb, kemb_t, vemb, sim_affine, dsv, dsve)
    if not has_pos:
        zc = jnp.zeros((0, L, L), _F32)
        return dqkv, zc, zc, jnp.zeros((0, L, L), _F32), daff
    return dqkv, dqe, dke_t, dve, daff


lanes_attn_core.defvjp(_fwd_rule, _bwd_rule)


# probe/A-B escape hatch: set False to force the XLA core at small spans
LANES_ENABLED = True


def lanes_supported(span: int, groups: int, gp: int, stripes: int) -> bool:
    """Admission: small spans only (the stripe-block kernel owns L >= 32),
    lane axis long enough to fill tiles, and BOTH the forward and backward
    kernels fit the VMEM budget (the backward holds ~2x the live state; an
    admission check on forward alone would crash the grad trace)."""
    c = max(gp // 2, 1)
    return (LANES_ENABLED and _kreg.family_enabled(_kreg.FAMILY_LANES)
            and span <= 16 and stripes >= 128
            and _pick_sblock(stripes, groups, c, gp, span) >= 128
            and _pick_sblock(stripes, groups, c, gp, span, bwd=True) >= 128)


# ---------------------------------------------------------------------------
# streamed ("flash") variant for the mid spans (32..64)
# ---------------------------------------------------------------------------
#
# At L >= 32 the plain lanes kernels' (L, L, Sb) tiles outgrow VMEM, and the
# stripe-block kernels (ops/pallas_axial_train.py) pay tiny-MXU latency on
# every c<=4-deep matmul — the profiled bottleneck of the whole train step
# (span-64 bwd ~15.5 ms per op at b56). This variant keeps the stripe-lane
# layout but STREAMS the key axis in Jb-blocks with an online softmax, so
# the live tile is (L, Jb, Sb) and everything stays VPU broadcasts:
#
#   forward: running (max m, denom l) per (i, s); sv/sve accumulated with
#     exp-rescaling; m and l emitted for the backward.
#   backward: softmax probabilities are reconstructed per j-block directly
#     from the saved (m, l) — no second online pass — and
#     delta[i,s] = sum_j sim*dsim = sum_p dsv*sv + sum_p dsve*sve
#     (both outputs are linear in sim), so dlog needs only the saved
#     forward outputs.

_JB_FWD = 16  # key-axis blocks: (L, Jb, Sb) f32 tiles; the backward holds
# ~10 live tiles per j-step vs the forward's ~6, so it streams in smaller,
# adaptively-chosen key blocks (8, then 4 for the widest geometries)


def _flash_fwd_kernel(qkv_ref, qemb_ref, kembt_ref, vemb_ref,
                      aff_ref, sv_ref, sve_ref, m_ref, l_ref,
                      *, has_pos: bool, L: int, jb_size: int = _JB_FWD):
    """Online-softmax forward over key blocks.

    Takes the fused (1, 2gp, L, Sb) qkv block (see ``_split_qkv``). ``L``
    is the KEY length; the per-block table slices are (·, q-rows, L)."""
    _JB = jb_size
    aff = aff_ref[pl.ds(pl.program_id(0), 1), :][0]
    # read blocks fully into arrays first: partial slices with None on a
    # deferred ref transform fail the Mosaic kernel trace. Upcast once in
    # VMEM: bf16 inputs (halved HBM loads) match the f32 path exactly.
    q, k, v = _split_qkv(qkv_ref)
    c, gp, Sb = q.shape[0], v.shape[0], q.shape[-1]
    Lq = q.shape[1]
    # hoist the loop-invariant q sublane broadcasts (see _flash_bwd_kernel)
    qb = [jnp.broadcast_to(q[ci][:, None, :], (Lq, _JB, Sb))
          for ci in range(c)]
    neg = jnp.full((Lq, 1, Sb), -1e30, _F32)
    m = neg
    l = jnp.zeros((Lq, 1, Sb), _F32)
    sv_acc = [jnp.zeros((Lq, Sb), _F32) for _ in range(gp)]
    sve_acc = [jnp.zeros((Lq, Sb), _F32) for _ in range(gp)]
    for jb in range(L // _JB):
        j0 = jb * _JB
        # logits block (L, _JB, Sb)
        lg = qb[0] * k[0][j0:j0 + _JB, :][None]
        for ci in range(1, c):
            lg += qb[ci] * k[ci][j0:j0 + _JB, :][None]
        lg = lg * aff[0] + aff[1]
        if has_pos:
            qemb, kemb_t = qemb_ref[...], kembt_ref[...]
            qr = qb[0] * qemb[0][:, j0:j0 + _JB][:, :, None]
            kr = k[0][j0:j0 + _JB, :][None] * kemb_t[0][:, j0:j0 + _JB][:, :, None]
            for ci in range(1, c):
                qr += qb[ci] * qemb[ci][:, j0:j0 + _JB][:, :, None]
                kr += (k[ci][j0:j0 + _JB, :][None]
                       * kemb_t[ci][:, j0:j0 + _JB][:, :, None])
            lg = lg + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        m_new = jnp.maximum(m, jnp.max(lg, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)[:, 0, :]  # (L, Sb)
        e = jnp.exp(lg - m_new)              # (L, _JB, Sb)
        l = l * alpha[:, None, :] + jnp.sum(e, axis=1, keepdims=True)
        for p in range(gp):
            sv_acc[p] = (sv_acc[p] * alpha
                         + jnp.sum(e * v[p][j0:j0 + _JB, :][None], axis=1))
            if has_pos:
                vemb = vemb_ref[...]
                sve_acc[p] = (sve_acc[p] * alpha
                              + jnp.sum(e * vemb[p][:, j0:j0 + _JB][:, :, None],
                                        axis=1))
        m = m_new
    inv_l = 1.0 / l[:, 0, :]
    sv_ref[0] = jnp.stack([a * inv_l for a in sv_acc])
    if has_pos:
        sve_ref[0] = jnp.stack([a * inv_l for a in sve_acc])
    m_ref[0] = m[:, 0, :]
    l_ref[0] = l[:, 0, :]


def _flash_bwd_kernel(qkv_ref, qemb_ref, kembt_ref, vemb_ref,
                      aff_ref, m_ref, l_ref, sv_ref, sve_ref,
                      dsv_ref, dsve_ref,
                      dqkv_ref,
                      dqemb_ref, dkembt_ref, dvemb_ref, daff_ref,
                      *, has_pos: bool, L: int, jb_size: int):
    _JB = jb_size
    gi = pl.program_id(0)
    si = pl.program_id(1)
    aff = aff_ref[pl.ds(gi, 1), :][0]
    q, k, v = _split_qkv(qkv_ref)
    c, gp, Sb = q.shape[0], v.shape[0], q.shape[-1]
    dsv, dsve = dsv_ref[...][0], dsve_ref[...][0]
    sv, sve = sv_ref[...][0], sve_ref[...][0]

    # delta[i, s] = sum_j sim * dsim
    delta = jnp.sum(dsv * sv, axis=0)
    if has_pos:
        delta = delta + jnp.sum(dsve * sve, axis=0)

    # Hoist every loop-invariant sublane broadcast out of the unrolled key
    # loop: (L, 1, Sb) operands broadcast against (L, _JB, Sb) tiles pay a
    # per-use sublane-broadcast op, and the per-(i, s) softmax state plus
    # the q/dsv/dsve rows are reused by EVERY key block. Materializing the
    # (L, _JB, Sb) form once turns ~(4 + c + 2 gp) broadcasts per block
    # into plain aligned elementwise reads.
    bcast = lambda t: jnp.broadcast_to(t[:, None, :], (t.shape[0], _JB, Sb))
    m = bcast(m_ref[...][0])
    inv_l = bcast(1.0 / l_ref[...][0])
    delta = bcast(delta)
    qb = [bcast(q[ci]) for ci in range(c)]
    dsvb = [bcast(dsv[p]) for p in range(gp)]
    dsveb = [bcast(dsve[p]) for p in range(gp)] if has_pos else None

    dq_acc = [jnp.zeros((L, Sb), _F32) for _ in range(c)]
    d_qk_sum = jnp.zeros((), _F32)
    d_qr_sum = jnp.zeros((), _F32)
    d_kr_sum = jnp.zeros((), _F32)
    db = jnp.zeros((), _F32)
    if has_pos:
        qemb, kemb_t, vemb = qemb_ref[...], kembt_ref[...], vemb_ref[...]
    for jb in range(L // _JB):
        j0 = jb * _JB
        qk = qb[0] * k[0][j0:j0 + _JB, :][None]
        for ci in range(1, c):
            qk += qb[ci] * k[ci][j0:j0 + _JB, :][None]
        lg = qk * aff[0] + aff[1]
        if has_pos:
            qr = qb[0] * qemb[0][:, j0:j0 + _JB][:, :, None]
            kr = k[0][j0:j0 + _JB, :][None] * kemb_t[0][:, j0:j0 + _JB][:, :, None]
            for ci in range(1, c):
                qr += qb[ci] * qemb[ci][:, j0:j0 + _JB][:, :, None]
                kr += (k[ci][j0:j0 + _JB, :][None]
                       * kemb_t[ci][:, j0:j0 + _JB][:, :, None])
            lg = lg + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        sim = jnp.exp(lg - m) * inv_l  # (L, _JB, Sb)

        # dsim = sum_p dsv[p,i,s] v[p,j,s] (+ sum_p dsve[p,i,s] vemb[p,i,j])
        dsim = dsvb[0] * v[0][j0:j0 + _JB, :][None]
        for p in range(1, gp):
            dsim += dsvb[p] * v[p][j0:j0 + _JB, :][None]
        if has_pos:
            for p in range(gp):
                dsim += dsveb[p] * vemb[p][:, j0:j0 + _JB][:, :, None]

        dlog = sim * (dsim - delta)
        db += jnp.sum(dlog)
        d_qk_sum += jnp.sum(dlog * qk)
        d_qk = dlog * aff[0]
        if has_pos:
            d_qr_sum += jnp.sum(dlog * qr)
            d_kr_sum += jnp.sum(dlog * kr)
            d_qr = dlog * aff[2]
            d_kr = dlog * aff[4]

        # dv[p, j, s] = sum_i dsv[p,i,s] sim[i,j,s]  (write this j-slice)
        dqkv_ref[0, gp:, j0:j0 + _JB, :] = jnp.stack(
            [jnp.sum(dsvb[p] * sim, axis=0)
             for p in range(gp)]).astype(dqkv_ref.dtype)
        # dk[c, j, s] = sum_i d_qk q[c,i,s] (+ sum_i d_kr kemb_t[c,i,j])
        if has_pos:
            dqkv_ref[0, c:gp, j0:j0 + _JB, :] = jnp.stack(
                [jnp.sum(d_qk * qb[ci], axis=0)
                 + jnp.sum(d_kr * kemb_t[ci][:, j0:j0 + _JB][:, :, None], axis=0)
                 for ci in range(c)]).astype(dqkv_ref.dtype)
        else:
            dqkv_ref[0, c:gp, j0:j0 + _JB, :] = jnp.stack(
                [jnp.sum(d_qk * qb[ci], axis=0)
                 for ci in range(c)]).astype(dqkv_ref.dtype)
        # dq accumulation over j-blocks
        for ci in range(c):
            t = jnp.sum(d_qk * k[ci][j0:j0 + _JB, :][None], axis=1)
            if has_pos:
                t += jnp.sum(d_qr * qemb[ci][:, j0:j0 + _JB][:, :, None], axis=1)
            dq_acc[ci] = dq_acc[ci] + t

        if has_pos:
            # table grads for this j-slice, accumulated over the grid
            dqe = jnp.stack([jnp.sum(d_qr * qb[ci], axis=2)
                             for ci in range(c)])
            dke = jnp.stack([jnp.sum(d_kr * k[ci][j0:j0 + _JB, :][None],
                                     axis=2) for ci in range(c)])
            dve = jnp.stack([jnp.sum(sim * dsveb[p], axis=2)
                             for p in range(gp)])
            first = jnp.logical_and(gi == 0, si == 0)

            @pl.when(first)
            def _(dqe=dqe, dke=dke, dve=dve, j0=j0):
                dqemb_ref[:, :, j0:j0 + _JB] = dqe
                dkembt_ref[:, :, j0:j0 + _JB] = dke
                dvemb_ref[:, :, j0:j0 + _JB] = dve

            @pl.when(jnp.logical_not(first))
            def _(dqe=dqe, dke=dke, dve=dve, j0=j0):
                dqemb_ref[:, :, j0:j0 + _JB] = (
                    dqemb_ref[:, :, j0:j0 + _JB] + dqe)
                dkembt_ref[:, :, j0:j0 + _JB] = (
                    dkembt_ref[:, :, j0:j0 + _JB] + dke)
                dvemb_ref[:, :, j0:j0 + _JB] = (
                    dvemb_ref[:, :, j0:j0 + _JB] + dve)

    dqkv_ref[0, :c] = jnp.stack(dq_acc).astype(dqkv_ref.dtype)

    if has_pos:
        daff = jnp.stack([d_qk_sum, db, d_qr_sum, db, d_kr_sum, db,
                          jnp.zeros((), _F32), jnp.zeros((), _F32)])
    else:
        z = jnp.zeros((), _F32)
        daff = jnp.stack([d_qk_sum, db, z, z, z, z, z, z])

    @pl.when(jnp.logical_and(si == 0, gi == 0))
    def _():
        daff_ref[...] = jnp.zeros_like(daff_ref)

    daff_ref[pl.ds(gi, 1), :] = daff_ref[pl.ds(gi, 1), :] + daff[None]


def _flash_pick_sblock(S: int, c: int, gp: int, L: int,
                       jb: int = _JB_FWD, bwd: bool = False) -> int:
    """Lane block for the streamed kernels: live tiles are (L, jb, Sb)."""
    arrays = 2 * (2 * c + 3 * gp) * L + 4 * L  # + m, l, sv, sve rows
    if bwd:
        arrays = 2 * (4 * c + 6 * gp) * L + 8 * L
    tiles = (10 if bwd else 6) * L * jb + 4 * L
    per_lane = 4 * (arrays + tiles)
    budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET
    cap = min(512, budget // per_lane, S)
    for Sb in range((cap // 128) * 128, 0, -128):
        if S % Sb == 0:
            return Sb
    return S if S * per_lane <= budget else 0


def _flash_pick_bwd(S: int, c: int, gp: int, L: int):
    """(Sb, jb) for the backward: largest key block whose lane block fits."""
    for jb in (8, 4):
        if L % jb:
            continue
        Sb = _flash_pick_sblock(S, c, gp, L, jb=jb, bwd=True)
        if Sb >= 128:
            return Sb, jb
    return 0, 0


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_lanes_core(qkv, qemb, kemb_t, vemb, sim_affine):
    """Streamed-key lanes attention for spans 32..64; same contract as
    ``lanes_attn_core`` (fused qkv in, fused dqkv out)."""
    sv, sve, _, _ = _flash_fwd(qkv, qemb, kemb_t, vemb, sim_affine)
    return sv, sve


def _flash_fwd(qkv, qemb, kemb_t, vemb, sim_affine, interpret=None):
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb = _flash_pick_sblock(S, c, gp, L, jb=_JB_FWD, bwd=False)
    assert Sb >= 1, (S, g, c, gp, L)
    grid = (g, S // Sb)
    qkv_spec = pl.BlockSpec((1, 2 * gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, L, Sb), lambda gi, si: (gi, 0, si),
                            memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if not has_pos:
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
    cemb_spec = pl.BlockSpec((ce, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((pe, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                            memory_space=pltpu.VMEM)
    sv, sve, m, l = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, has_pos=has_pos, L=L),
        grid=grid,
        in_specs=[qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec],
        out_specs=(v_spec, v_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((g, L, S), _F32),
            jax.ShapeDtypeStruct((g, L, S), _F32),
        ),
        interpret=interpret,
    )(qkv, qemb, kemb_t, vemb, sim_affine)
    if not has_pos:
        sve = jnp.zeros_like(sv)
    return sv, sve, m, l


def _flash_fwd_rule(qkv, qemb, kemb_t, vemb, sim_affine):
    sv, sve, m, l = _flash_fwd(qkv, qemb, kemb_t, vemb, sim_affine)
    return (sv, sve), (qkv, qemb, kemb_t, vemb, sim_affine, m, l, sv, sve)


def _flash_bwd_rule(residuals, grads, interpret=None):
    qkv, qemb, kemb_t, vemb, sim_affine, m, l, sv, sve = residuals
    dsv, dsve = grads
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb, jb_size = _flash_pick_bwd(S, c, gp, L)
    assert Sb >= 1, (S, g, c, gp, L)
    grid = (g, S // Sb)
    qkv_spec = pl.BlockSpec((1, 2 * gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si: (gi, 0, 0, si),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, L, Sb), lambda gi, si: (gi, 0, si),
                            memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if not has_pos:
        qemb = jnp.zeros((1, L, L), _F32)
        kemb_t = jnp.zeros((1, L, L), _F32)
        vemb = jnp.zeros((1, L, L), _F32)
    cemb_spec = pl.BlockSpec((ce, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    pemb_spec = pl.BlockSpec((pe, L, L), lambda gi, si: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si: (0, 0),
                            memory_space=pltpu.VMEM)

    dqkv, dqe, dke_t, dve, daff = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, has_pos=has_pos, L=L,
                          jb_size=jb_size),
        grid=grid,
        in_specs=[qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                  aff_spec, row_spec, row_spec, v_spec, v_spec,
                  v_spec, v_spec],
        out_specs=(qkv_spec, cemb_spec, cemb_spec, pemb_spec,
                   aff_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, 2 * gp, L, S), qkv.dtype),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((ce, L, L), _F32),
            jax.ShapeDtypeStruct((pe, L, L), _F32),
            jax.ShapeDtypeStruct((g, 8), _F32),
        ),
        interpret=interpret,
    )(qkv, qemb, kemb_t, vemb, sim_affine, m, l, sv, sve, dsv, dsve)
    if not has_pos:
        zc = jnp.zeros((0, L, L), _F32)
        return dqkv, zc, zc, jnp.zeros((0, L, L), _F32), daff
    return dqkv, dqe, dke_t, dve, daff


flash_lanes_core.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_supported(span: int, groups: int, gp: int, stripes: int) -> bool:
    """Streamed-lanes admission: mid spans, Jb-divisible, enough stripes.

    The ``gp * span <= 256`` gate is EMPIRICAL: at (gp=8, span=64) the
    forward's real scoped-VMEM allocation measures 26.96 MB against the
    16 MB limit (Mosaic stack OOM at compile time) while the analytic
    estimate is ~5.5 MB — the unrolled key loop's live accumulators scale
    with gp in a way the per-lane model underpredicts. Every live-model
    flash geometry satisfies the gate ((gp=4, span=64) and (gp=8,
    span=32) both compile and run); beyond it the op falls back to the
    stripe-block kernel (ops/pallas_axial_train.py), which handles wide
    gp at mid spans fine."""
    c = max(gp // 2, 1)
    return (LANES_ENABLED and _kreg.family_enabled(_kreg.FAMILY_FLASH)
            and 16 < span <= 64 and span % _JB_FWD == 0
            and gp * span <= 256
            and stripes >= 128
            and _flash_pick_sblock(stripes, c, gp, span) >= 128
            and _flash_pick_bwd(stripes, c, gp, span)[0] >= 128)



# ---------------------------------------------------------------------------
# query+key streamed ("flash2") variant for LARGE spans (96..256)
# ---------------------------------------------------------------------------
#
# The 512px models' global branch runs axial attention at span 256
# (mix_512, reference model_codes.py:1894-2096), where neither the plain
# flash kernel (whole-span q/sv accumulators outgrow VMEM) nor the
# stripe-block kernel (its tiles scale with L^2) admits the shape — the
# train path fell back to XLA einsums, materializing the (S, g, L, L)
# logits chain in HBM (~0.5 GB per tensor at batch 2). This variant adds
# QUERY-axis streaming on top of the key streaming: the grid gains an
# innermost query-block dimension, each program holds (c, Ib, Sb) of q
# plus the whole-key k/v rows, and runs the same online softmax. The
# backward accumulates dk/dv in grid-resident blocks across the query
# sweep (their output index maps are constant in the innermost axis).

_IB_F2 = 32   # query rows per program
_JB_F2 = 16   # fwd key block; bwd uses 8

# The key loop is a lax.fori_loop, NOT a Python unroll: at L/Jb = 16-32
# iterations Mosaic's scoped stack keeps every unrolled iteration's tiles
# live simultaneously (measured 24.7 MB at span 128 — compile-time OOM),
# while a fori body keeps exactly one. The price is traced key offsets,
# and Mosaic forbids dynamic LANE-axis slices — so the (·, i, j) tables,
# whose key axis j is minor, are pre-blocked by the XLA glue into
# (L//Ib, ch, L_j, Ib) arrays (j on sublanes, the Ib query rows on lanes)
# and transposed back per (Ib, Jb) tile inside the kernel.


def _tbl_blk(ref, ci, j0, jb):
    """(Ib, Jb) tile of a pre-blocked table ref (1, ch, L_j, Ib).

    All-slice indexing only: mixing integer indices with pl.ds on a ref
    routes through the (unsupported >2D) gather lowering."""
    blk = ref[pl.ds(0, 1), pl.ds(ci, 1), pl.ds(j0, jb), :]
    return jnp.swapaxes(blk[0, 0], 0, 1)


def _flash2_fwd_kernel(q_ref, k_ref, v_ref, qembb_ref, kembtb_ref, vembb_ref,
                       aff_ref, sv_ref, sve_ref, m_ref, l_ref,
                       *, has_pos: bool, L: int, jb_size: int):
    _JB = jb_size
    aff = aff_ref[pl.ds(pl.program_id(0), 1), :][0]
    q = q_ref[...][0].astype(_F32)         # (c, Ib, Sb); exact bf16 upcast
    c, Ib, Sb = q.shape
    gp = v_ref.shape[1]

    def body(jb, carry):
        m, l, sv_acc, sve_acc = carry
        j0 = jb * _JB
        kblk = k_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :][0].astype(_F32)
        lg = q[0][:, None, :] * kblk[0][None]
        for ci in range(1, c):
            lg += q[ci][:, None, :] * kblk[ci][None]
        lg = lg * aff[0] + aff[1]
        if has_pos:
            qr = q[0][:, None, :] * _tbl_blk(qembb_ref, 0, j0, _JB)[:, :, None]
            kr = kblk[0][None] * _tbl_blk(kembtb_ref, 0, j0, _JB)[:, :, None]
            for ci in range(1, c):
                qr += (q[ci][:, None, :]
                       * _tbl_blk(qembb_ref, ci, j0, _JB)[:, :, None])
                kr += (kblk[ci][None]
                       * _tbl_blk(kembtb_ref, ci, j0, _JB)[:, :, None])
            lg = lg + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        m_new = jnp.maximum(m, jnp.max(lg, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)              # (Ib, 1, Sb)
        alpha_p = alpha[:, 0, :][None]          # (1, Ib, Sb); two-step to
        # stay on the slice path (None+int mixed indexing lowers as gather)
        e = jnp.exp(lg - m_new)                 # (Ib, _JB, Sb)
        l = l * alpha + jnp.sum(e, axis=1, keepdims=True)
        vblk = v_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :][0].astype(_F32)
        sv_new = jnp.stack(
            [jnp.sum(e * vblk[p][None], axis=1) for p in range(gp)])
        sv_acc = sv_acc * alpha_p + sv_new
        if has_pos:
            sve_new = jnp.stack(
                [jnp.sum(e * _tbl_blk(vembb_ref, p, j0, _JB)[:, :, None],
                         axis=1) for p in range(gp)])
            sve_acc = sve_acc * alpha_p + sve_new
        return m_new, l, sv_acc, sve_acc

    init = (jnp.full((Ib, 1, Sb), -1e30, _F32),
            jnp.zeros((Ib, 1, Sb), _F32),
            jnp.zeros((gp, Ib, Sb), _F32),
            jnp.zeros((gp, Ib, Sb), _F32))
    m, l, sv_acc, sve_acc = jax.lax.fori_loop(0, L // _JB, body, init)
    inv_l = (1.0 / l)[:, 0, :][None]
    sv_ref[0] = sv_acc * inv_l
    if has_pos:
        sve_ref[0] = sve_acc * inv_l
    m_ref[0] = m[:, 0, :]
    l_ref[0] = l[:, 0, :]


def _flash2_bwd_kernel(q_ref, k_ref, v_ref, qembb_ref, kembtb_ref, vembb_ref,
                       aff_ref, m_ref, l_ref, sv_ref, sve_ref,
                       dsv_ref, dsve_ref,
                       dq_ref, dk_ref, dv_ref,
                       dqep_ref, dkep_ref, dvep_ref, daff_ref,
                       *, has_pos: bool, L: int, jb_size: int):
    """Backward with query streaming: grid = (g, S // Sb, L // Ib).

    The innermost grid axis sweeps query blocks, so the dk/dv outputs
    (index maps constant in it) stay VMEM-resident and accumulate across
    the sweep. Table gradients are emitted as per-program PARTIAL blocks
    (summed over the program's Sb lanes, single visit each) that the XLA
    glue reduces over (g, stripe-blocks) — in-kernel accumulation would
    need either cross-program revisiting (unspecified persistence) or
    dynamic lane-axis stores (unsupported)."""
    _JB = jb_size
    gi = pl.program_id(0)
    ib = pl.program_id(2)
    aff = aff_ref[pl.ds(gi, 1), :][0]
    q = q_ref[...][0].astype(_F32)          # (c, Ib, Sb)
    c, Ib, Sb = q.shape
    gp = v_ref.shape[1]
    m = m_ref[...][0][:, None, :]
    inv_l = (1.0 / l_ref[...][0])[:, None, :]
    dsv, dsve = dsv_ref[...][0], dsve_ref[...][0]
    sv, sve = sv_ref[...][0], sve_ref[...][0]

    delta = jnp.sum(dsv * sv, axis=0)
    if has_pos:
        delta = delta + jnp.sum(dsve * sve, axis=0)
    delta = delta[:, None, :]               # (Ib, 1, Sb)

    def body(jb, carry):
        dq_acc, d_qk_sum, d_qr_sum, d_kr_sum, db = carry
        dq_acc = list(dq_acc)  # per-channel tuple: .at[ci].add on a stacked
        # array would lower as (unsupported) scatter-add
        j0 = jb * _JB
        kblk = k_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :][0].astype(_F32)
        vblk = v_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :][0].astype(_F32)
        qk = q[0][:, None, :] * kblk[0][None]
        for ci in range(1, c):
            qk += q[ci][:, None, :] * kblk[ci][None]
        lg = qk * aff[0] + aff[1]
        if has_pos:
            qtb = [_tbl_blk(qembb_ref, ci, j0, _JB) for ci in range(c)]
            ktb = [_tbl_blk(kembtb_ref, ci, j0, _JB) for ci in range(c)]
            vtb = [_tbl_blk(vembb_ref, p, j0, _JB) for p in range(gp)]
            qr = q[0][:, None, :] * qtb[0][:, :, None]
            kr = kblk[0][None] * ktb[0][:, :, None]
            for ci in range(1, c):
                qr += q[ci][:, None, :] * qtb[ci][:, :, None]
                kr += kblk[ci][None] * ktb[ci][:, :, None]
            lg = lg + (qr * aff[2] + aff[3]) + (kr * aff[4] + aff[5])
        sim = jnp.exp(lg - m) * inv_l       # (Ib, _JB, Sb)

        dsim = dsv[0][:, None, :] * vblk[0][None]
        for p in range(1, gp):
            dsim += dsv[p][:, None, :] * vblk[p][None]
        if has_pos:
            for p in range(gp):
                dsim += dsve[p][:, None, :] * vtb[p][:, :, None]

        dlog = sim * (dsim - delta)
        db += jnp.sum(dlog)
        d_qk_sum += jnp.sum(dlog * qk)
        d_qk = dlog * aff[0]
        if has_pos:
            d_qr_sum += jnp.sum(dlog * qr)
            d_kr_sum += jnp.sum(dlog * kr)
            d_qr = dlog * aff[2]
            d_kr = dlog * aff[4]

        # dv/dk rows for this key block: initialize on the first query
        # block, accumulate after
        dv_new = jnp.stack(
            [jnp.sum(dsv[p][:, None, :] * sim, axis=0) for p in range(gp)])
        dk_rows = []
        for ci in range(c):
            t = jnp.sum(d_qk * q[ci][:, None, :], axis=0)
            if has_pos:
                t += jnp.sum(d_kr * ktb[ci][:, :, None], axis=0)
            dk_rows.append(t)
            tq = jnp.sum(d_qk * kblk[ci][None], axis=1)
            if has_pos:
                tq += jnp.sum(d_qr * qtb[ci][:, :, None], axis=1)
            dq_acc[ci] = dq_acc[ci] + tq
        dk_new = jnp.stack(dk_rows)

        @pl.when(ib == 0)
        def _():
            dk_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] = dk_new[None]
            dv_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] = dv_new[None]

        @pl.when(ib != 0)
        def _():
            dk_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] = (
                dk_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] + dk_new[None])
            dv_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] = (
                dv_ref[pl.ds(0, 1), :, pl.ds(j0, _JB), :] + dv_new[None])

        if has_pos:
            # partial table grads for this (program, key block), j on
            # sublanes to match the pre-blocked layout
            dqe = jnp.stack([jnp.swapaxes(
                jnp.sum(d_qr * q[ci][:, None, :], axis=2), 0, 1)
                for ci in range(c)])            # (c, _JB, Ib)
            dke = jnp.stack([jnp.swapaxes(
                jnp.sum(d_kr * kblk[ci][None], axis=2), 0, 1)
                for ci in range(c)])
            dve = jnp.stack([jnp.swapaxes(
                jnp.sum(sim * dsve[p][:, None, :], axis=2), 0, 1)
                for p in range(gp)])
            d3 = (pl.ds(0, 1),) * 3
            dqep_ref[d3 + (slice(None), pl.ds(j0, _JB), slice(None))] = \
                dqe[None, None, None]
            dkep_ref[d3 + (slice(None), pl.ds(j0, _JB), slice(None))] = \
                dke[None, None, None]
            dvep_ref[d3 + (slice(None), pl.ds(j0, _JB), slice(None))] = \
                dve[None, None, None]
        return tuple(dq_acc), d_qk_sum, d_qr_sum, d_kr_sum, db

    z = jnp.zeros((), _F32)
    init = (tuple(jnp.zeros((Ib, Sb), _F32) for _ in range(c)), z, z, z, z)
    dq_acc, d_qk_sum, d_qr_sum, d_kr_sum, db = jax.lax.fori_loop(
        0, L // _JB, body, init)

    dq_ref[0] = jnp.stack(dq_acc).astype(dq_ref.dtype)

    if has_pos:
        daff = jnp.stack([d_qk_sum, db, d_qr_sum, db, d_kr_sum, db, z, z])
    else:
        daff = jnp.stack([d_qk_sum, db, z, z, z, z, z, z])

    first_all = jnp.logical_and(
        jnp.logical_and(pl.program_id(1) == 0, gi == 0), ib == 0)

    @pl.when(first_all)
    def _():
        daff_ref[...] = jnp.zeros_like(daff_ref)

    daff_ref[pl.ds(gi, 1), :] = daff_ref[pl.ds(gi, 1), :] + daff[None]


def _preblock_table(tbl, Ib):
    """(ch, L_i, L_j) -> (L_i // Ib, ch, L_j, Ib): query rows blocked onto
    the lane axis, key axis on sublanes (kernel-sliceable)."""
    ch, L, Lj = tbl.shape
    t = jnp.transpose(tbl, (1, 0, 2)).reshape(L // Ib, Ib, ch, Lj)
    return jnp.transpose(t, (0, 2, 3, 1))


# flash2 budget: the fori-loop kernels track the analytic estimate far
# more closely than the unrolled ones (one iteration's tiles live at a
# time), so they earn a larger budget. Empirical anchor: (span 256,
# gp=4, S 512) picks (Sb 128, Ib 16) under this budget and compiles/runs
# on-chip; under the shared 6M budget it was rejected outright.
_VMEM_BUDGET_F2 = 8 << 20


def _flash2_pick(S: int, c: int, gp: int, L: int, Ib: int,
                 jb: int, bwd: bool) -> int:
    """Lane block for the query-streamed kernels (0 if nothing fits).

    With the fori key loop only ONE iteration's tiles are live; the
    dominant residents are the whole-key k/v (+ dk/dv) rows. Sb is capped
    at 128 — every on-chip validation ran there."""
    if bwd:
        arrays = 2 * (2 * c + 2 * gp) * L + (2 * c + 2 * gp) * L \
            + 2 * (2 * c + 6 * gp + 4) * Ib
        tiles = 14 * Ib * jb
    else:
        arrays = 2 * (c + gp) * L + 2 * (c + 2 * gp + 2) * Ib
        tiles = 8 * Ib * jb
    # pre-blocked table blocks (+ partial-grad output blocks in bwd),
    # amortized over the 128-lane block
    table_rows = (2 + (2 if bwd else 0)) * (2 * c + gp) * L * Ib // 128
    per_lane = 4 * (arrays + tiles + table_rows)
    cap = min(128, _VMEM_BUDGET_F2 // max(per_lane, 1), S)
    for Sb in range((cap // 128) * 128, 0, -128):
        if S % Sb == 0:
            return Sb
    return 0


def _flash2_geom(S: int, c: int, gp: int, L: int):
    """(Sb, Ib, Jb_bwd) for the query-streamed kernels, or (0, 0, 0)."""
    for Ib in (_IB_F2, 16):
        if L % Ib or L % _JB_F2:
            return (0, 0, 0)
        Sb_f = _flash2_pick(S, c, gp, L, Ib, _JB_F2, bwd=False)
        if Sb_f < 128:
            continue
        for jb in (8,):
            Sb_b = _flash2_pick(S, c, gp, L, Ib, jb, bwd=True)
            if Sb_b >= 128:
                return (min(Sb_f, Sb_b), Ib, jb)
    return (0, 0, 0)


@jax.custom_vjp
def flash2_lanes_core(qkv, qemb, kemb_t, vemb, sim_affine):
    """Query+key streamed lanes attention for spans 96..256; same contract
    as ``lanes_attn_core`` (fused qkv in, fused dqkv out).

    The fused operand is passed to the kernel THREE times with different
    BlockSpec views (q query-blocked rows [0:c]; k whole-key rows [c:gp];
    v whole-key rows [gp:2gp]) — aliased reads of one buffer, so the XLA
    boundary still materializes no slices."""
    sv, sve, _, _ = _flash2_fwd(qkv, qemb, kemb_t, vemb, sim_affine)
    return sv, sve


def _flash2_fwd(qkv, qemb, kemb_t, vemb, sim_affine, interpret=None):
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb, Ib, _ = _flash2_geom(S, c, gp, L)
    assert Sb >= 1, (S, g, c, gp, L)
    grid = (g, S // Sb, L // Ib)
    # three views of the fused qkv: axis-1 block units c (q, k) / gp (v),
    # block index 0 -> q rows, 1 (in c-units: rows [c:2c]=k; in gp-units:
    # rows [gp:2gp]=v)
    q_spec = pl.BlockSpec((1, c, Ib, Sb), lambda gi, si, ib: (gi, 0, ib, si),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, c, L, Sb), lambda gi, si, ib: (gi, 1, 0, si),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si, ib: (gi, 1, 0, si),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, gp, Ib, Sb), lambda gi, si, ib: (gi, 0, ib, si),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, Ib, Sb), lambda gi, si, ib: (gi, ib, si),
                            memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if has_pos:
        qembb = _preblock_table(qemb, Ib)
        kembtb = _preblock_table(kemb_t, Ib)
        vembb = _preblock_table(vemb, Ib)
    else:
        qembb = jnp.zeros((L // Ib, 1, L, Ib), _F32)
        kembtb = qembb
        vembb = qembb
    ctbl_spec = pl.BlockSpec((1, ce, L, Ib), lambda gi, si, ib: (ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ptbl_spec = pl.BlockSpec((1, pe, L, Ib), lambda gi, si, ib: (ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si, ib: (0, 0),
                            memory_space=pltpu.VMEM)
    sv, sve, m, l = pl.pallas_call(
        functools.partial(_flash2_fwd_kernel, has_pos=has_pos, L=L,
                          jb_size=_JB_F2),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, ctbl_spec, ctbl_spec, ptbl_spec,
                  aff_spec],
        out_specs=(o_spec, o_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((g, L, S), _F32),
            jax.ShapeDtypeStruct((g, L, S), _F32),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, qembb, kembtb, vembb, sim_affine)
    if not has_pos:
        sve = jnp.zeros_like(sv)
    return sv, sve, m, l


def _flash2_fwd_rule(qkv, qemb, kemb_t, vemb, sim_affine):
    sv, sve, m, l = _flash2_fwd(qkv, qemb, kemb_t, vemb, sim_affine)
    return (sv, sve), (qkv, qemb, kemb_t, vemb, sim_affine, m, l, sv, sve)


def _flash2_bwd_rule(residuals, grads, interpret=None):
    qkv, qemb, kemb_t, vemb, sim_affine, m, l, sv, sve = residuals
    dsv, dsve = grads
    interpret = _interpret_default(interpret)
    g, r2, L, S = qkv.shape
    gp = r2 // 2
    c = gp // 2
    has_pos = qemb.shape[0] > 0
    Sb, Ib, jb_size = _flash2_geom(S, c, gp, L)
    assert Sb >= 1, (S, g, c, gp, L)
    nS, nI = S // Sb, L // Ib
    grid = (g, nS, nI)

    # the same three aliased views of the fused qkv as the forward; the
    # dq/dk/dv OUTPUTS stay separate buffers (one buffer cannot back
    # multiple out_specs) and are concatenated into dqkv below — flash2
    # only runs at the 512px geometries, where the kernels dwarf the
    # one concat
    q_spec = pl.BlockSpec((1, c, Ib, Sb), lambda gi, si, ib: (gi, 0, ib, si),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, c, L, Sb), lambda gi, si, ib: (gi, 1, 0, si),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si, ib: (gi, 1, 0, si),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, gp, Ib, Sb), lambda gi, si, ib: (gi, 0, ib, si),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, Ib, Sb), lambda gi, si, ib: (gi, ib, si),
                            memory_space=pltpu.VMEM)
    ce = max(c, 1) if has_pos else 1
    pe = max(gp, 1) if has_pos else 1
    if has_pos:
        qembb = _preblock_table(qemb, Ib)
        kembtb = _preblock_table(kemb_t, Ib)
        vembb = _preblock_table(vemb, Ib)
    else:
        qembb = jnp.zeros((nI, 1, L, Ib), _F32)
        kembtb = qembb
        vembb = qembb
    ctbl_spec = pl.BlockSpec((1, ce, L, Ib), lambda gi, si, ib: (ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    ptbl_spec = pl.BlockSpec((1, pe, L, Ib), lambda gi, si, ib: (ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    # per-program partial table grads (single visit per block; the XLA
    # reduction below sums the (g, stripe-block) axes)
    cpart_spec = pl.BlockSpec((1, 1, 1, ce, L, Ib),
                              lambda gi, si, ib: (gi, si, ib, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    ppart_spec = pl.BlockSpec((1, 1, 1, pe, L, Ib),
                              lambda gi, si, ib: (gi, si, ib, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((g, 8), lambda gi, si, ib: (0, 0),
                            memory_space=pltpu.VMEM)
    # dedicated OUT specs: the dq/dk/dv buffers have a single axis-1 block,
    # so their index maps are 0 there (the input views above point at
    # block 1 of the fused qkv and must not be reused here)
    dq_spec = pl.BlockSpec((1, c, Ib, Sb), lambda gi, si, ib: (gi, 0, ib, si),
                           memory_space=pltpu.VMEM)
    dk_spec = pl.BlockSpec((1, c, L, Sb), lambda gi, si, ib: (gi, 0, 0, si),
                           memory_space=pltpu.VMEM)
    dv_spec = pl.BlockSpec((1, gp, L, Sb), lambda gi, si, ib: (gi, 0, 0, si),
                           memory_space=pltpu.VMEM)

    dq, dk, dv, dqep, dkep, dvep, daff = pl.pallas_call(
        functools.partial(_flash2_bwd_kernel, has_pos=has_pos, L=L,
                          jb_size=jb_size),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec, ctbl_spec, ctbl_spec, ptbl_spec,
                  aff_spec, row_spec, row_spec, o_spec, o_spec,
                  o_spec, o_spec],
        out_specs=(dq_spec, dk_spec, dv_spec, cpart_spec, cpart_spec,
                   ppart_spec, aff_spec),
        out_shape=(
            # dq is written once per program -> input dtype directly; dk/dv
            # accumulate through their refs across the query-block sweep, so
            # they stay f32 in-kernel and cast after
            jax.ShapeDtypeStruct((g, c, L, S), qkv.dtype),
            jax.ShapeDtypeStruct((g, c, L, S), _F32),
            jax.ShapeDtypeStruct((g, gp, L, S), _F32),
            jax.ShapeDtypeStruct((g, nS, nI, ce, L, Ib), _F32),
            jax.ShapeDtypeStruct((g, nS, nI, ce, L, Ib), _F32),
            jax.ShapeDtypeStruct((g, nS, nI, pe, L, Ib), _F32),
            jax.ShapeDtypeStruct((g, 8), _F32),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, qembb, kembtb, vembb, sim_affine, m, l, sv, sve,
      dsv, dsve)
    dqkv = jnp.concatenate(
        [dq.astype(qkv.dtype), dk.astype(qkv.dtype), dv.astype(qkv.dtype)],
        axis=1)

    if not has_pos:
        zc = jnp.zeros((0, L, L), _F32)
        return dqkv, zc, zc, jnp.zeros((0, L, L), _F32), daff

    def unblock(part, ch):
        # (g, nS, nI, ch, L_j, Ib) -> (ch, L_i, L_j)
        t = jnp.sum(part, axis=(0, 1))               # (nI, ch, L_j, Ib)
        t = jnp.transpose(t, (1, 0, 3, 2))           # (ch, nI, Ib, L_j)
        return t.reshape(ch, L, L)

    return (dqkv, unblock(dqep, ce), unblock(dkep, ce),
            unblock(dvep, pe), daff)


flash2_lanes_core.defvjp(_flash2_fwd_rule, _flash2_bwd_rule)


def flash2_supported(span: int, groups: int, gp: int, stripes: int) -> bool:
    """Query-streamed admission: the large spans the plain flash kernel
    cannot hold (96..256, plus wide-gp mid spans its empirical gp*span
    gate rejects)."""
    c = max(gp // 2, 1)
    return (LANES_ENABLED and _kreg.family_enabled(_kreg.FAMILY_FLASH2)
            and 64 < span <= 256
            and span % _JB_F2 == 0
            and stripes >= 128
            and _flash2_geom(stripes, c, gp, span)[0] >= 128)

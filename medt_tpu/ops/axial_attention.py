"""Axial attention — the core op family of the framework.

One parameterized module replaces the reference's three near-duplicate classes
(``AxialAttention`` reference axialnet.py:19-97, ``AxialAttention_dynamic``
:99-193, ``AxialAttention_wopos`` :195-258) plus the experimental zoo variants
(``AxialAttention_gated_sig`` / ``AxialAttention_gated_data``,
reference lib/models/model_codes.py:215-444). Semantics implemented:

  1. qkv 1x1 projection (no bias) + BN over the 2*out_planes channels
     (stats couple across batch AND the orthogonal spatial axis, matching the
     reference's BatchNorm1d over the flattened N*W stripe batch).
  2. split per group: q (gp/2), k (gp/2), v (gp) channels.
  3. learned relative position table (2*gp, 2*span-1) gathered into
     per-(query,key) embeddings; split into q/k/v embeddings.
  4. similarity logits qk, qr, kr; optional scalar gates on qr/kr;
     stacked BN over the (3, groups) feature layout; summed; softmax over keys.
  5. outputs sv (attention @ v) and sve (attention @ v-embedding); optional
     gates; BN over the (groups, gp, 2) feature layout; branches summed.
  6. optional 2x2 average-pool downsample when stride > 1.

TPU-first design notes: the op works directly on NHWC tensors with einsums
that lower to batched MXU matmuls — no permute/view copies, no Python loops.
In eval mode, when ``use_fused`` is set, the whole post-qkv attention core
runs as a single fused Pallas kernel (see ops/pallas_axial.py) with the BN
affines and gates folded in; the jnp path remains the train-mode and
reference-golden path. The attention BNs are module-level parameters (not
submodules) precisely so the fused path can fold them.

In the gated variants the reference creates its gates with
``requires_grad=False`` — i.e. they are *frozen constants* 0.1/0.1/0.1/1.0 in
the released code (reference axialnet.py:124-127). We default to the same
frozen behavior and expose ``trainable_gates`` for the trained-gate setting
described in the paper.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .initializers import normal_by_fan
from .lanes_layout import DenseLanes, avg_pool_2x_lanes
from .norms import batch_norm_eval, batch_norm_train
from .pooling import avg_pool_2x

# attention math modes
MODE_FULL = "full"        # reference AxialAttention: positions, no gates
MODE_GATED = "gated"      # reference AxialAttention_dynamic: frozen scalar gates
MODE_WOPOS = "wopos"      # reference AxialAttention_wopos: qk only, no positions
MODE_GATED_SIG = "gated_sig"    # zoo: sigmoid-squashed gates, f_sv=5.0
MODE_GATED_DATA = "gated_data"  # zoo: per-sample gates from a GAP->MLP head

_MODES = (MODE_FULL, MODE_GATED, MODE_WOPOS, MODE_GATED_SIG, MODE_GATED_DATA)


def relative_logit_index(span: int) -> np.ndarray:
    """(span, span) gather index into a (2*span-1)-wide relative table.

    ``idx[i, j] = i - j + span - 1`` where i is the query position and j the
    key position — matches the reference's precomputed ``flatten_index``
    (reference axialnet.py:43-46).
    """
    r = np.arange(span)
    return r[:, None] - r[None, :] + span - 1


class AxialAttention(nn.Module):
    """Multi-head self-attention along one spatial axis of an NHWC tensor.

    Attributes:
      axis: "h" attends along image height (stripes batched over width);
        "w" attends along width. Mirrors the reference's ``width`` flag.
      span: attention length == spatial extent of the attended axis
        (the reference's ``kernel_size``).
      stride: if >1, average-pool the (2D) output by this factor afterwards.
      mode: one of full/gated/wopos/gated_sig/gated_data (see module docstring).
      gate_init: (f_qr, f_kr, f_sve, f_sv) initial values for gated modes.
      trainable_gates: train the gates (the released reference freezes them).
      use_fused: run the fused Pallas kernel in eval mode (full/gated/wopos
        with frozen gates).
      lanes_io: input/output are lanes activations (C, L, S) already
        oriented so axis 1 is the attended axis and S = n*B flattened with
        the batch major (see ops/lanes_layout.py) — physically the kernels'
        own layout, entered/left with zero relayout copies. The caller
        (AxialBlock in lanes-resident mode) owns the orientation and passes
        the static batch via ``lanes_batch``; ``axis`` is then only a name.
        Param tree is identical either way.
      dtype: compute dtype for the einsums (params and BN stats stay fp32).
    """

    in_planes: int
    out_planes: int
    span: int
    groups: int = 8
    stride: int = 1
    axis: str = "h"
    mode: str = MODE_GATED
    gate_init: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 1.0)
    trainable_gates: bool = False
    use_fused: bool = False
    lanes_io: bool = False
    lanes_batch: int = 0      # static batch n of a lanes_io caller
    dtype: Optional[jnp.dtype] = None

    # ---- parameter/state helpers -----------------------------------------

    def _bn_vars(self, name: str, shape):
        scale = self.param(f"{name}_scale", nn.initializers.ones, shape,
                           jnp.float32)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, shape,
                          jnp.float32)
        mean = self.variable("batch_stats", f"{name}_mean",
                             lambda: jnp.zeros(shape, jnp.float32))
        var = self.variable("batch_stats", f"{name}_var",
                            lambda: jnp.ones(shape, jnp.float32))
        return scale, bias, mean, var

    def _bn(self, name: str, shape, x, feature_axes, train: bool,
            momentum: float = 0.1):
        scale, bias, mean, var = self._bn_vars(name, shape)
        if train:
            y, m, v = batch_norm_train(x, scale, bias, feature_axes)
            if not self.is_initializing():
                mean.value = (1 - momentum) * mean.value + momentum * m
                var.value = (1 - momentum) * var.value + momentum * v
            return y
        return batch_norm_eval(x, scale, bias, mean.value, var.value,
                               feature_axes)

    def _gates(self, x_pooled=None):
        """Return (f_qr, f_kr, f_sve, f_sv) according to the gating mode."""
        if self.mode in (MODE_FULL, MODE_WOPOS):
            return None
        init = self.gate_init
        if self.mode == MODE_GATED_DATA:
            # per-sample gates: GAP -> dense -> relu -> dense -> 4 sigmoids
            # (zoo variant, reference lib/models/model_codes.py:316-444)
            h = nn.Dense(max(self.in_planes // 4, 4), name="gate_fc1")(x_pooled)
            h = nn.relu(h)
            h = nn.Dense(4, name="gate_fc2")(h)
            g = nn.sigmoid(h)  # (N, 4)
            return tuple(g[:, i][:, None, None, None, None] for i in range(4))
        if self.trainable_gates:
            gates = [
                self.param(name, lambda k, v=v: jnp.asarray(v, jnp.float32))
                for name, v in zip(("f_qr", "f_kr", "f_sve", "f_sv"), init)
            ]
        else:
            # frozen constants, exactly as released (reference axialnet.py:124-127)
            gates = [jnp.asarray(v, jnp.float32) for v in init]
        if self.mode == MODE_GATED_SIG:
            # zoo variant squashes the learned gates through a sigmoid
            gates = [nn.sigmoid(g) for g in gates]
        return tuple(gates)

    # ---- forward -----------------------------------------------------------

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.mode in _MODES, self.mode
        assert self.out_planes % self.groups == 0
        gp = self.out_planes // self.groups
        assert gp % 2 == 0, "group_planes must be even to split q/k"
        g, span = self.groups, self.span
        dtype = self.dtype or x.dtype

        data_gates_in = None
        if self.lanes_io:
            # x: (C_in, L, S=n*B), pre-oriented — axis 1 IS the attended axis
            _, L, S_io = x.shape
            n = self.lanes_batch
            assert n > 0, "lanes_io needs lanes_batch"
            m = S_io // n
            if self.mode == MODE_GATED_DATA:
                data_gates_in = jnp.mean(
                    x.reshape(x.shape[0], L, n, m), axis=(1, 3)).T  # (n,C) GAP
            assert L == span, f"span {span} != attended extent {L}"
            qkv_l = DenseLanes(
                self.out_planes * 2,
                kernel_init=normal_by_fan(self.in_planes),
                dtype=dtype, name="qkv",
            )(x)
            qkv_l = self._bn("bn_qkv", (self.out_planes * 2,), qkv_l, 0, train)
            qkv = None  # NHWC view materialized lazily by fallback paths only
        else:
            if self.mode == MODE_GATED_DATA:
                data_gates_in = jnp.mean(x, axis=(1, 2))  # GAP over H, W

            if self.axis == "w":
                x = jnp.swapaxes(x, 1, 2)  # attend along axis 1 below
            n, L, m, _ = x.shape
            assert L == span, f"span {span} != attended extent {L}"

            # -- qkv projection (1x1 conv == dense over channels) + BN --------
            qkv = nn.Dense(
                self.out_planes * 2,
                use_bias=False,
                kernel_init=normal_by_fan(self.in_planes),
                dtype=dtype,
                param_dtype=jnp.float32,
                name="qkv",
            )(x)
            qkv = self._bn("bn_qkv", (self.out_planes * 2,), qkv, -1, train)
            qkv_l = None
            # NOTE: qkv stays 4D (n, L, m, 2*out_planes) here; each path does
            # its own (g, 2gp) split so the lanes glue can transpose straight
            # from the dense output without an intermediate 5D relayout copy

        # similarity/output BN parameter shapes per mode
        if self.mode == MODE_WOPOS:
            sim_shape, out_shape_ = (g,), (g, gp)
        else:
            sim_shape, out_shape_ = (3, g), (g, gp, 2)
        sim_scale, sim_bias, sim_mean, sim_var = self._bn_vars(
            "bn_similarity", sim_shape)
        out_scale, out_bias, out_mean, out_var = self._bn_vars(
            "bn_output", out_shape_)

        from .pallas_axial import fused_eval_supported

        # eval fusion admissibility is decided per-family below: the
        # whole-tile stripe kernel by fused_eval_supported's VMEM check,
        # the streaming lanes family (lanes/flash/flash2) by its own
        # admission — either one makes the eval path fused
        fused_eval_mode = (
            self.use_fused and not train and not self.is_initializing()
            and self.mode in (MODE_FULL, MODE_GATED, MODE_WOPOS)
        )
        # train-mode fusion additionally covers gated_sig (its sigmoid gates
        # are plain XLA glue); gated_data's per-sample gates cannot fold into
        # the shared embedding tables, so it stays on the XLA path
        fused_train_ok = (
            self.use_fused and train and not self.is_initializing()
            and self.mode in (MODE_FULL, MODE_GATED, MODE_WOPOS,
                              MODE_GATED_SIG)
            and span <= 256  # 129..256 admitted per-shape by flash2 below
        )
        from .pallas_axial_lanes import (flash2_supported, flash_supported,
                                         lanes_supported)
        from ..parallel.kernel_sharding import kernel_mesh_factors

        # under an active mesh the kernels run as shard_map islands over
        # (g -> model, S -> data x seq); admission must see the PER-DEVICE
        # geometry (parallel/kernel_sharding.py)
        mesh_, ds_, tp_ = kernel_mesh_factors()
        stripes_ = n * m
        if mesh_ is not None and (stripes_ % ds_ or g % tp_):
            mesh_, ds_, tp_ = None, 1, 1
        s_adm, g_adm = stripes_ // ds_, g // tp_
        # eval prefers the lanes kernels wherever they are admitted (small
        # spans: plain lanes; mid spans: key-streamed flash variant; long
        # spans: query+key-streamed flash2 — the span-256 global branch of
        # the 512px models CANNOT run the whole-tile stripe kernel, whose
        # (L, L) similarity tiles blow scoped VMEM at L=256 even at stripe
        # block 1; streaming is the only VMEM-feasible fused eval there)
        lanes_eval = ((span <= 16 and lanes_supported(span, g_adm, gp, s_adm))
                      or flash_supported(span, g_adm, gp, s_adm)
                      or flash2_supported(span, g_adm, gp, s_adm))
        fused_ok = fused_eval_mode and (
            lanes_eval or fused_eval_supported(span, gp))
        if fused_ok and not lanes_eval:
            from .pallas_axial import axial_attention_fused, fused_eval_attention
            from ..parallel.kernel_sharding import shard_eval_core
            from . import kernel_registry as _kreg
            _kreg.record(_kreg.FAMILY_EVAL, span=span, g=g_adm, gp=gp,
                         S=s_adm, train=False,
                         has_pos=self.mode != MODE_WOPOS,
                         sharded=mesh_ is not None)
            # under a mesh the kernel runs as a shard_map island over
            # (g -> model, S -> data x seq); the BN/gate folding glue stays
            # plain (GSPMD-partitioned) XLA around it
            eval_core = (None if mesh_ is None
                         else shard_eval_core(axial_attention_fused, mesh_))

            relative = None
            if self.mode != MODE_WOPOS:
                relative = self.param(
                    "relative", normal_by_fan(gp), (2 * gp, 2 * span - 1),
                    jnp.float32,
                )
            # read the live gate values (parameters when trainable_gates, else
            # the frozen constants) so the fused path tracks learned gates
            gate_vals = self._gates(None)
            if gate_vals is None:  # full / wopos: no gating
                gate_vals = self.gate_init
            if self.lanes_io:
                # (C, L, S) -> (S, L, C): the minor C split to (g, 2gp) is free
                stripes = jnp.transpose(qkv_l, (2, 1, 0)) \
                    .reshape(n * m, L, g, 2 * gp)
            else:
                stripes = qkv.reshape(n, L, m, g, 2 * gp) \
                    .transpose(0, 2, 1, 3, 4).reshape(n * m, L, g, 2 * gp)
            out = fused_eval_attention(
                stripes.astype(jnp.float32), relative,
                sim_scale, sim_bias, sim_mean.value, sim_var.value,
                out_scale, out_bias, out_mean.value, out_var.value,
                gp=gp, span=span, mode=self.mode, gates=gate_vals,
                core=eval_core,
            )  # (n*m, L, g, gp)
            if self.lanes_io:
                out = jnp.transpose(
                    out.reshape(n * m, L, self.out_planes), (2, 1, 0))
            else:
                out = out.reshape(n, m, L, self.out_planes) \
                    .transpose(0, 2, 1, 3)
            out = out.astype(dtype)
        elif fused_ok or fused_train_ok:
            # fused_ok + lanes_eval lands here with train=False
            out = self._fused_train_attention(
                qkv, g, gp, span,
                (sim_scale, sim_bias, sim_mean, sim_var),
                (out_scale, out_bias, out_mean, out_var),
                dtype, train=train, qkv_lanes=qkv_l,
            )
        else:
            if self.lanes_io:  # materialize the NHWC view for the jnp path
                qkv = jnp.transpose(
                    qkv_l.reshape(-1, L, n, m), (2, 1, 3, 0))
            out = self._jnp_attention(
                qkv, g, gp, span, train, data_gates_in,
                (sim_scale, sim_bias, sim_mean, sim_var),
                (out_scale, out_bias, out_mean, out_var),
                dtype,
            )
            if self.lanes_io:
                out = jnp.transpose(out, (3, 1, 0, 2)) \
                    .reshape(self.out_planes, L, n * m)

        if self.lanes_io:
            if self.stride > 1:
                # NOTE: the lanes pool RE-ORIENTS: (C, A/s, n, B/s) comes
                # back as (C, B/s, n, A/s) — the orientation swap a strided
                # block needs anyway, fused into the pool so the lane axis
                # is never split (see avg_pool_2x_lanes)
                out = avg_pool_2x_lanes(out, self.stride, n)
            return out
        if self.axis == "w":
            out = jnp.swapaxes(out, 1, 2)
        if self.stride > 1:
            out = avg_pool_2x(out, self.stride)
        return out

    def _bn_apply_split(self, bn_vars, x0, x1, feature_axes, train,
                        momentum=0.1):
        """BN over ``stack([x0, x1], -1)`` with stack-minor (…, 2) params,
        computed WITHOUT the stack: the stack axis is a feature axis, so
        the stacked BN is exactly two independent BNs (per-half params and
        stats) whose normalized halves the caller's reference math then
        sums (reference axialnet.py:178-180). Materializing the (…, 2)
        minor-axis stack costs XLA a half-empty lane tile plus relayout
        copies on every use — decomposing it is copy-free and bit-equal.
        Returns ``BN(x0) + BN(x1)``; reduction counts match the stacked
        form (the stack axis never reduces)."""
        scale, bias, mean, var = bn_vars
        if train:
            y0, m0, v0 = batch_norm_train(
                x0, scale[..., 0], bias[..., 0], feature_axes)
            y1, m1, v1 = batch_norm_train(
                x1, scale[..., 1], bias[..., 1], feature_axes)
            if not self.is_initializing():
                m = jnp.stack([m0, m1], axis=-1)
                v = jnp.stack([v0, v1], axis=-1)
                mean.value = (1 - momentum) * mean.value + momentum * m
                var.value = (1 - momentum) * var.value + momentum * v
            return y0 + y1
        y0 = batch_norm_eval(x0, scale[..., 0], bias[..., 0],
                             mean.value[..., 0], var.value[..., 0],
                             feature_axes)
        y1 = batch_norm_eval(x1, scale[..., 1], bias[..., 1],
                             mean.value[..., 1], var.value[..., 1],
                             feature_axes)
        return y0 + y1

    def _bn_apply(self, bn_vars, x, feature_axes, train, momentum=0.1):
        scale, bias, mean, var = bn_vars
        if train:
            y, m, v = batch_norm_train(x, scale, bias, feature_axes)
            if not self.is_initializing():
                mean.value = (1 - momentum) * mean.value + momentum * m
                var.value = (1 - momentum) * var.value + momentum * v
            return y
        return batch_norm_eval(x, scale, bias, mean.value, var.value,
                               feature_axes)

    def _fused_train_attention(self, qkv, g, gp, span, sim_bn, out_bn, dtype,
                               train: bool = True, qkv_lanes=None):
        """Fused attention around the custom-VJP cores.

        Train mode: the similarity BN's batch moments are computed by
        factorized XLA einsums (no (S, g, L, L) materialization) and folded
        into a constant affine for the kernel; gating, folding, and the
        output BN live in differentiable XLA so autodiff assembles the full
        BN-coupled backward around the custom-VJP kernel core.

        Eval mode (small spans route here for the stripe-lane kernel): the
        affine folds the *running* statistics instead and no stats update.
        """
        from .pallas_axial_lanes import (
            flash2_lanes_core,
            flash2_supported,
            flash_lanes_core,
            flash_supported,
            lanes_attn_core,
            lanes_supported,
        )
        from .pallas_axial_train import (
            FUSED_TRAIN_MIN_SPAN,
            attn_core_xla,
            fold_train_affine,
            fused_attn_core,
            fused_train_supported,
            logit_moments,
            logit_moments_lanes,
            pack_sim_affine,
            qk_moments,
            qk_moments_lanes,
        )

        from ..parallel.kernel_sharding import (
            kernel_mesh_factors,
            shard_lanes_core,
            shard_stripe_core,
        )

        if qkv_lanes is not None:  # lanes-resident caller: (O, L, S)
            L = qkv_lanes.shape[1]
            n = self.lanes_batch
            m = qkv_lanes.shape[2] // n
        else:
            n, L, m = qkv.shape[0], qkv.shape[1], qkv.shape[2]
        S, c = n * m, gp // 2

        # active mesh -> kernels run as shard_map islands; admission and the
        # registry see the per-device (g/tp, S/(dp*sp)) geometry
        mesh_, ds_, tp_ = kernel_mesh_factors()
        if mesh_ is not None and (S % ds_ or g % tp_):
            mesh_, ds_, tp_ = None, 1, 1
        S_adm, g_adm = S // ds_, g // tp_

        sim_scale, sim_bias, sim_mean, sim_var = sim_bn

        # four interchangeable cores over the shared factorized-moment glue:
        # stripe-LANE kernel for small spans (2..16: L on sublanes, the huge
        # stripe axis on lanes), its key-STREAMED "flash" variant for mid
        # spans (32..64: online softmax over key blocks — profiled ~3x
        # faster than the stripe-block kernel's tiny-MXU matmuls), the
        # stripe-block kernel as the mid/large-span fallback, and XLA
        # einsums when nothing admits the shape
        use_flash = flash_supported(span, g_adm, gp, S_adm)
        # query-streamed variant for the spans plain flash can't hold
        # (96..256 — the 512px models' global branch, which otherwise
        # falls back to XLA's HBM-resident logits chain)
        use_flash2 = (not use_flash and flash2_supported(span, g_adm, gp,
                                                         S_adm))
        use_kernel = (not use_flash and not use_flash2
                      and span >= FUSED_TRAIN_MIN_SPAN
                      and fused_train_supported(span, g_adm, gp))
        use_lanes = (not use_flash and not use_flash2 and not use_kernel
                     and lanes_supported(span, g_adm, gp, S_adm))
        lanes_out = use_flash or use_flash2 or use_lanes

        qkv_dtype = (qkv_lanes if qkv_lanes is not None else qkv).dtype
        from . import kernel_registry as _kreg
        _family = (_kreg.FAMILY_FLASH if use_flash
                   else _kreg.FAMILY_FLASH2 if use_flash2
                   else _kreg.FAMILY_STRIPE if use_kernel
                   else _kreg.FAMILY_LANES if use_lanes else None)
        if _family is not None:
            _kreg.record(_family, span=span, g=g_adm, gp=gp, S=S_adm,
                         train=train, has_pos=self.mode != MODE_WOPOS,
                         dtype=qkv_dtype, sharded=mesh_ is not None)

        if lanes_out:
            # single transpose straight from the 4D dense output into the
            # kernels' (g, ch, L, S) layout — no intermediate 5D relayout;
            # moments consume it via the *_lanes variants (the whole op —
            # qkv in, BN'd output out — then needs exactly two big copies
            # instead of the six of the stripe-major chain). bf16
            # activations stay bf16 through the transpose AND into the
            # kernels (halved copy + kernel-load HBM traffic); the kernels
            # upcast once in VMEM, which is exact
            src = qkv_lanes if qkv_lanes is not None else qkv
            kdt = (jnp.bfloat16 if src.dtype == jnp.bfloat16
                   else jnp.float32)
            if qkv_lanes is not None:
                # already features-major: the kernels' layout is a FREE view
                qkv_l4 = qkv_lanes.reshape(g, 2 * gp, L, S).astype(kdt)
            else:
                qkv_l4 = jnp.transpose(qkv, (3, 1, 0, 2)) \
                    .reshape(g, 2 * gp, L, S).astype(kdt)
            # the lanes-family cores and the moments kernel consume qkv_l4
            # WHOLE (fused-qkv contract) — q/k/v slices are never
            # materialized on this path; q/k exist only for the rare
            # XLA-moments fallback below
            q = k = v = None
        else:
            if qkv_lanes is not None:
                qkv_t = jnp.transpose(qkv_lanes, (2, 0, 1)) \
                    .reshape(S, g, 2 * gp, L).astype(jnp.float32)
            else:
                stripes = qkv.reshape(n, L, m, g, 2 * gp) \
                    .transpose(0, 2, 1, 3, 4).reshape(S, L, g, 2 * gp)
                qkv_t = jnp.transpose(stripes, (0, 2, 3, 1)) \
                    .astype(jnp.float32)
            q, k, v = qkv_t[:, :, :c], qkv_t[:, :, c:gp], qkv_t[:, :, gp:]

        sv_l = sve_l = None
        gates = None
        # one-pass Pallas moments kernel wherever the lanes layout is live
        # (ops/pallas_moments.py — replaces ~6 broadcast-multiply-reduce
        # fusions that each re-read q/k from HBM)
        from .pallas_moments import (
            logit_moments_lanes_fused,
            moments_kernel_supported,
            qk_moments_lanes_fused,
        )
        # under a mesh the moments kernel runs as its own island: each
        # device reduces its local stripe block to partial sums, combined
        # by a plain XLA sum outside (kernel_sharding.shard_moments_core) —
        # admission sees the PER-DEVICE stripe count
        fuse_moments = (lanes_out
                        and moments_kernel_supported(span, gp, S_adm))
        mom_core = None  # default in-island core (single device)
        if fuse_moments and mesh_ is not None:
            from .pallas_moments import moment_sums_core
            from ..parallel.kernel_sharding import shard_moments_core
            mom_core = shard_moments_core(moment_sums_core, mesh_)

        def _island(core, stripe=False):
            """Wrap a kernel core in its shard_map island when a mesh is
            active (no-op otherwise)."""
            if mesh_ is None:
                return core
            return (shard_stripe_core if stripe
                    else shard_lanes_core)(core, mesh_)
        if fuse_moments and train:
            _kreg.record(_kreg.FAMILY_MOMENTS, span=span, g=g_adm, gp=gp,
                         S=S_adm, train=True,
                         has_pos=self.mode != MODE_WOPOS,
                         dtype=qkv_dtype, sharded=mesh_ is not None)

        if self.mode == MODE_WOPOS:
            if train:
                if fuse_moments:
                    mean_b, var_b, count = qk_moments_lanes_fused(
                        qkv_l4, core=mom_core)
                elif lanes_out:
                    mean_b, var_b, count = qk_moments_lanes(
                        qkv_l4[:, :c], qkv_l4[:, c:gp])
                else:
                    mean_b, var_b, count = qk_moments(q, k)
                a, b = fold_train_affine(sim_scale, sim_bias, mean_b, var_b)
            else:
                a, b = fold_train_affine(sim_scale, sim_bias,
                                         sim_mean.value, sim_var.value)
            aff = pack_sim_affine(g, a, b, "wopos")
            if lanes_out:
                core_l = _island(flash_lanes_core if use_flash
                                 else flash2_lanes_core if use_flash2
                                 else lanes_attn_core)
                empty = jnp.zeros((0, L, L), jnp.float32)
                sv_l, _ = core_l(qkv_l4, empty, empty, empty, aff)
            elif use_kernel:
                zero_c = jnp.zeros((c, L, L), jnp.float32)
                zero_p = jnp.zeros((gp, L, L), jnp.float32)
                sv, sve = _island(fused_attn_core, stripe=True)(
                    q, k, v, zero_c, zero_c, zero_p, aff)
            else:
                sv, sve = attn_core_xla(q, k, v, None, None, None, aff,
                                        has_pos=False)
        else:
            relative = self.param(
                "relative", normal_by_fan(gp), (2 * gp, 2 * span - 1),
                jnp.float32,
            )
            idx = relative_logit_index(span)
            all_emb = relative[:, idx].astype(jnp.float32)  # (2gp, L, L)
            q_emb, k_emb, v_emb = all_emb[:c], all_emb[c:gp], all_emb[gp:]
            gates = self._gates(None)  # None for MODE_FULL
            if gates is not None:
                f_qr, f_kr, f_sve, f_sv = gates
                # gates apply BEFORE each BN (reference axialnet.py:163-176),
                # so folding them into the tables keeps the moments exact
                q_emb = q_emb * f_qr
                k_emb = k_emb * f_kr
                v_emb = v_emb * f_sve
            if train:
                if fuse_moments:
                    mean_b, var_b, count = logit_moments_lanes_fused(
                        qkv_l4, q_emb, k_emb, core=mom_core)
                elif lanes_out:
                    mean_b, var_b, count = logit_moments_lanes(
                        qkv_l4[:, :c], qkv_l4[:, c:gp], q_emb, k_emb)
                else:
                    mean_b, var_b, count = logit_moments(q, k, q_emb, k_emb)
                a, b = fold_train_affine(sim_scale, sim_bias, mean_b, var_b)
            else:
                a, b = fold_train_affine(sim_scale, sim_bias,
                                         sim_mean.value, sim_var.value)
            aff = pack_sim_affine(g, a, b, self.mode)
            if lanes_out:
                core_l = _island(flash_lanes_core if use_flash
                                 else flash2_lanes_core if use_flash2
                                 else lanes_attn_core)
                sv_l, sve_l = core_l(
                    qkv_l4, q_emb, jnp.swapaxes(k_emb, 1, 2), v_emb, aff)
            else:
                core = (_island(fused_attn_core, stripe=True) if use_kernel
                        else attn_core_xla)
                sv, sve = core(q, k, v, q_emb, k_emb, v_emb, aff)

        # similarity-BN running-stat update (torch momentum semantics,
        # unbiased batch variance — same as ops/norms.py batch_norm_train)
        if train and not self.is_initializing():
            momentum = 0.1
            ub = var_b * (count / max(count - 1.0, 1.0))
            sim_mean.value = (1 - momentum) * sim_mean.value + momentum * mean_b
            sim_var.value = (1 - momentum) * sim_var.value + momentum * ub

        if lanes_out:
            # output BN directly in the kernels' (g, gp, L, S) layout —
            # features (g, gp[, stack]) are the MAJOR axes — then ONE
            # transpose back to NHWC, replacing the from_lanes + unstripe
            # chain (2 big copies per sv/sve, mirrored in the backward)
            if self.mode == MODE_WOPOS:
                y = self._bn_apply(out_bn, sv_l, (0, 1), train=train)
            else:
                if gates is not None:
                    sv_l = sv_l * f_sv
                y = self._bn_apply_split(out_bn, sv_l, sve_l, (0, 1),
                                         train=train)
            if self.lanes_io:  # (C_out, L, S): another FREE view
                return y.reshape(self.out_planes, L, n * m).astype(dtype)
            out = jnp.transpose(y.reshape(g, gp, L, n, m), (3, 2, 4, 0, 1))
            return out.reshape(n, L, m, self.out_planes).astype(dtype)

        def unstripe(t):  # (S, g, gp, L) -> (n, L, m, g, gp)
            t = jnp.transpose(t, (0, 3, 1, 2)).reshape(n, m, L, g, gp)
            return jnp.transpose(t, (0, 2, 1, 3, 4))

        sv = unstripe(sv)
        if self.mode == MODE_WOPOS:
            out = self._bn_apply(out_bn, sv, (3, 4), train=train)
        else:
            sve = unstripe(sve)  # f_sve already folded into v_emb
            if gates is not None:
                sv = sv * f_sv
            out = self._bn_apply_split(out_bn, sv, sve, (3, 4), train=train)
        out = out.reshape(n, L, m, self.out_planes)
        if self.lanes_io:  # stripe-kernel fallback: convert back to lanes
            return jnp.transpose(out, (3, 1, 0, 2)) \
                .reshape(self.out_planes, L, n * m).astype(dtype)
        return out.astype(dtype)

    def _jnp_attention(self, qkv, g, gp, span, train, data_gates_in,
                       sim_bn, out_bn, dtype):
        n, L, m = qkv.shape[0], qkv.shape[1], qkv.shape[2]
        qkv = qkv.reshape(n, L, m, g, 2 * gp)
        q, k, v = jnp.split(qkv, [gp // 2, gp], axis=-1)

        # qk[n,m,g,i,j] = sum_c q[n,i,m,g,c] * k[n,j,m,g,c]
        qk = jnp.einsum("nimgc,njmgc->nmgij", q, k,
                        preferred_element_type=jnp.float32)

        if self.mode != MODE_WOPOS:
            relative = self.param(
                "relative", normal_by_fan(gp), (2 * gp, 2 * span - 1),
                jnp.float32,
            )
            idx = relative_logit_index(span)
            all_emb = relative[:, idx]  # (2gp, span_i, span_j)
            q_emb, k_emb, v_emb = (
                all_emb[: gp // 2].astype(dtype),
                all_emb[gp // 2: gp].astype(dtype),
                all_emb[gp:],
            )
            # qr[n,m,g,i,j] = sum_c q[n,i,m,g,c] * q_emb[c,i,j]
            qr = jnp.einsum("nimgc,cij->nmgij", q, q_emb,
                            preferred_element_type=jnp.float32)
            # kr[n,m,g,i,j] = sum_c k[n,j,m,g,c] * k_emb[c,j,i]
            kr = jnp.einsum("njmgc,cji->nmgij", k, k_emb,
                            preferred_element_type=jnp.float32)
            gates = self._gates(data_gates_in)
            if gates is not None:
                f_qr, f_kr, f_sve, f_sv = gates
                qr = qr * f_qr
                kr = kr * f_kr
            # stacked-similarity BN over the (3, groups) feature layout, then sum
            stacked = jnp.stack([qk, qr, kr], axis=2)  # (n, m, 3, g, i, j)
            stacked = self._bn_apply(sim_bn, stacked, (2, 3), train)
            logits = jnp.sum(stacked, axis=2)  # (n, m, g, i, j)
        else:
            gates = None
            logits = self._bn_apply(sim_bn, qk, 2, train)

        sim = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)

        # sv[n,i,m,g,c] = sum_j sim[n,m,g,i,j] * v[n,j,m,g,c]
        sv = jnp.einsum("nmgij,njmgc->nimgc", sim, v,
                        preferred_element_type=jnp.float32)
        if self.mode != MODE_WOPOS:
            sve = jnp.einsum("nmgij,cij->nimgc", sim, v_emb.astype(dtype),
                             preferred_element_type=jnp.float32)
            if gates is not None:
                sv = sv * f_sv
                sve = sve * f_sve
            stacked_out = jnp.stack([sv, sve], axis=-1)  # (n, i, m, g, c, 2)
            stacked_out = self._bn_apply(out_bn, stacked_out, (3, 4, 5), train)
            out = jnp.sum(stacked_out, axis=-1)  # (n, i, m, g, c)
        else:
            out = self._bn_apply(out_bn, sv, (3, 4), train)
        return out.reshape(n, L, m, self.out_planes).astype(dtype)

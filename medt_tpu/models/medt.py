"""MedT / LoGo — the dual-branch (gLObal + LOcal) axial U-Net.

Rebuild of the reference ``medt_net`` (reference axialnet.py:509-711):

* **Global branch** (shallow): stem -> layer1 -> layer2 -> decoder4 ->
  add skip -> decoder5, at full image resolution.
* **Local branch** (deep): a full 4-stage axial U-Net applied to a 4x4 grid
  of image patches.
* **Fusion**: elementwise add of the two branch maps -> 3x3 ``decoderf`` ->
  ReLU -> 1x1 head -> raw logits.

TPU-first redesign: the reference runs the local branch as 16 *sequential*
Python-loop forward passes over hardcoded 32px slices (axialnet.py:661-700,
which silently assumes img_size==128). Here the patch grid is folded into the
batch axis (space-to-batch) so the local U-Net runs **once** on a 16x larger
batch — pure XLA, no loop, and the patch size is derived from ``img_size``
(so the zoo's 512px variants, reference lib/models/model_codes.py:1842/2054,
are the same module). Train-mode BN consequence of the default fast path:
batch statistics are computed over all patches jointly instead of the
reference's 16 sequential per-patch batches; eval-mode behavior is identical.
The joint statistics are the better-defined estimator (they see the whole
batch) and keep the branch a single large-batch program, so they are the
default; ``sequential_bn_parity=True`` reproduces the reference's train-mode
math EXACTLY — per-patch normalization moments and the 16 sequential
running-stat EMA updates in the reference's row-major patch order — by
calling the shared local-branch modules once per patch (flax variable writes
chain through the trace, so the EMA ordering falls out by construction).
Parity mode is for verification/golden tests; it compiles 16 unrolled copies
of the local branch and is not the production path.

Architectural quirk faithfully reproduced: the reference builds the local stem
*after* the global stages mutated ``self.inplanes``, so the local stem is
``imgchan -> int(256*s)*2 -> 128 -> int(256*s)*2`` (64 wide at s=0.125), not
the thin 8-channel global stem (reference axialnet.py:557-566).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops import conv2d, upsample_bilinear_2x
from .axial_unet import ConvStem, _up_block
from .blocks import AxialStage


def space_to_batch(x, grid: int):
    """(N, H, W, C) -> (N*grid*grid, H/grid, W/grid, C), row-major patches."""
    n, h, w, c = x.shape
    ph, pw = h // grid, w // grid
    x = x.reshape(n, grid, ph, grid, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * grid * grid, ph, pw, c)


def batch_to_space(x, grid: int):
    """Inverse of :func:`space_to_batch`."""
    nb, ph, pw, c = x.shape
    n = nb // (grid * grid)
    x = x.reshape(n, grid, grid, ph, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, grid * ph, grid * pw, c)


class MedTNet(nn.Module):
    """Global + local (LoGo) axial segmentation network emitting raw logits.

    ``global_mode`` / ``local_mode`` select the attention variant per branch:
    MedT = ("gated", "wopos"); logo = ("full", "full")
    (reference axialnet.py:722-728).
    """

    layers: Sequence[int] = (1, 2, 4, 1)
    num_classes: int = 2
    groups: int = 8
    base_width: int = 64
    s: float = 0.125
    img_size: int = 128
    patch_grid: int = 4
    global_mode: str = "gated"
    local_mode: str = "wopos"
    gate_init: Tuple[float, float, float, float] = (0.1, 0.1, 0.1, 1.0)
    trainable_gates: bool = False
    use_fused: bool = False          # fused Pallas attention on the eval path
    sequential_bn_parity: bool = False  # exact reference train-mode BN (see
    # module docstring): per-patch moments + sequential EMA, 16x trace unroll
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        s = self.s
        # local-branch geometry: patches are halved by the stem and by the
        # three strided stages; the decoder1 stride-2+upsample trick
        # (reference axialnet.py:623) needs a bottom of at least 2x2
        bottom = self.img_size // (self.patch_grid * 2 * 8)
        assert bottom >= 2, (
            f"img_size={self.img_size} with patch_grid={self.patch_grid} "
            f"bottoms the local branch at {bottom}px (<2). Use img_size >= "
            f"{self.patch_grid * 32} or a smaller patch_grid (the reference "
            "hardcodes 128px/4x4, axialnet.py:661-664).")
        stage_planes = [int(128 * s), int(256 * s), int(512 * s), int(1024 * s)]

        # ---- global branch (2 encoder stages + 2 decoder stages) ----------
        g = ConvStem(inplanes=int(64 * s), dtype=self.dtype, name="stem")(
            x, train=train
        )
        stage1 = AxialStage(
            inplanes=int(64 * s), planes=stage_planes[0], blocks=self.layers[0],
            span=self.img_size // 2, groups=self.groups,
            base_width=self.base_width, attention_mode=self.global_mode,
            gate_init=self.gate_init,
            trainable_gates=self.trainable_gates, use_fused=self.use_fused,
            dtype=self.dtype, name="layer1",
        )
        g1 = stage1(g, train=train)
        stage2 = AxialStage(
            inplanes=stage1.out_planes, planes=stage_planes[1],
            blocks=self.layers[1], span=self.img_size // 2, stride=2,
            groups=self.groups, base_width=self.base_width,
            attention_mode=self.global_mode,
            gate_init=self.gate_init,
            trainable_gates=self.trainable_gates, use_fused=self.use_fused,
            dtype=self.dtype, name="layer2",
        )
        g2 = stage2(g1, train=train)

        g = _up_block(g2, int(256 * s), int(512 * s), "decoder4", self.dtype) + g1
        g = _up_block(g, int(128 * s), int(256 * s), "decoder5", self.dtype)

        # ---- local branch: space-to-batch over the patch grid -------------
        patch_size = self.img_size // self.patch_grid
        xp = space_to_batch(x, self.patch_grid)

        # wide local stem — reproduces the reference's inplanes mutation
        local_inplanes = stage2.out_planes  # int(256*s)*2

        # construct every local-branch module ONCE (so the parity path below
        # can call the same instances per patch — flax shares params and
        # chains BN running-stat writes across repeated calls of an instance)
        stem_p = ConvStem(inplanes=local_inplanes, dtype=self.dtype,
                          name="stem_p")
        span = patch_size // 2
        spans = [span, span, span // 2, span // 4]
        strides = [1, 2, 2, 2]
        stages_p = []
        inplanes = local_inplanes
        for i in range(4):
            stage = AxialStage(
                inplanes=inplanes, planes=stage_planes[i], blocks=self.layers[i],
                span=spans[i], stride=strides[i], groups=self.groups,
                base_width=self.base_width, attention_mode=self.local_mode,
                gate_init=self.gate_init,
                trainable_gates=self.trainable_gates,
                use_fused=self.use_fused,
                dtype=self.dtype, name=f"layer{i + 1}_p",
            )
            stages_p.append(stage)
            inplanes = stage.out_planes
        dec1_p = conv2d(int(1024 * 2 * s), 3, stride=2, use_bias=True,
                        in_features=int(1024 * 2 * s), name="decoder1_p",
                        dtype=self.dtype)
        dec2_p = conv2d(int(1024 * s), 3, use_bias=True,
                        in_features=int(1024 * 2 * s), name="decoder2_p",
                        dtype=self.dtype)
        dec3_p = conv2d(int(512 * s), 3, use_bias=True,
                        in_features=int(1024 * s), name="decoder3_p",
                        dtype=self.dtype)
        dec4_p = conv2d(int(256 * s), 3, use_bias=True,
                        in_features=int(512 * s), name="decoder4_p",
                        dtype=self.dtype)
        dec5_p = conv2d(int(128 * s), 3, use_bias=True,
                        in_features=int(256 * s), name="decoder5_p",
                        dtype=self.dtype)

        def run_local(q):
            p = stem_p(q, train=train)
            skips = []
            for stage in stages_p:
                p = stage(p, train=train)
                skips.append(p)
            p1, p2, p3, p4 = skips
            d = dec1_p(p4)
            d = nn.relu(upsample_bilinear_2x(d)) + p4
            d = nn.relu(upsample_bilinear_2x(dec2_p(d))) + p3
            d = nn.relu(upsample_bilinear_2x(dec3_p(d))) + p2
            d = nn.relu(upsample_bilinear_2x(dec4_p(d))) + p1
            return nn.relu(upsample_bilinear_2x(dec5_p(d)))

        if self.sequential_bn_parity and train:
            # exact reference semantics (axialnet.py:661-700): one pass per
            # patch in row-major order; each pass normalizes with its OWN
            # batch moments and applies its OWN running-stat EMA update, in
            # sequence. space_to_batch lays patches out batch-minor
            # (index = n*P + p), so patch p's minibatch is xp[p::P].
            P = self.patch_grid * self.patch_grid
            n = xp.shape[0] // P
            per_patch = xp.reshape(n, P, *xp.shape[1:])
            outs = [run_local(per_patch[:, p]) for p in range(P)]
            d = jnp.stack(outs, axis=1).reshape(n * P, *outs[0].shape[1:])
        else:
            d = run_local(xp)

        x_loc = batch_to_space(d, self.patch_grid)

        # ---- fusion --------------------------------------------------------
        fused = g + x_loc
        fused = nn.relu(
            conv2d(int(128 * s), 3, use_bias=True, in_features=int(128 * s),
                   name="decoderf", dtype=self.dtype)(fused)
        )
        logits = conv2d(self.num_classes, 1, padding=0, use_bias=True,
                        in_features=int(128 * s), name="adjust",
                        dtype=self.dtype)(nn.relu(fused))
        return logits

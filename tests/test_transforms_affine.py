"""Oracle tests for the full joint RandomAffine + hue jitter
(reference utils.py:70-89 capabilities; torchvision is not installed here,
so hue is pinned against stdlib colorsys and the affine against its exact
closed-form corner cases plus a brute-force reimplementation)."""
import colorsys

import numpy as np
import pytest

from medt_tpu.data.transforms import (
    JointTransform2D,
    _adjust_hue,
    _inverse_affine_matrix,
    affine_nearest,
    random_affine_params,
)


def test_hue_zero_is_identity():
    rng = np.random.default_rng(0)
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_array_equal(_adjust_hue(img, 0.0), img)


def test_hue_matches_colorsys():
    rng = np.random.default_rng(1)
    img = rng.random((6, 5, 3)).astype(np.float64)
    factor = 0.23
    got = _adjust_hue(img, factor)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            h, s, v = colorsys.rgb_to_hsv(*img[y, x])
            want = colorsys.hsv_to_rgb((h + factor) % 1.0, s, v)
            np.testing.assert_allclose(got[y, x], want, atol=1e-6)


def test_hue_third_turn_cycles_channels():
    red = np.zeros((2, 2, 3), np.float32)
    red[..., 0] = 1.0
    green = _adjust_hue(red, 1.0 / 3.0)
    np.testing.assert_allclose(green[..., 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(green[..., 0], 0.0, atol=1e-6)


def test_affine_identity():
    rng = np.random.default_rng(2)
    img = rng.random((9, 7, 3)).astype(np.float32)
    np.testing.assert_array_equal(affine_nearest(img, 0.0), img)


def test_affine_pure_translate():
    rng = np.random.default_rng(3)
    img = rng.random((8, 8)).astype(np.float32)
    out = affine_nearest(img, 0.0, translate=(2, 3))
    # out[y, x] = in[y - ty, x - tx], zero-filled outside
    np.testing.assert_array_equal(out[3:, 2:], img[:-3, :-2])
    assert (out[:3] == 0).all() and (out[:, :2] == 0).all()


def test_affine_90_deg_is_rot90_clockwise():
    rng = np.random.default_rng(4)
    img = rng.random((16, 16)).astype(np.float32)
    out = affine_nearest(img, 90.0)
    np.testing.assert_array_equal(out, np.rot90(img, -1))


def test_affine_brute_force_oracle():
    """Vectorized warp == per-pixel loop over the same inverse matrix."""
    rng = np.random.default_rng(5)
    img = rng.random((11, 13)).astype(np.float32)
    angle, tr, scale, shear = 37.0, (2, -1), 1.7, -20.0
    got = affine_nearest(img, angle, tr, scale, shear)
    h, w = img.shape
    m = _inverse_affine_matrix((w * 0.5, h * 0.5), angle, tr, scale, shear)
    want = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            sx = int(np.floor(m[0] * (x + 0.5) + m[1] * (y + 0.5) + m[2]))
            sy = int(np.floor(m[3] * (x + 0.5) + m[4] * (y + 0.5) + m[5]))
            if 0 <= sx < w and 0 <= sy < h:
                want[y, x] = img[sy, sx]
    np.testing.assert_array_equal(got, want)


def test_affine_mask_image_stay_joint():
    """Image and mask must receive the identical geometric transform."""
    rng = np.random.default_rng(6)
    img = np.zeros((32, 32, 3), np.float32)
    mask = np.zeros((32, 32), np.uint8)
    img[10:20, 12:22] = 1.0
    mask[10:20, 12:22] = 255
    tf = JointTransform2D(crop=None, p_flip=0.0,
                          color_jitter_params=None,
                          p_random_affine=1.0, long_mask=True)
    im_out, mk_out = tf(img, mask, rng=rng)
    # wherever the mask is foreground, the image block must be there too
    fg = mk_out > 0
    assert fg.any()  # scale=2 zoom keeps the centered block visible
    np.testing.assert_array_equal(im_out[..., 0] > 0.5, fg)
    # mask stays label-valued under nearest resampling
    assert set(np.unique(mk_out)) <= {0, 255}


def test_random_affine_params_reference_ranges():
    """Parameter ranges pin the reference's get_params call
    (angle +-90, translate up to the full extent, scale exactly 2,
    shear +-45 — reference utils.py:88)."""
    rng = np.random.default_rng(7)
    for _ in range(50):
        angle, (tx, ty), scale, shear = random_affine_params(rng, (32, 32))
        assert -90 <= angle <= 90 and -45 <= shear <= 45
        assert scale == pytest.approx(2.0)
        assert -32 <= tx <= 32 and -32 <= ty <= 32

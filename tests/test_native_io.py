"""Native C++ decoder vs cv2/PIL ground truth."""
import numpy as np
import pytest

from medt_tpu.data import native
from medt_tpu.data.synthetic import make_png_dataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libmedt_io.so not built")


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat")
    make_png_dataset(str(root), n=6, img_size=32, seed=0)
    return str(root)


def _cv2_read(path, gray):
    import cv2
    return cv2.imread(path, 0 if gray else 1)


def test_decode_image_matches_cv2(ds):
    import os
    path = os.path.join(ds, "img", "000.png")
    for gray in (False, True):
        got = native.decode_image(path, gray=gray)
        want = _cv2_read(path, gray)
        np.testing.assert_array_equal(got, want)


def test_decode_batch_and_fused_binarize(ds):
    import os
    paths = [os.path.join(ds, "labelcol", f"{i:03d}.png") for i in range(6)]
    batch = native.decode_batch(paths, 32, 32, gray=True,
                                binarize_thresh=127, threads=3)
    assert batch.shape == (6, 32, 32, 1)
    for i, p in enumerate(paths):
        want = (_cv2_read(p, True) > 127).astype(np.uint8)
        np.testing.assert_array_equal(batch[i, :, :, 0], want)


def test_decode_batch_ge_semantics(ds):
    """gray-mode rule is >=127 (reference utils_gray.py:159)."""
    import os
    paths = [os.path.join(ds, "labelcol", "000.png")]
    ge = native.decode_batch(paths, 32, 32, gray=True, binarize_thresh=127,
                             ge_semantics=True)
    want = (_cv2_read(paths[0], True) >= 127).astype(np.uint8)
    np.testing.assert_array_equal(ge[0, :, :, 0], want)


def test_missing_file_reports_failure(ds):
    with pytest.raises(IOError):
        native.decode_batch(["/nonexistent.png"], 32, 32, gray=True)


def test_native_color_jitter_matches_python_chain():
    """Fused C++ jitter == the Python brightness->contrast->saturation->hue
    chain (same formulas/order; float rounding only)."""
    from medt_tpu.data.transforms import (
        _adjust_brightness, _adjust_contrast, _adjust_hue, _adjust_saturation)

    if not native.jitter_available():
        pytest.skip("libmedt_io.so v2 not built")
    rng = np.random.default_rng(3)
    for _ in range(5):
        img = rng.random((32, 24, 3)).astype(np.float32)
        fb, fc = 1 + rng.uniform(-.3, .3), 1 + rng.uniform(-.3, .3)
        fs, fh = 1 + rng.uniform(-.3, .3), float(rng.uniform(-.5, .5))
        ref = _adjust_hue(_adjust_saturation(_adjust_contrast(
            _adjust_brightness(img.copy(), fb), fc), fs), fh)
        got = native.color_jitter(img.copy(), fb, fc, fs, fh)
        np.testing.assert_allclose(got, ref, atol=5e-6)
    # grayscale: brightness/contrast only, matching the Python gate
    g = rng.random((16, 16, 1)).astype(np.float32)
    ref = _adjust_contrast(_adjust_brightness(g.copy(), 1.2), 0.8)
    got = native.color_jitter(g.copy(), 1.2, 0.8, 1.0, 0.0)
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_joint_transform_uses_native_jitter_consistently():
    """JointTransform2D with jitter produces the same result whether the
    native path is available or monkeypatched away (same rng draws)."""
    from medt_tpu.data import transforms as T

    if not native.jitter_available():
        pytest.skip("libmedt_io.so v2 not built")
    rng_img = np.random.default_rng(11)
    img = rng_img.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    mask = (rng_img.random((64, 64)) > 0.5).astype(np.uint8)
    tf = T.JointTransform2D(crop=(32, 32), p_flip=0.5,
                            color_jitter_params=(0.1, 0.1, 0.1, 0.1),
                            long_mask=True)
    i1, m1 = tf(img, mask, rng=np.random.default_rng(5))
    orig = native.jitter_available
    native.jitter_available = lambda: False
    try:
        i2, m2 = tf(img, mask, rng=np.random.default_rng(5))
    finally:
        native.jitter_available = orig
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_allclose(i1, i2, atol=5e-6)

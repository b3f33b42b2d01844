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

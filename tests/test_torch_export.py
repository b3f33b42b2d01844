"""Round-trip of utils/torch_import.export_state_dict.

Import a real reference state dict (tests/goldens/*.npz, generated from the
actual reference models), export it back, and require EXACT key and value
equality — proving weights trained in this framework load into the
reference's tooling (reference test.py:105) unchanged.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.models import build_model
from medt_tpu.utils.torch_import import (
    export_for_model,
    export_state_dict,
    import_state_dict,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load_sd(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not generated")
    blob = np.load(path)
    return {k[3:]: blob[k] for k in blob.files if k.startswith("sd.")}


@pytest.mark.parametrize("name,img", [
    ("axialunet", 64), ("gatedaxialunet", 64), ("MedT", 128),
])
def test_export_roundtrips_reference_state_dict(name, img):
    sd = _load_sd(name)
    model = build_model(name, img_size=img)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = import_state_dict(sd, variables["params"],
                                      variables["batch_stats"])
    out = export_for_model(name, params, stats)

    # not emitted (reference loads with strict=False): num_batches_tracked
    # counters, and the reference's dead parameters this framework doesn't
    # carry — medt_net's unused adjust_p and the wopos blocks' never-called
    # conv1 (reference axialnet.py:358)
    def dead(k):
        return (k.endswith("num_batches_tracked")
                or k.startswith("adjust_p.")
                or ("_p." in k and ".conv1." in k and name == "MedT"))

    ref_keys = {k for k in sd if not dead(k)}
    assert set(out) == ref_keys, (
        sorted(set(out) - ref_keys)[:5], sorted(ref_keys - set(out))[:5])
    for k in sorted(ref_keys):
        assert out[k].shape == sd[k].shape, (k, out[k].shape, sd[k].shape)
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


def test_export_fresh_init_loads_shapes():
    """A fresh framework init exports to reference-shaped tensors (no
    golden needed): every conv is OIHW, qkv is (O, I, 1), BNs are flat."""
    model = build_model("gatedaxialunet", img_size=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = export_state_dict(variables["params"], variables["batch_stats"])
    assert out["conv1.weight"].shape[2:] == (7, 7)  # OIHW, 7x7 stem
    qkv = [v for k, v in out.items() if "qkv_transform.weight" in k]
    assert qkv and all(v.ndim == 3 and v.shape[2] == 1 for v in qkv)
    bns = [v for k, v in out.items() if "bn_similarity.weight" in k]
    assert bns and all(v.ndim == 1 for v in bns)

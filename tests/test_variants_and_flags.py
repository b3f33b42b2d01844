"""Coverage for compute-dtype flags, gate variants, remat, and the predict CLI."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.models import build_model
from medt_tpu.training import adam_l2, init_state, train_step


def _batch(rng, n=2, img=32):
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(n, img, img))),
    }


def test_bfloat16_compute_trains():
    model = build_model("axialunet", img_size=32, dtype=jnp.bfloat16)
    state = init_state(model, adam_l2(1e-3), (2, 32, 32, 3))
    state, m = jax.jit(train_step)(state, _batch(np.random.default_rng(0)))
    assert np.isfinite(float(m["loss"]))
    # params stay fp32 masters
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.params))


def test_remat_matches_plain_step():
    import functools

    from _shared import jit_train_step, shared_state

    _, state = shared_state("axialunet", 32, batch=2)
    batch = _batch(np.random.default_rng(1))
    s1, m1 = jit_train_step(state, batch)
    s2, m2 = jax.jit(functools.partial(train_step, remat=True))(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in list(zip(l1, l2))[:5]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("name", ["gated_sig", "gated_data"])
def test_zoo_gate_variants_train(name):
    """Sigmoid/data-dependent gates train (zoo model_codes.py:215-444)."""
    from _shared import jit_train_step, shared_state

    model, state = shared_state(name, 32, batch=2)
    batch = _batch(np.random.default_rng(2))
    state, m = jit_train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    if name == "gated_sig":
        # released reference freezes sigmoid gates at (0.1, 0.1, 0.1, 5.0)
        # (model_codes.py:241-244): frozen by default -> no gate params
        assert model.gate_init == (0.1, 0.1, 0.1, 5.0)
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        assert not any("f_qr" in "/".join(map(str, p)) for p, _ in flat)
        # the trained-gate setting stays available as an opt-in
        m2 = build_model(name, img_size=32, trainable_gates=True)
        assert m2.trainable_gates and m2.gate_init == (0.1, 0.1, 0.1, 5.0)


def test_trainable_gates_receive_gradients():
    from _shared import jit_train_step, shared_state

    _, state = shared_state("gatedaxialunet", 32, batch=2, lr=1e-2,
                            trainable_gates=True)
    batch = _batch(np.random.default_rng(3))
    before = float(
        state.params["layer1"]["block0"]["attn_h"]["f_qr"])
    for _ in range(3):
        state, _ = jit_train_step(state, batch)
    after = float(state.params["layer1"]["block0"]["attn_h"]["f_qr"])
    assert before == pytest.approx(0.1)
    assert after != before


def test_predict_cli(tmp_path):
    from medt_tpu.data.synthetic import make_png_dataset
    from medt_tpu.cli.train import main as train_main
    from medt_tpu.cli.predict import main as predict_main

    train = make_png_dataset(str(tmp_path / "train"), n=4, img_size=32, seed=0)
    out = str(tmp_path / "run")
    train_main(["--train_dataset", train, "--modelname", "axialunet",
                "--imgsize", "32", "--batch_size", "2", "--epochs", "1",
                "--save_freq", "1", "--direc", out, "--workers", "0"])
    pred = str(tmp_path / "preds")
    predict_main(["--val_dataset", train, "--modelname", "axialunet",
                  "--imgsize", "32", "--loaddirec",
                  os.path.join(out, "final_model"), "--direc", pred,
                  "--workers", "0"])
    assert len([f for f in os.listdir(pred) if f.endswith(".png")]) == 4

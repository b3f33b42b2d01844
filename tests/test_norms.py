"""BatchNorm parity vs torch.nn (the library, used as an oracle).

SURVEY.md ranks BN semantics as the #1 parity risk: biased variance for
normalization, unbiased for the running update, momentum 0.1, stats coupling
across the stripe batch. These tests pin our functional BN against torch's
reference implementation in both modes, including multi-step running-stat
evolution.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from medt_tpu.ops import BatchNorm


def _init(module, x):
    variables = module.init(jax.random.PRNGKey(0), x, use_running_average=False)
    return variables["params"], variables["batch_stats"]


def _apply_train(module, params, stats, x):
    y, mut = module.apply(
        {"params": params, "batch_stats": stats},
        x,
        use_running_average=False,
        mutable=["batch_stats"],
    )
    return np.asarray(y), mut["batch_stats"]


@pytest.mark.parametrize("shape", [(6, 10, 5), (4, 7, 3, 3)])
def test_train_mode_matches_torch(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    c = shape[1]

    tbn = torch.nn.BatchNorm1d(c) if len(shape) == 3 else torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.linspace(0.5, 1.5, c))
        tbn.bias.copy_(torch.linspace(-0.2, 0.2, c))
    tbn.train()

    # ours is channel-last; move channels
    x_cl = np.moveaxis(x, 1, -1)
    module = BatchNorm(feature_axes=-1)
    params, stats = _init(module, jnp.asarray(x_cl))
    params = dict(params)
    params["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    params["bias"] = jnp.asarray(tbn.bias.detach().numpy())

    for step in range(3):
        xs = rng.normal(size=shape).astype(np.float32)
        want = tbn(torch.from_numpy(xs)).detach().numpy()
        got, stats = _apply_train(module, params, stats, jnp.asarray(np.moveaxis(xs, 1, -1)))
        np.testing.assert_allclose(np.moveaxis(got, -1, 1), want, atol=1e-5, rtol=1e-5)
        # running stats must evolve identically (unbiased var, momentum 0.1)
        np.testing.assert_allclose(
            np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-6, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stats["var"]), tbn.running_var.numpy(), atol=1e-6, rtol=1e-5
        )

    # eval mode consumes the running stats the same way
    tbn.eval()
    xs = rng.normal(size=shape).astype(np.float32)
    want = tbn(torch.from_numpy(xs)).detach().numpy()
    got = module.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(xs, 1, -1)),
        use_running_average=True,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-5, rtol=1e-5
    )


def test_multi_axis_features():
    """Feature axes (1,2) == flattened-channel BN (the stacked-similarity case)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 3, 4, 6)).astype(np.float32)  # (N, 3, g, L)

    m2 = BatchNorm(feature_axes=(1, 2))
    p2, s2 = _init(m2, jnp.asarray(x))
    y2, _ = _apply_train(m2, p2, s2, jnp.asarray(x))

    xf = x.reshape(8, 12, 6)
    m1 = BatchNorm(feature_axes=1)
    p1, s1 = _init(m1, jnp.asarray(xf))
    y1, _ = _apply_train(m1, p1, s1, jnp.asarray(xf))

    np.testing.assert_allclose(y2.reshape(8, 12, 6), y1, atol=1e-6)

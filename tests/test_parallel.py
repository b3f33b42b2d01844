"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the FULL train step compiles and executes under a real
(data, seq, model) mesh, that DP+SP+TP sharded training is numerically
equivalent to single-device training, and that the partitioning rules
actually shard the attention parameters.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from medt_tpu.models import build_model
from medt_tpu.parallel import make_mesh, partition_specs, shard_batch, shard_state
from medt_tpu.training import adam_l2, init_state, train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _batch(rng, n=8, img=64):
    return {
        "image": jnp.asarray(rng.normal(size=(n, img, img, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, size=(n, img, img))),
    }


def test_partition_specs_shard_attention_groups():
    model = build_model("gatedaxialunet", img_size=64)
    # shape-only trace: partition specs need the param TREE, not values
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False))
    specs = partition_specs(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P)
    )[0]
    qkv = [s for p, s in flat if "qkv" in str(p) and "kernel" in str(p)]
    assert qkv and all(s == P(None, "model") for s in qkv)
    conv = [s for p, s in flat if "decoder1" in str(p)]
    assert conv and all(s == P() for s in conv)


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    model = build_model("axialunet", img_size=64)
    state = init_state(model, adam_l2(1e-3), (8, 64, 64, 3))
    batch = _batch(np.random.default_rng(0))

    # single device reference
    s1, m1 = jax.jit(train_step)(state, batch)

    # 2x2x2 mesh: DP + sequence sharding + tensor parallel over groups
    mesh = make_mesh(8, dp=2, sp=2, tp=2)
    st = shard_state(state, mesh)
    bt = shard_batch(batch, mesh)
    s2, m2 = jax.jit(train_step)(st, bt)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               atol=1e-5, rtol=1e-5)

    # gradients agree (params after an Adam step are sign(g)-sensitive and
    # would amplify reduction-order noise, so compare grads, not params)
    def loss_of(params, st, bt):
        def f(p):
            logits, _ = st.apply_fn(
                {"params": p, "batch_stats": st.batch_stats},
                bt["image"], train=True, mutable=["batch_stats"],
            )
            import medt_tpu.losses as L
            return L.log_nll_loss(logits, bt["label"])
        return jax.jit(jax.grad(f))(params)

    # f32 grads under a split mesh differ from single-device only by
    # reduction-order rounding (verified: max diff 5e-8 when run in f64),
    # which BN-backward cancellation amplifies — so check direction + scale
    # rather than elementwise bits.
    g1 = loss_of(state.params, state, batch)
    g2 = loss_of(st.params, st, bt)
    v1 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(g1)])
    v2 = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(g2)])
    cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert cos > 0.999, cos
    assert np.abs(v1 - v2).max() < 2e-2


def test_pure_dp_mesh():
    from _shared import shared_state

    _, state = shared_state("axialunet", 32, batch=8)
    batch = _batch(np.random.default_rng(1), img=32)
    mesh = make_mesh(8, dp=8, sp=1, tp=1)
    st = shard_state(state, mesh)
    bt = shard_batch(batch, mesh)
    s2, m2 = jax.jit(train_step)(st, bt)
    assert np.isfinite(float(m2["loss"]))


def test_detect_slices_and_slice_major_grouping():
    """Multi-slice jobs expose slice_index; the mesh must keep seq/model
    inside a slice and let only the data axis cross the DCN."""
    from medt_tpu.parallel.mesh import detect_slices

    class Dev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

    # interleaved enumeration order, as multi-process jobs produce
    devs = [Dev(i, i % 2) for i in range(8)]
    assert detect_slices(devs) == 2
    assert detect_slices(jax.devices()) == 1  # CPU devices: single domain


def test_make_mesh_multislice_shape_and_grouping():
    """slices=2 on 8 devices: per-slice (1,2,2) factorization -> global
    (data=2, seq=2, model=2) with each slice's 4 devices contiguous in one
    data row (seq/model collectives never cross the slice boundary)."""
    mesh = make_mesh(slices=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "seq": 2, "model": 2}
    row_ids = [sorted(d.id for d in mesh.devices[i].ravel()) for i in (0, 1)]
    assert row_ids == [[0, 1, 2, 3], [4, 5, 6, 7]]

    with pytest.raises(AssertionError):
        make_mesh(dp=1, sp=2, tp=4, slices=2)  # data axis can't span < slices

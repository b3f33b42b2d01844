"""Fused Pallas attention kernel vs the jnp path (interpret mode on CPU).

The kernel is the eval-mode hot path; these tests pin it numerically against
the golden-verified jnp implementation for every attention mode and for the
four layer geometries the models actually use.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medt_tpu.ops import AxialAttention

INTERPRET = jax.default_backend() == "cpu"


def _run_pair(mode, out_planes, groups, span, axis="h", n=2, m=None):
    """Same weights + drifted stats through jnp path and fused path."""
    m = m or span
    c_in = 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(n, span, m, c_in)).astype(np.float32)
        if axis == "h" else
        rng.normal(size=(n, m, span, c_in)).astype(np.float32)
    )
    op_ref = AxialAttention(in_planes=c_in, out_planes=out_planes, span=span,
                            groups=groups, axis=axis, mode=mode,
                            use_fused=False)
    variables = op_ref.init(jax.random.PRNGKey(0), x, train=True)
    # drift the running stats away from init so folding is non-trivial
    _, mut = op_ref.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}

    y_ref = op_ref.apply(variables, x, train=False)

    import medt_tpu.ops.pallas_axial as pk
    orig = pk.axial_attention_fused
    calls = {}

    def wrapped(*args, **kw):
        calls["n"] = calls.get("n", 0) + 1
        kw["interpret"] = INTERPRET
        return orig(*args, **kw)

    pk.axial_attention_fused = wrapped
    try:
        op_fused = AxialAttention(in_planes=c_in, out_planes=out_planes,
                                  span=span, groups=groups, axis=axis,
                                  mode=mode, use_fused=True)
        y_fused = op_fused.apply(variables, x, train=False)
    finally:
        pk.axial_attention_fused = orig
    assert calls.get("n", 0) == 1, "fused kernel was not invoked"
    return np.asarray(y_ref), np.asarray(y_fused)


@pytest.mark.parametrize("mode", ["gated", "full", "wopos"])
def test_fused_matches_jnp(mode):
    y_ref, y_fused = _run_pair(mode, out_planes=8, groups=4, span=8)
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("out_planes,groups,span", [
    (16, 8, 16),   # layer1 geometry (gp=2)
    (32, 8, 16),   # layer2 (gp=4)
    (64, 8, 8),    # layer3 (gp=8)
    (128, 8, 8),   # layer4 (gp=16)
])
def test_fused_layer_geometries(out_planes, groups, span):
    y_ref, y_fused = _run_pair("gated", out_planes, groups, span)
    np.testing.assert_allclose(y_fused, y_ref, atol=3e-4, rtol=3e-4)


def test_fused_width_axis_and_stride():
    y_ref, y_fused = _run_pair("gated", 8, 4, 8, axis="w")
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-4, rtol=2e-4)


def test_fused_honors_trained_gates():
    """The fused eval path must read the LIVE gate params, not gate_init
    (regression: it used to silently fold the init constants)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    kw = dict(in_planes=6, out_planes=8, span=8, groups=4, mode="gated",
              trainable_gates=True)
    op_ref = AxialAttention(use_fused=False, **kw)
    variables = op_ref.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = op_ref.apply(variables, x, train=True, mutable=["batch_stats"])
    # drift the gates far from their init values
    params = dict(variables["params"])
    for g, v in [("f_qr", 0.7), ("f_kr", -0.3), ("f_sve", 1.9), ("f_sv", 0.2)]:
        assert g in params, sorted(params)
        params[g] = jnp.asarray(v, jnp.float32)
    variables = {"params": params, "batch_stats": mut["batch_stats"]}

    y_ref = op_ref.apply(variables, x, train=False)
    import medt_tpu.ops.pallas_axial as pk
    orig = pk.axial_attention_fused
    calls = {}

    def wrapped(*args, **kw2):
        calls["n"] = calls.get("n", 0) + 1
        kw2["interpret"] = INTERPRET
        return orig(*args, **kw2)

    pk.axial_attention_fused = wrapped
    try:
        y_fused = AxialAttention(use_fused=True, **kw).apply(
            variables, x, train=False)
    finally:
        pk.axial_attention_fused = orig
    assert calls.get("n", 0) == 1
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def _train_pair(mode, out_planes=8, groups=4, span=8, n=2):
    """Loss/outputs/grads/batch-stat updates through both train paths."""
    c_in = 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, span, span, c_in)).astype(np.float32))
    tgt = jnp.asarray(
        rng.normal(size=(n, span, span, out_planes)).astype(np.float32))
    kw = dict(in_planes=c_in, out_planes=out_planes, span=span, groups=groups,
              mode=mode)
    op_ref = AxialAttention(use_fused=False, **kw)
    op_fus = AxialAttention(use_fused=True, **kw)
    variables = op_ref.init(jax.random.PRNGKey(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(op):
        def f(params, x):
            out, mut = op.apply({"params": params, "batch_stats": stats}, x,
                                train=True, mutable=["batch_stats"])
            return jnp.mean((out - tgt) ** 2), (out, mut["batch_stats"])
        return f

    r1 = jax.value_and_grad(loss_fn(op_ref), has_aux=True)(params, x)
    r2 = jax.value_and_grad(loss_fn(op_fus), has_aux=True)(params, x)
    return r1, r2


@pytest.mark.parametrize("mode", ["gated", "full", "wopos", "gated_sig"])
@pytest.mark.parametrize("span", [8, 32])
def test_fused_train_matches_jnp(mode, span):
    """Fused TRAIN path must match the XLA path in outputs, gradients, and
    running-stat updates. span=8 exercises the factorized-moment XLA core,
    span=32 the custom-VJP Pallas kernel (FUSED_TRAIN_MIN_SPAN gate)."""
    ((l1, (o1, s1)), g1), ((l2, (o2, s2)), g2) = _train_pair(mode, span=span)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("mode", ["gated", "wopos"])
def test_lanes_eval_matches_jnp(mode):
    """Small spans with enough stripes route the EVAL fused path through the
    stripe-lane kernel (running-stat affine fold, no stat updates)."""
    import medt_tpu.ops.pallas_axial_lanes as lk

    c_in = 6
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, c_in)).astype(np.float32))
    kw = dict(in_planes=c_in, out_planes=16, span=16, groups=8, mode=mode)
    op_ref = AxialAttention(use_fused=False, **kw)
    variables = op_ref.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = op_ref.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    y_ref = op_ref.apply(variables, x, train=False)

    calls = {}
    orig = lk.lanes_attn_core

    def wrapped(*a, **kw2):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **kw2)

    lk.lanes_attn_core = wrapped
    try:
        y_fus = AxialAttention(use_fused=True, **kw).apply(
            variables, x, train=False)
    finally:
        lk.lanes_attn_core = orig
    assert calls.get("n", 0) == 1, "lanes kernel was not used for eval"
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("mode", ["gated", "wopos"])
def test_flash_train_matches_jnp(mode):
    """Key-streamed ("flash") lanes kernel: spans 32..64 with enough stripes
    route through flash_lanes_core; outputs/grads/stats must match the XLA
    path exactly (f32 interpret)."""
    import medt_tpu.ops.pallas_axial_lanes as lk

    calls = {}
    orig = lk.flash_lanes_core

    def wrapped(*a, **kw):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **kw)

    lk.flash_lanes_core = wrapped
    try:
        # n=4 x m=32 = 128 stripes, span 32 -> flash admission; groups=2
        # with gp=4 keeps the c>1 channel loop + pos tables covered at a
        # quarter of the groups=8 interpret cost (admission ignores g)
        ((l1, (o1, s1)), g1), ((l2, (o2, s2)), g2) = _train_pair(
            mode, out_planes=8, groups=2, span=32, n=4)
    finally:
        lk.flash_lanes_core = orig
    assert calls.get("n", 0) >= 1, "flash kernel was not invoked"
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    # online-softmax accumulation order drifts a few ulps vs the direct
    # softmax (observed max rel ~3e-5); keep a slightly wider output gate
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("mode", ["gated", "wopos"])
def test_flash2_train_matches_jnp(mode):
    """Query+key streamed ("flash2") kernel: spans 96..256 route through
    flash2_lanes_core (the 512px models' global branch); outputs/grads/stats
    must match the XLA path (f32 interpret)."""
    import medt_tpu.ops.pallas_axial_lanes as lk

    calls = {}
    orig = lk.flash2_lanes_core

    def wrapped(*a, **kw):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **kw)

    lk.flash2_lanes_core = wrapped
    try:
        # n=1 x m=128 = 128 stripes, span 128 -> flash2 admission; groups=2
        # with gp=4 keeps the c>1 loop + query/key streaming covered at a
        # quarter of the groups=8 interpret cost
        ((l1, (o1, s1)), g1), ((l2, (o2, s2)), g2) = _train_pair(
            mode, out_planes=8, groups=2, span=128, n=1)
    finally:
        lk.flash2_lanes_core = orig
    assert calls.get("n", 0) >= 1, "flash2 kernel was not invoked"
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("has_pos", [True, False])
def test_flash2_core_span256_matches_xla(has_pos):
    """Core-level span-256 parity (the mix_512 global-branch geometry, at a
    reduced stripe count): flash2 vs the XLA einsum core, fwd + grads."""
    from medt_tpu.ops.pallas_axial_lanes import (
        flash2_lanes_core, flash2_supported)
    from medt_tpu.ops.pallas_axial_train import attn_core_xla, pack_sim_affine

    L, g, c, gp, S = 256, 2, 2, 4, 128
    assert flash2_supported(L, g, gp, S)
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)) * 0.3
    q, k, v = f(S, g, c, L), f(S, g, c, L), f(S, g, gp, L)
    a = f(3, g) * 0.3 + 1.0
    b = f(3, g) * 0.1
    if has_pos:
        qe, ke, ve = f(c, L, L), f(c, L, L), f(gp, L, L)
        aff = pack_sim_affine(g, a, b, "gated")
        args = (q, k, v, qe, ke, ve)
    else:
        qe = ke = ve = None
        aff = pack_sim_affine(g, a[0], b[0], "wopos")
        args = (q, k, v)

    def xla_fn(q, k, v, qe=None, ke=None, ve=None):
        return attn_core_xla(q, k, v, qe, ke, ve, aff, has_pos=has_pos)

    def f2_fn(q, k, v, qe=None, ke=None, ve=None):
        t = lambda x: jnp.transpose(x, (1, 2, 3, 0))
        qkv = jnp.concatenate([t(q), t(k), t(v)], axis=1)  # fused rows
        if has_pos:
            sv, sve = flash2_lanes_core(qkv, qe,
                                        jnp.swapaxes(ke, 1, 2), ve, aff)
        else:
            e = jnp.zeros((0, L, L), jnp.float32)
            sv, sve = flash2_lanes_core(qkv, e, e, e, aff)
        u = lambda x: jnp.transpose(x, (3, 0, 1, 2))
        return u(sv), u(sve)

    o1, o2 = jax.jit(xla_fn)(*args), jax.jit(f2_fn)(*args)
    np.testing.assert_allclose(np.asarray(o2[0]), np.asarray(o1[0]),
                               atol=5e-4)
    if has_pos:
        np.testing.assert_allclose(np.asarray(o2[1]), np.asarray(o1[1]),
                                   atol=5e-4)

    tgt = f(S, g, gp, L)

    def loss(fn, *a):
        sv, sve = fn(*a)
        l = jnp.mean((sv - tgt) ** 2)
        if has_pos:
            l = l + jnp.mean(sve ** 2)
        return l

    n = len(args)
    g1 = jax.jit(jax.grad(lambda *a: loss(xla_fn, *a),
                          argnums=tuple(range(n))))(*args)
    g2 = jax.jit(jax.grad(lambda *a: loss(f2_fn, *a),
                          argnums=tuple(range(n))))(*args)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_), atol=2e-5)


@pytest.mark.parametrize("mode", ["gated", "full", "wopos", "gated_sig"])
def test_lanes_train_matches_jnp(mode):
    """Stripe-LANE small-span kernel (ops/pallas_axial_lanes.py): at spans
    <= 16 with enough stripes the train path routes through lanes_attn_core;
    outputs/grads/stats must match the XLA path exactly (f32 interpret)."""
    import medt_tpu.ops.pallas_axial_lanes as lk

    calls = {}
    orig = lk.lanes_attn_core

    def wrapped(*a, **kw):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **kw)

    lk.lanes_attn_core = wrapped
    import medt_tpu.ops.axial_attention  # noqa: F401 (module under test)
    try:
        # n=8 x m=16 = 128 stripes == the lane admission threshold exactly
        ((l1, (o1, s1)), g1), ((l2, (o2, s2)), g2) = _train_pair(
            mode, out_planes=16, groups=8, span=16, n=8)
    finally:
        lk.lanes_attn_core = orig
    assert calls.get("n", 0) >= 1, "lanes kernel was not invoked"
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_train_layer_geometry_gp2():
    """Smallest group width the models use (gp=2 -> c=1 q/k channels)."""
    ((l1, (o1, _)), g1), ((l2, (o2, _)), g2) = _train_pair(
        "gated", out_planes=16, groups=8, span=16)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_admission_rejects_wide_gp_at_span64():
    """(gp=8, span=64) OOMs real scoped VMEM (measured 26.96M vs the 16M
    limit) despite passing the analytic estimate — the admission gate must
    reject it so the op falls back to the stripe-block kernel. The
    live-model flash geometries stay admitted."""
    from medt_tpu.ops.pallas_axial_lanes import flash_supported

    assert not flash_supported(64, 8, 8, 3584)   # the measured-OOM geometry
    assert flash_supported(64, 8, 4, 3584)       # MedT glob L1
    assert flash_supported(32, 8, 8, 1792)       # MedT glob L2

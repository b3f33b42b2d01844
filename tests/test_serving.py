"""Serving engine + HTTP endpoint.

The reference has no serving surface; these tests pin the framework's:
fixed-shape batching (padding semantics), dynamic micro-batching
(concurrent submits coalesce, results route back to the right caller),
sliding-window routing for oversized inputs, and the PNG-in/PNG-out HTTP
contract of cli/serve.py.
"""
import io
import json
import threading
import urllib.request

import numpy as np
import jax
import pytest

from medt_tpu.serving import InferenceEngine

SIZE = 32
BATCH = 4


@pytest.fixture(scope="module")
def engine():
    from medt_tpu.models import build_model

    model = build_model("axialunet", img_size=SIZE)
    x = np.zeros((1, SIZE, SIZE, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    eng = InferenceEngine("axialunet", SIZE, variables=variables,
                          batch_size=BATCH, max_wait_ms=20.0)
    yield eng
    eng.stop()


def _img(seed):
    return np.random.default_rng(seed).integers(
        0, 255, size=(SIZE, SIZE, 3)).astype(np.uint8)


def test_predict_batch_pads_partial_batches(engine):
    imgs = [_img(i) for i in range(BATCH + 2)]  # full batch + partial
    masks = engine.predict_batch(imgs)
    assert len(masks) == len(imgs)
    for m in masks:
        assert m.shape == (SIZE, SIZE)
        assert set(np.unique(m)).issubset({0, 1})
    # a partial chunk must score identically to the same image run alone
    solo = engine.predict_batch([imgs[-1]])[0]
    np.testing.assert_array_equal(masks[-1], solo)


def test_predict_batch_rejects_wrong_shape(engine):
    with pytest.raises(ValueError):
        engine.predict_batch([np.zeros((SIZE * 2, SIZE, 3), np.uint8)])


def test_uint8_matches_float(engine):
    """On-device /255 normalization == host-side to_float01."""
    img = _img(7)
    m_u8 = engine.predict_batch([img])[0]
    m_f32 = engine.predict_batch([img.astype(np.float32) / 255.0])[0]
    np.testing.assert_array_equal(m_u8, m_f32)


def test_sliding_window_route(engine):
    big = np.random.default_rng(3).integers(
        0, 255, size=(SIZE * 2, SIZE + 8, 3)).astype(np.uint8)
    mask = engine.predict(big)
    assert mask.shape == big.shape[:2]
    assert set(np.unique(mask)).issubset({0, 1})


def test_dynamic_batching_coalesces(engine):
    engine.start()
    before = engine.batches_run
    imgs = [_img(i) for i in range(BATCH)]
    futs = [engine.submit(im) for im in imgs]
    results = [f.result(timeout=60) for f in futs]
    # every caller gets its own image's mask (routing, not just completion)
    expected = engine.predict_batch(imgs)
    for got, want in zip(results, expected):
        np.testing.assert_array_equal(got, want)
    # 4 concurrent submits must NOT have run as 4 separate batches
    assert engine.batches_run - before <= 3


def test_priority_queue_order(engine):
    """A high-priority (lower number) submit overtakes a queued backlog of
    low-priority ones: it rides the first batch dispatched after it lands.

    The worker is parked inside a gated predict_batch while the backlog is
    queued, so the drain order is deterministic."""
    eng = InferenceEngine("axialunet", SIZE, variables=engine._variables,
                          batch_size=2, max_wait_ms=1.0)
    release, parked = threading.Event(), threading.Event()
    real = eng.predict_batch

    def gated(images):
        parked.set()
        assert release.wait(timeout=60)
        return real(images)

    eng.predict_batch = gated
    eng.start()
    try:
        order = []

        def track(tag):
            return lambda fut: order.append(tag)

        eng.submit(_img(0)).add_done_callback(track("blocker"))
        assert parked.wait(timeout=60)  # worker busy; queue now frozen
        for i in range(4):
            eng.submit(_img(i + 1), priority=5).add_done_callback(
                track(f"low{i}"))
        hi = eng.submit(_img(9), priority=0)
        hi.add_done_callback(track("hi"))
        release.set()
        hi.result(timeout=60)
        # first completion after the blocker must be the high-priority one,
        # despite 4 earlier-queued low-priority requests
        assert order[0] == "blocker" and order[1] == "hi"
    finally:
        eng.predict_batch = real
        eng.stop()


def test_http_endpoint(engine, tmp_path):
    from PIL import Image

    from medt_tpu.cli.serve import make_server

    server = make_server(engine, 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        # PNG in -> PNG mask out
        img = _img(11)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == (SIZE, SIZE)
        expected = engine.predict_batch([img])[0] * 255
        np.testing.assert_array_equal(out, expected)
    finally:
        server.shutdown()
        t.join()


def test_mesh_sharded_serving_matches_single_device(engine):
    """Data-parallel serving over an 8-device mesh: same masks as the
    single-device engine, inputs sharded over the 'data' axis, params
    replicated. Covers the batch path and the sliding-window tiler's
    in-jit sharding constraint."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    eng8 = InferenceEngine(
        "axialunet", SIZE, variables=engine._variables,
        batch_size=8, mesh=mesh)
    imgs = [_img(100 + i) for i in range(10)]  # full batch + partial
    expected = engine.predict_batch(imgs)
    got = eng8.predict_batch(imgs)
    for a, b in zip(got, expected):
        np.testing.assert_array_equal(a, b)

    big = np.random.default_rng(5).integers(
        0, 255, size=(SIZE * 2, SIZE + 8, 3)).astype(np.uint8)
    np.testing.assert_array_equal(eng8.predict(big), engine.predict(big))


def test_mesh_serving_rejects_indivisible_batch():
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError):
        InferenceEngine("axialunet", SIZE, variables={}, batch_size=6,
                        mesh=mesh)


def test_latency_stats(engine):
    eng = InferenceEngine("axialunet", SIZE, variables=engine._variables,
                          batch_size=2, max_wait_ms=1.0)
    eng.start()
    try:
        futs = [eng.submit(_img(i)) for i in range(4)]
        for f in futs:
            f.result(timeout=120)
        stats = eng.stats()
        assert stats["images_run"] == 4
        lat = stats["latency_ms"]
        assert lat["count"] == 4
        assert 0 <= lat["p50"] <= lat["p90"] <= lat["p99"]
    finally:
        eng.stop()


def test_queue_backpressure(engine):
    from medt_tpu.serving import QueueFullError

    eng = InferenceEngine("axialunet", SIZE, variables=engine._variables,
                          batch_size=2, max_wait_ms=1.0, max_queue=3)
    release, parked = threading.Event(), threading.Event()
    real = eng.predict_batch

    def gated(images):
        parked.set()
        assert release.wait(timeout=60)
        return real(images)

    eng.predict_batch = gated
    eng.start()
    try:
        futs = [eng.submit(_img(0))]
        assert parked.wait(timeout=60)  # worker busy; backlog builds
        for i in range(3):
            futs.append(eng.submit(_img(i + 1)))
        with pytest.raises(QueueFullError):
            eng.submit(_img(9))
        release.set()
        for f in futs:
            f.result(timeout=60)
        eng.submit(_img(5)).result(timeout=60)  # drained queue admits again
    finally:
        eng.predict_batch = real
        eng.stop()

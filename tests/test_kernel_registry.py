"""Kernel registry: recording, compile probes, graceful degradation.

Guards the round-2 failure class — a kernel that passes interpret-mode
parity but fails Mosaic lowering on the chip must (a) be caught by the
compile-smoke machinery and (b) degrade the op to its XLA path instead of
killing the program (VERDICT round 2, next #2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medt_tpu.ops import kernel_registry as kreg
from medt_tpu.ops.axial_attention import AxialAttention
from medt_tpu.ops.pallas_axial_lanes import lanes_supported


@pytest.fixture(autouse=True)
def _clean_registry():
    kreg.reset_disabled()
    yield
    kreg.reset_disabled()


def _lanes_geometry():
    # span 16, S=1024: admitted by the plain lanes family
    return kreg.Geometry(kreg.FAMILY_LANES, span=16, g=8, gp=4, S=1024,
                         train=True, has_pos=True)


def _attention_apply(train):
    """Shape-trace a lanes-admitted attention op; return recorded geos."""
    model = AxialAttention(in_planes=16, out_planes=32, span=16, groups=8,
                           axis="h", mode="gated", use_fused=True)
    x = jnp.zeros((64, 16, 16, 16), jnp.float32)  # S = 64*16 = 1024
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def fwd(v, x):
        return model.apply(v, x, train=train,
                           mutable=["batch_stats"] if train else False)

    return kreg.collect_geometries(fwd, variables, x)


def test_recording_collects_lanes_geometry():
    geos = _attention_apply(train=True)
    fams = {g.family for g in geos}
    assert kreg.FAMILY_LANES in fams, geos
    (geo,) = [g for g in geos if g.family == kreg.FAMILY_LANES]
    assert (geo.span, geo.g, geo.gp, geo.S) == (16, 8, 4, 1024)
    assert geo.train and geo.has_pos


def test_recording_is_off_outside_context():
    model = AxialAttention(in_planes=16, out_planes=32, span=16, groups=8,
                           use_fused=True)
    x = jnp.zeros((64, 16, 16, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    with kreg.recording() as rec:
        pass  # recording scope closed empty
    jax.eval_shape(lambda v, x: model.apply(v, x, train=True,
                                            mutable=["batch_stats"]),
                   variables, x)
    assert not rec


def test_probe_compiles_lanes_on_this_backend():
    ok, err = kreg.probe(_lanes_geometry())
    assert ok, err


def test_preflight_failure_disables_family_and_admission(monkeypatch):
    monkeypatch.setattr(kreg, "probe",
                        lambda geo: (False, "forced Mosaic failure"))
    geo = _lanes_geometry()
    report = kreg.preflight([geo])
    assert report[geo][0] is False
    assert not kreg.family_enabled(kreg.FAMILY_LANES)
    # admission now rejects the geometry the model would otherwise route
    assert not lanes_supported(16, 8, 4, 1024)


def test_disabled_family_degrades_to_xla_path():
    kreg.disable(kreg.FAMILY_LANES, "test")
    geos = _attention_apply(train=True)
    assert kreg.FAMILY_LANES not in {g.family for g in geos}

    # and the op still computes (XLA path), numerically matching the
    # kernel path it replaced
    model = AxialAttention(in_planes=16, out_planes=32, span=16, groups=8,
                           axis="h", mode="gated", use_fused=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(64, 16, 16, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out_xla, _ = model.apply(v := variables, x, train=True,
                             mutable=["batch_stats"])
    kreg.reset_disabled()
    out_kernel, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_kernel),
                               atol=2e-4, rtol=2e-4)


def test_preflight_fn_reports_and_disables(monkeypatch):
    monkeypatch.setattr(kreg, "probe", lambda geo: (False, "forced"))
    model = AxialAttention(in_planes=16, out_planes=32, span=16, groups=8,
                           use_fused=True)
    x = jnp.zeros((64, 16, 16, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    report = kreg.preflight_fn(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"]),
        variables, x)
    assert any(not ok for ok, _ in report.values())
    assert not kreg.family_enabled(kreg.FAMILY_LANES)


@pytest.mark.slow
def test_medt_512_admits_flash2_at_span_256():
    """The MoNuSeg-geometry model (medt_512 == reference mix_512,
    model_codes.py:1894-2096) must route its global-branch span-256
    attention through the flash2 family — the 1.7x / memory-fit win
    (BASELINE.md 512px row). A silent admission regression (budget edits,
    registry disables) would ship the XLA fallback; this pins it via a
    shape-only trace, no execution."""
    from medt_tpu.models import build_model
    from medt_tpu.training import adam_l2, init_state, train_step

    model = build_model("medt_512", use_fused=True)
    # shape-only: init at batch 1 (params), eval_shape the train step
    state = jax.eval_shape(
        lambda: init_state(model, adam_l2(1e-3), (1, 512, 512, 3)))
    rng_batch = {
        "image": jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32),
        "label": jax.ShapeDtypeStruct((1, 512, 512), jnp.int32),
    }
    with kreg.recording() as rec:
        jax.eval_shape(train_step, state, rng_batch)
        geos = set(rec)
    flash2 = {(g.family, g.span, g.train) for g in geos
              if g.family == kreg.FAMILY_FLASH2}
    assert (kreg.FAMILY_FLASH2, 256, True) in flash2, sorted(geos)


@pytest.mark.slow
def test_medt_512_eval_admits_flash2_not_stripe_at_span_256():
    """The EVAL path at the MoNuSeg geometry must also stream: the
    whole-(L, L)-tile stripe-eval kernel blows Mosaic's 16M scoped-VMEM
    limit at span 256 at ANY stripe block (measured 33-37M on v5e — the
    round-4 driver's eval512 HTTP-500), so fused_eval_supported rejects
    spans > 64 and the router sends the 512px global branch through
    flash2's forward instead. Pins both sides: flash2 recorded at span
    256 eval, stripe-eval NOT recorded there."""
    from medt_tpu.models import build_model

    model = build_model("medt_512", use_fused=True)
    x = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 3)), train=False))
    with kreg.recording() as rec:
        jax.eval_shape(lambda v, xx: model.apply(v, xx, train=False),
                       variables, x)
        geos = set(rec)
    fams_at_256 = {g.family for g in geos if g.span == 256}
    assert kreg.FAMILY_FLASH2 in fams_at_256, sorted(geos)
    assert kreg.FAMILY_EVAL not in fams_at_256, sorted(geos)

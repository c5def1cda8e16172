"""Guarded production mode: diagnostics emission, strict cross-check +
envelope detectors, and CPU-fallback splicing (the TPU-side fidelity
numbers live in PERF.md round 4 and bench.py's fidelity block; here the
machinery is proven on CPU, where production == exact f32 so the strict
verifier agrees bit-wise)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.vit import (
    VIT_BASE_16_224, init_params)
from transformer_explainability_tpu.explain.generator import (
    make_explain_fn, make_guarded_explain_fn, calibrate_envelope,
    DIAG_FIELDS, CHAOS_STATS, ENVELOPE_BOUNDS)

CFG = dataclasses.replace(VIT_BASE_16_224, img_size=32, embed_dim=64,
                          depth=3, num_heads=4, num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    idx = jnp.asarray([1, -1, 3, 0], jnp.int32)
    return params, imgs, idx


def test_diagnostics_emission(setup):
    """with_diagnostics returns the identical heatmap plus a finite
    (B, len(DIAG_FIELDS)) stats vector whose conservation readout ~ 1."""
    params, imgs, idx = setup
    plain = make_explain_fn(CFG, "transformer_attribution")
    diag_fn = make_explain_fn(CFG, "transformer_attribution",
                              with_diagnostics=True)
    want = np.asarray(plain(params, imgs, idx))
    heat, diag = diag_fn(params, imgs, idx)
    np.testing.assert_array_equal(np.asarray(heat), want)
    diag = np.asarray(diag)
    assert diag.shape == (4, len(DIAG_FIELDS))
    assert np.isfinite(diag).all()
    # r_sum: LRP conservation — seed one-hot sums to 1, "ours" rules
    # conserve; on CPU f32 the drift is rounding-level
    np.testing.assert_allclose(diag[:, 0], 1.0, atol=1e-2)
    # every chaos statistic evaluates finite on the diag matrix
    for name, fn in CHAOS_STATS.items():
        s = fn(diag.astype(np.float64))
        assert s.shape == (4,) and np.isfinite(s).all(), name


def test_diagnostics_rejected_off_method(setup):
    with pytest.raises(ValueError):
        fn = make_explain_fn(CFG, "rollout", with_diagnostics=True)
        fn(*setup)


def test_guarded_strict_cpu_agrees_no_flags(setup):
    """On CPU the production program IS exact f32, so the strict verifier
    agrees per-sample and nothing is flagged; output == production."""
    params, imgs, idx = setup
    plain = make_explain_fn(CFG, "transformer_attribution")
    guarded = make_guarded_explain_fn(CFG, mode="strict", return_info=True)
    heat, info = guarded(params, imgs, idx)
    assert not info["flagged"].any()
    assert (info["score"] > 0.9999).all()
    np.testing.assert_allclose(
        heat, np.asarray(plain(params, imgs, idx)), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_guarded_strict_flag_all_splices_cpu_fallback(setup):
    """agreement=2.0 flags every sample; the result must equal the exact-f32
    CPU program per sample (the guarantee path)."""
    params, imgs, idx = setup
    guarded = make_guarded_explain_fn(CFG, mode="strict", agreement=2.0,
                                      return_info=True)
    heat, info = guarded(params, imgs, idx)
    assert info["flagged"].all()
    assert info["score"].shape == (4,)
    exact = make_explain_fn(CFG, "transformer_attribution",
                            matmul_precision="float32")
    want = np.asarray(exact(params, imgs, idx))
    np.testing.assert_allclose(heat, want, rtol=1e-5, atol=1e-7)


def test_guarded_strict_n_valid_skips_pad_rows(setup):
    params, imgs, idx = setup
    guarded = make_guarded_explain_fn(CFG, mode="strict", agreement=2.0,
                                      return_info=True)
    heat, info = guarded(params, imgs, idx, n_valid=2)
    assert info["flagged"][:2].all() and not info["flagged"][2:].any()


def test_guarded_envelope_calibration(setup):
    """Envelope mode: bounds calibrated on the batch itself flag nothing;
    impossible bounds flag everything and splice the CPU fallback."""
    params, imgs, idx = setup
    diag_fn = make_explain_fn(CFG, "transformer_attribution",
                              with_diagnostics=True)
    _, diag = diag_fn(params, imgs, idx)
    bounds = calibrate_envelope(np.asarray(diag), margin=1.5)
    assert set(bounds) == set(DIAG_FIELDS)
    g = make_guarded_explain_fn(CFG, mode="envelope",
                                envelope_bounds=bounds, return_info=True)
    heat, info = g(params, imgs, idx)
    assert not info["flagged"].any()
    tight = {f: (np.inf, -np.inf) for f in DIAG_FIELDS}
    g2 = make_guarded_explain_fn(CFG, mode="envelope",
                                 envelope_bounds=tight, return_info=True)
    heat2, info2 = g2(params, imgs, idx)
    assert info2["flagged"].all()
    exact = make_explain_fn(CFG, "transformer_attribution",
                            matmul_precision="float32")
    np.testing.assert_allclose(heat2, np.asarray(exact(params, imgs, idx)),
                               rtol=1e-5, atol=1e-7)


def test_guarded_bad_mode_raises():
    with pytest.raises(ValueError):
        make_guarded_explain_fn(CFG, mode="nope")
    assert set(ENVELOPE_BOUNDS) == set(DIAG_FIELDS)


def test_guarded_envelope_defer_skips_fallback(setup):
    """fallback="defer" returns the fast heatmaps untouched and only marks
    flags (the async-verification serving policy)."""
    params, imgs, idx = setup
    plain = make_explain_fn(CFG, "transformer_attribution",
                            with_diagnostics=False)
    want = np.asarray(plain(params, imgs, idx))
    # bounds that flag EVERYTHING: with sync fallback the heatmaps would be
    # CPU re-runs; with defer they must be the fast program's output bitwise
    bounds = {f: (np.inf, -np.inf) for f in DIAG_FIELDS}
    env = make_guarded_explain_fn(CFG, mode="envelope",
                                  envelope_bounds=bounds,
                                  fallback="defer", return_info=True)
    heat, info = env(params, imgs, idx)
    assert info["flagged"].all()
    np.testing.assert_array_equal(heat, want)


def test_guarded_rejects_unknown_fallback(setup):
    with pytest.raises(ValueError):
        make_guarded_explain_fn(CFG, mode="envelope", fallback="asap")

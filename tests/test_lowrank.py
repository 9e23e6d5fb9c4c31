"""Truncated-SVD FC head compression (ops/lowrank.py + factored heads).

Fast R-CNN §3.1 "Truncated SVD for faster detection" (PAPERS.md): the
reference family's own deployment compression, rebuilt as a load/export
transform that composes with int8 serving quantization. Exactness is pinned
at full rank, accuracy at reduced rank on a trained checkpoint's AP, and
structure against the factored model's expected param tree.
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.models.multipath import build_model
from multipathnet_tpu.ops import lowrank

RNG = np.random.default_rng(13)


def test_factorize_kernel_full_rank_exact():
    w = RNG.standard_normal((96, 40)).astype(np.float32) * 0.07
    a, b = lowrank.factorize_kernel(w, 40)
    assert a.shape == (96, 40) and b.shape == (40, 40)
    assert np.allclose(a @ b, w, atol=1e-5)


def test_factorize_kernel_reduced_rank_is_best_approx():
    """Rank-t SVD is the optimal Frobenius approximation: reconstruction
    error must equal the tail singular values' energy."""
    w = RNG.standard_normal((64, 32)).astype(np.float32)
    t = 8
    a, b = lowrank.factorize_kernel(w, t)
    s = np.linalg.svd(w, compute_uv=False)
    err = np.linalg.norm(w - a @ b)
    assert abs(err - np.linalg.norm(s[t:])) < 1e-3, (err, s[t:])


def _svd_cfg(cfg, fc6_rank, fc7_rank, quant="none"):
    return cfg.replace(model=dataclasses.replace(
        cfg.model, fc6_rank=fc6_rank, fc7_rank=fc7_rank, head_quant=quant))


def _tiny_setup(fc6_rank, fc7_rank, quant="none"):
    cfg = preset("tiny")
    scfg = _svd_cfg(cfg, fc6_rank, fc7_rank, quant)
    model = build_model(cfg.model)
    smodel = build_model(scfg.model)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(RNG.uniform(5, 40, (2, 8, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(12.0)
    params = model.init(jax.random.key(0), images, rois)
    return cfg, scfg, model, smodel, params, images, rois


def test_factorize_head_params_matches_model_structure():
    """The transform must produce EXACTLY the tree a low-rank model expects
    (flax apply is strict about param paths/shapes)."""
    _, _, _, smodel, params, images, rois = _tiny_setup(32, 16)
    sparams = lowrank.factorize_head_params(params, 32, 16)
    assert lowrank.is_factored(sparams) and not lowrank.is_factored(params)
    expect = jax.eval_shape(
        lambda: smodel.init(jax.random.key(0), images, rois))
    got = {jax.tree_util.keystr(p): v.shape
           for p, v in jax.tree_util.tree_leaves_with_path(sparams)}
    want = {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expect)}
    assert got == want


def test_full_rank_factorization_preserves_scores():
    """At full rank the factorization is exact up to f32 SVD round-off plus
    one extra bf16 GEMM rounding — scores must track the unfactored model."""
    # tiny fc_dim=64: full rank for both families is 64
    cfg, scfg, model, smodel, params, _, rois = _tiny_setup(64, 64)
    sparams = lowrank.factorize_head_params(params, 64, 64)
    images = jnp.asarray(RNG.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    scores, deltas = model.apply(params, images, rois)
    s_scores, s_deltas = smodel.apply(sparams, images, rois)
    s_err = np.abs(np.asarray(scores - s_scores)).mean()
    s_mag = np.abs(np.asarray(scores)).mean() + 1e-9
    assert s_err / s_mag < 0.02, (s_err, s_mag)
    d_err = np.abs(np.asarray(deltas - s_deltas)).mean()
    d_mag = np.abs(np.asarray(deltas)).mean() + 1e-9
    assert d_err / d_mag < 0.05, (d_err, d_mag)


def test_detector_factorizes_and_quantizes_float_checkpoint():
    """Detector with an svd+int8 serving config on a full-rank FLOAT tree
    must factorize then quantize at load and stay finite/close on a scene."""
    from multipathnet_tpu.eval.detect import Detector

    cfg, scfg, model, smodel, params, _, _ = _tiny_setup(32, 16, quant="int8")
    b, p, s = 2, 16, 64
    images = RNG.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    hws = np.full((b, 2), float(s), np.float32)
    x1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    y1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    props = np.stack([x1, y1, x1 + 20, y1 + 20], -1)
    mask = np.ones((b, p), bool)

    det_f = Detector(model, params, cfg)
    det_s = Detector(smodel, params, scfg)  # float full-rank tree in
    of, os_ = det_f(images, hws, props, mask), det_s(images, hws, props, mask)
    assert set(of) == set(os_)
    assert np.isfinite(os_["scores"]).all() and np.isfinite(os_["boxes"]).all()


def test_bundle_export_factorizes(tmp_path):
    """save_bundle with an svd config must ship factored (and quantized)
    params so load is transform-free; load_detector must run them."""
    from multipathnet_tpu.eval.serving import load_bundle, load_detector, \
        save_bundle

    cfg, scfg, model, smodel, params, _, _ = _tiny_setup(32, 16, quant="int8")
    out = str(tmp_path / "bundle")
    save_bundle(out, scfg, params, quant="keep")
    _, _, bparams = load_bundle(out)
    assert lowrank.is_factored(bparams)
    det = load_detector(out)

    b, p, s = 2, 16, 64
    images = RNG.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    hws = np.full((b, 2), float(s), np.float32)
    props = np.tile(np.asarray([4, 4, 30, 30], np.float32), (b, p, 1))
    o = det(images, hws, props, np.ones((b, p), bool))
    assert np.isfinite(o["scores"]).all()


def test_factorize_quantized_tree_raises_value_error():
    """Re-exporting an int8 tree with SVD ranks must fail with a clear
    ValueError (not a bare assert, which vanishes under python -O)."""
    from multipathnet_tpu.ops.quant import quantize_head_params

    *_, params, _, _ = _tiny_setup(32, 16)
    qparams = quantize_head_params(params)
    with pytest.raises(ValueError, match="already int8-quantized"):
        lowrank.factorize_head_params(qparams, 32, 16)


def test_bundle_export_rejects_rank_mismatched_factored_tree(tmp_path):
    """A tree factored at DIFFERENT ranks than the config must fail at
    export with a named error, not ship a bundle that dies at load."""
    from multipathnet_tpu.eval.serving import save_bundle

    _, scfg, _, _, params, _, _ = _tiny_setup(32, 16)
    wrong = lowrank.factorize_head_params(params, 16, 8)  # cfg says 32/16
    with pytest.raises(ValueError, match="factored at rank"):
        save_bundle(str(tmp_path / "b"), scfg, wrong, quant="keep")
    # matching ranks pass the same check
    lowrank.check_factored_ranks(
        lowrank.factorize_head_params(params, 32, 16), 32, 16)


def test_eval_model_for_rebuilds_for_svd_only_config():
    """cli.common.eval_model_for must NOT return the trainer's full-rank
    float model when the config carries SVD ranks with quant disabled
    (r3 ADVICE medium: reported AP silently ignored the SVD config)."""
    from multipathnet_tpu.cli.common import eval_model_for

    class FakeTrainer:
        model = object()

    cfg = _svd_cfg(preset("tiny"), 32, 16, quant="none")
    m = eval_model_for(cfg, FakeTrainer())
    assert m is not FakeTrainer.model
    assert m.cfg.fc6_rank == 32 and m.cfg.fc7_rank == 16
    # no serving transform -> the trainer's model comes back untouched
    assert eval_model_for(preset("tiny"), FakeTrainer()) is FakeTrainer.model


@pytest.mark.slow
def test_reduced_rank_ap_matches_float_after_training(overfit_tiny):
    """Serving guarantee at the reduced-rank operating point: AP50 within
    0.1 of the full-rank float model on a trained checkpoint (the paper's
    full-scale result: ~0.3 mAP cost at fc6 t=1024 / fc7 t=256 — here ranks
    are the same 1/4 / 1/16 of full)."""
    from multipathnet_tpu.eval.tester import Tester

    fx = overfit_tiny
    cfg, state = fx["cfg"], fx["state"]
    float_ap = Tester(fx["trainer"].model, state.params, cfg, fx["loader"],
                      fx["props"], batch_size=2).test()
    scfg = _svd_cfg(cfg, 16, 4, quant="int8")
    smodel = build_model(scfg.model)
    svd_ap = Tester(smodel, state.params, scfg, fx["loader"], fx["props"],
                    batch_size=2).test()
    assert float_ap["AP50"] > 0.5, float_ap
    assert svd_ap["AP50"] > float_ap["AP50"] - 0.1, (float_ap, svd_ap)


def test_factorize_kernel_randomized_near_optimal():
    """The randomized range finder (export fast path for deep truncations)
    must land within a fraction of a percent of the exact truncated SVD's
    Frobenius error — on a realistic decaying spectrum AND on the
    worst-case flat spectrum of a pure Gaussian matrix. Also pins
    determinism (fixed seed) and the wide-matrix transpose path."""
    rng = np.random.default_rng(3)
    # decaying spectrum (trained-weight-like): low-rank signal + noise
    u = rng.standard_normal((512, 48)).astype(np.float32)
    v = rng.standard_normal((48, 160)).astype(np.float32)
    w = u @ v + 0.05 * rng.standard_normal((512, 160)).astype(np.float32)
    t = 32
    s = np.linalg.svd(w, compute_uv=False)
    opt = np.linalg.norm(s[t:])
    a, b = lowrank.factorize_kernel(w, t, method="randomized")
    err = np.linalg.norm(w - a @ b)
    assert err <= opt * 1.005, (err, opt)
    # flat spectrum (hardest case): still within a few percent
    wf = rng.standard_normal((512, 160)).astype(np.float32)
    sf = np.linalg.svd(wf, compute_uv=False)
    af, bf = lowrank.factorize_kernel(wf, t, method="randomized")
    errf = np.linalg.norm(wf - af @ bf)
    assert errf <= np.linalg.norm(sf[t:]) * 1.05, errf
    # deterministic for a fixed seed
    a2, b2 = lowrank.factorize_kernel(w, t, method="randomized")
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)
    # wide matrix routes through the transpose
    aw, bw = lowrank.factorize_kernel(w.T, t, method="randomized")
    assert aw.shape == (160, t) and bw.shape == (t, 512)
    assert np.linalg.norm(w.T - aw @ bw) <= opt * 1.005


def test_factorize_kernel_auto_routing():
    """auto = randomized only for deep truncations; shallow/full ranks stay
    exact (the full-rank exactness contract must never route randomized)."""
    w = RNG.standard_normal((96, 40)).astype(np.float32)
    # full rank through auto: bitwise-reproduces the exact path
    a_auto, b_auto = lowrank.factorize_kernel(w, 40, method="auto")
    a_ex, b_ex = lowrank.factorize_kernel(w, 40, method="exact")
    np.testing.assert_array_equal(a_auto, a_ex)
    np.testing.assert_array_equal(b_auto, b_ex)
    # deep truncation through auto == randomized (same seed)
    big = RNG.standard_normal((256, 128)).astype(np.float32)
    a1, b1 = lowrank.factorize_kernel(big, 16, method="auto")
    a2, b2 = lowrank.factorize_kernel(big, 16, method="randomized")
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)


def test_truncation_report_and_flat_spectrum_warning():
    """factorize_head_params must (a) fill `report` with per-kernel relative
    Frobenius truncation errors that match the directly computed ||W-AB||/||W||,
    (b) warn when a kernel's spectrum is too flat for the rank (the measured
    serving failure: near-init weights factor to AP 0.0 — lowrank.py
    TRUNCATION_WARN_REL_ERR), and (c) stay silent on a genuinely low-rank
    kernel at the same rank."""
    rng = np.random.default_rng(7)
    k, n, t = 96, 64, 8
    flat = rng.standard_normal((k, n)).astype(np.float32)          # flat
    lowr = (rng.standard_normal((k, t)) @
            rng.standard_normal((t, n))).astype(np.float32)        # rank-t
    bias = np.zeros(n, np.float32)

    def tree(w):
        return {"params": {"fc6_f0": {"kernel": w, "bias": bias}}}

    # flat spectrum at deep rank: warning fires, report matches direct err
    rep = {}
    with pytest.warns(UserWarning, match="too aggressive"):
        out = lowrank.factorize_head_params(tree(flat), t, 0, report=rep)
    a = out["params"]["fc6_f0_u"]["kernel"]
    b = out["params"]["fc6_f0"]["kernel"]
    direct = np.linalg.norm(flat - a @ b) / np.linalg.norm(flat)
    assert abs(rep["fc6_f0"] - direct) < 1e-3, (rep, direct)
    assert rep["fc6_f0"] > lowrank.TRUNCATION_WARN_REL_ERR

    # exactly-low-rank kernel at the same rank: near-zero error, no warning
    rep2 = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        lowrank.factorize_head_params(tree(lowr), t, 0, report=rep2)
    assert rep2["fc6_f0"] < 0.01, rep2

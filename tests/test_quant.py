"""Int8 FC-head quantization (ops/quant.py + Int8Dense serving path).

The scheme (per-output-channel static weights, per-row dynamic activations,
int32 accumulation) is a TPU serving optimization with no reference
counterpart — accuracy is pinned HERE against the float head, and speed on
hardware in docs/PERF.md / tests_tpu.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.models.multipath import build_model
from multipathnet_tpu.ops import quant

RNG = np.random.default_rng(11)


def test_quantize_weight_roundtrip():
    w = jnp.asarray(RNG.standard_normal((96, 40)) * 0.07, jnp.float32)
    w_i8, scale = quant.quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (40,)
    # symmetric per-column: reconstruction error bounded by scale/2 per elem
    rec = w_i8.astype(jnp.float32) * scale[None, :]
    assert np.all(np.abs(np.asarray(rec - w)) <= np.asarray(scale)[None, :] * 0.5 + 1e-9)
    # zero column stays zero with a defined scale
    w0 = w.at[:, 3].set(0.0)
    w_i8, scale = quant.quantize_weight(w0)
    assert np.all(np.asarray(w_i8[:, 3]) == 0) and float(scale[3]) > 0


def test_dense_int8_matches_float():
    x = jnp.asarray(RNG.standard_normal((64, 256)).clip(0) * 1.7, jnp.float32)
    w = jnp.asarray(RNG.standard_normal((256, 48)) * 0.05, jnp.float32)
    b = jnp.asarray(RNG.standard_normal((48,)), jnp.float32)
    ref = x @ w + b
    out = quant.dense_int8(x, *quant.quantize_weight(w), b)
    # int8 x int8 with 1% rows: relative error ~1/127 per operand
    err = np.abs(np.asarray(out - ref)).mean()
    mag = np.abs(np.asarray(ref)).mean()
    assert err / mag < 0.02, (err, mag)


def _tiny_pair():
    cfg = preset("tiny")
    qcfg = cfg.replace(model=dataclasses.replace(cfg.model, head_quant="int8"))
    model = build_model(cfg.model)
    qmodel = build_model(qcfg.model)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(RNG.uniform(5, 40, (2, 8, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(12.0)
    params = model.init(jax.random.key(0), images, rois)
    return cfg, qcfg, model, qmodel, params, images, rois


def test_quantize_head_params_matches_quant_model_structure():
    """The load transform must produce EXACTLY the tree a quant-mode model
    expects (flax apply is strict about param paths/shapes/dtypes)."""
    _, _, _, qmodel, params, images, rois = _tiny_pair()
    qparams = quant.quantize_head_params(params)
    expect = jax.eval_shape(
        lambda: qmodel.init(jax.random.key(0), images, rois))
    got_paths = {jax.tree_util.keystr(p): (v.shape, v.dtype)
                 for p, v in jax.tree_util.tree_leaves_with_path(qparams)}
    want_paths = {jax.tree_util.keystr(p): (v.shape, v.dtype)
                  for p, v in jax.tree_util.tree_leaves_with_path(expect)}
    assert got_paths == want_paths


def test_quant_scores_match_float():
    """Full-model forward: int8 head tracks the float head to ~1% relative
    logit error, which keeps post-softmax probabilities within 2e-2 when the
    softmax is NOT saturated (saturated logits amplify any numeric scheme's
    error — bf16's too — so the probe boosts weights only mildly)."""
    cfg, qcfg, model, qmodel, params, images, rois = _tiny_pair()
    # random-init logits are near-degenerate; scale the head weights up so
    # the comparison exercises real dynamic range (x2 per layer ~ x8 logits)
    import flax

    tree = flax.core.unfreeze(params)

    def boost(d):
        for k, v in d.items():
            if isinstance(v, dict):
                if k.startswith(("fc6_f", "fc7_f")) or k == "cls_bbox":
                    v["kernel"] = v["kernel"] * 2.0
                else:
                    boost(v)

    boost(tree)
    params = flax.core.freeze(tree) if hasattr(params, "unfreeze") else tree
    qparams = quant.quantize_head_params(params)

    images_r = jnp.asarray(RNG.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    scores, deltas = model.apply(params, images_r, rois)
    qscores, qdeltas = qmodel.apply(qparams, images_r, rois)
    s_err = np.abs(np.asarray(scores - qscores)).mean()
    s_mag = np.abs(np.asarray(scores)).mean() + 1e-9
    assert s_err / s_mag < 0.03, (s_err, s_mag)
    probs = jax.nn.softmax(scores, axis=-1)
    qprobs = jax.nn.softmax(qscores, axis=-1)
    assert np.abs(np.asarray(probs - qprobs)).max() < 2e-2, (
        np.abs(np.asarray(probs - qprobs)).max())
    d_err = np.abs(np.asarray(deltas - qdeltas)).mean()
    d_mag = np.abs(np.asarray(deltas)).mean() + 1e-9
    assert d_err / d_mag < 0.05, (d_err, d_mag)


def test_detector_autoquantizes_float_checkpoint():
    """Detector(head_quant=int8) on a float param tree must quantize at load
    and produce detections matching the float detector's on a real scene."""
    from multipathnet_tpu.eval.detect import Detector

    cfg, qcfg, model, qmodel, params, _, _ = _tiny_pair()
    b, p, s = 2, 16, 64
    images = RNG.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    hws = np.full((b, 2), float(s), np.float32)
    x1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    y1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    props = np.stack([x1, y1, x1 + 20, y1 + 20], -1)
    mask = np.ones((b, p), bool)

    det_f = Detector(model, params, cfg)
    det_q = Detector(qmodel, params, qcfg)  # float tree in, quantized inside
    of, oq = det_f(images, hws, props, mask), det_q(images, hws, props, mask)
    assert set(of) == set(oq)
    assert np.isfinite(oq["scores"]).all() and np.isfinite(oq["boxes"]).all()
    # scores of the float and int8 paths agree to quantization tolerance on
    # the detections both keep (NMS may reorder ULP-ties; compare top score)
    if of["valid"].any() and oq["valid"].any():
        assert abs(of["scores"].max() - oq["scores"].max()) < 3e-2


@pytest.mark.slow
def test_quantized_ap_matches_float_after_training(overfit_tiny):
    """Serving guarantee: int8 AP50 within 0.1 of the float model's on a
    trained checkpoint (the session-scoped synthetic overfit state)."""
    from multipathnet_tpu.eval.tester import Tester

    fx = overfit_tiny
    cfg, state = fx["cfg"], fx["state"]
    float_ap = Tester(fx["trainer"].model, state.params, cfg, fx["loader"],
                      fx["props"], batch_size=2).test()
    qcfg = cfg.replace(model=dataclasses.replace(cfg.model, head_quant="int8"))
    qmodel = build_model(qcfg.model)
    int8_ap = Tester(qmodel, state.params, qcfg, fx["loader"], fx["props"],
                     batch_size=2).test()
    assert float_ap["AP50"] > 0.5, float_ap
    assert int8_ap["AP50"] > float_ap["AP50"] - 0.1, (float_ap, int8_ap)


def test_pool_rois_quantized_matches_head_quantize():
    """r5 serving fast path: pool_rois_quantized (bias/relu + per-view int8
    emitted IN the Pallas pool kernels, roi_pallas._quant_view) must bit-match
    the XLA path (pool_rois -> relu(x + skip_bias) -> quantize_rows), and the
    int8 head must score both inputs identically."""
    from multipathnet_tpu.models.multipath import MultiPathNet

    cfg = preset("tiny")
    qm = dataclasses.replace(cfg.model, head_quant="int8", roi_impl="pallas")
    qmodel = build_model(qm)
    fmodel = build_model(dataclasses.replace(qm, head_quant="none"))
    # 2 images x 3 ROIs: 24 views = 3 tile-8 grid steps — still rotates the
    # double-buffered DMA slots, at half the interpret-mode cost of the
    # original 6-ROI shape (~30 s of the warm suite, r5 suite-time pass)
    images = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)), jnp.float32)
    rois = jnp.asarray(RNG.uniform(4, 30, (2, 3, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(14.0)
    params = fmodel.init(jax.random.key(2), images, rois)
    qparams = quant.quantize_head_params(params)

    # jitted: eager interpret-mode Pallas re-dispatches the whole kernel
    # per run (~30 s warm before the r5 suite-time pass); compiled, the
    # interpret lowering lands in the persistent XLA cache
    feats = jax.jit(lambda p, im: qmodel.apply(
        p, im, method=MultiPathNet.features))(qparams, images)
    pooled = jax.jit(lambda p, ft, rr: qmodel.apply(
        p, ft, rr, (64, 64), method=MultiPathNet.pool_rois))(
            qparams, feats, rois)
    bias = qparams["params"]["head"]["skip_bias"]
    pq, ps = jax.jit(lambda p, ft, rr, bi: qmodel.apply(
        p, ft, rr, (64, 64), bi,
        method=MultiPathNet.pool_rois_quantized))(qparams, feats, rois, bias)
    assert pq.dtype == jnp.int8 and ps.dtype == jnp.float32
    b, f, r = pooled.shape[:3]
    assert ps.shape == (b, f, r, 1)

    dt = jnp.dtype(qm.dtype)
    x = jax.nn.relu(pooled.astype(dt) + bias.astype(dt))
    xq, xs = quant.quantize_rows(x.reshape(b, f, r, -1))
    np.testing.assert_array_equal(np.asarray(pq).reshape(b, f, r, -1),
                                  np.asarray(xq))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(xs))

    s1, d1 = qmodel.apply(qparams, pooled, method=MultiPathNet.predict_rois)
    s2, d2 = qmodel.apply(qparams, pq, method=MultiPathNet.predict_rois,
                          pooled_scale=ps)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_detect_batch_uses_quantized_pool_and_matches():
    """detect_batch routes int8+pallas through the quantized pool emission;
    its detections must match the int8 pyramid-impl path (same pooling math,
    different kernel route) to quantization-noise tolerance."""
    from multipathnet_tpu.eval.detect import Detector

    cfg = preset("tiny")
    qcfg_pal = cfg.replace(model=dataclasses.replace(
        cfg.model, head_quant="int8", roi_impl="pallas"))
    qcfg_pyr = cfg.replace(model=dataclasses.replace(
        cfg.model, head_quant="int8", roi_impl="pyramid"))
    fmodel = build_model(dataclasses.replace(qcfg_pal.model,
                                             head_quant="none"))
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois0 = jnp.asarray([[[4, 4, 24, 24]]], jnp.float32)
    params = fmodel.init(jax.random.key(3), images, rois0)

    b, p, s = 2, 8, 64
    imgs = RNG.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
    hws = np.full((b, 2), float(s), np.float32)
    x1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    y1 = RNG.uniform(0, 30, (b, p)).astype(np.float32)
    props = np.stack([x1, y1, x1 + 22, y1 + 22], -1)
    mask = np.ones((b, p), bool)

    det_pal = Detector(build_model(qcfg_pal.model), params, qcfg_pal)
    det_pyr = Detector(build_model(qcfg_pyr.model), params, qcfg_pyr)
    o1, o2 = det_pal(imgs, hws, props, mask), det_pyr(imgs, hws, props, mask)
    assert np.isfinite(o1["scores"]).all()
    if o1["valid"].any() and o2["valid"].any():
        assert abs(o1["scores"].max() - o2["scores"].max()) < 3e-2

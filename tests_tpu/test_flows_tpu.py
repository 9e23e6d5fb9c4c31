"""End-to-end flows on the chip: detect graph, train step, max-mode parity.

Small shapes (256-320 px canvases, ResNet-18/VGG trunks) keep cold compiles
bounded; the persistent cache makes warm re-runs ~seconds per test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.eval.detect import detect_batch, score_batch
from multipathnet_tpu.models.multipath import build_model


def device_params(model, s):
    """On-device random param fill (no 2 GB host transfer — bench.py trick).

    BN running variances must be filled POSITIVE: a signed-normal fill gives
    negative variances and rsqrt(neg) NaNs the whole trunk (r3 tier failure
    on the ResNet presets)."""
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.key(0), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, 1, 4))))
    flat, td = jax.tree_util.tree_flatten_with_path(shapes)
    ks = list(jax.random.split(jax.random.key(1), len(flat)))
    def fill(k, path, l):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        x = jax.random.normal(k, l.shape, l.dtype) * 0.02
        if any("var" in n for n in names):
            return jnp.abs(x) + 1.0
        return x
    return jax.tree.unflatten(td, [fill(k, p, l)
                                   for k, (p, l) in zip(ks, flat)])


def detect_inputs(rng, b, p, s):
    images = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    src_hws = np.full((b, 2), float(s), np.float32)
    x1 = rng.uniform(0, s * 0.6, (b, p)).astype(np.float32)
    y1 = rng.uniform(0, s * 0.6, (b, p)).astype(np.float32)
    w = rng.uniform(10, s * 0.3, (b, p)).astype(np.float32)
    h = rng.uniform(10, s * 0.3, (b, p)).astype(np.float32)
    proposals = np.stack([x1, y1, x1 + w, y1 + h], -1)
    return (jnp.asarray(images), jnp.asarray(src_hws),
            jnp.asarray(proposals), jnp.ones((b, p), jnp.bool_))


def test_detect_batch_finite_and_chunk_invariant(rng):
    """The production detect graph on-chip: final detections finite, and the
    SequentialSplitBatch analog (roi_chunk) does not change the CONTINUOUS
    pre-NMS scores/boxes on the chunked (pyramid) implementation. The
    invariance is asserted at the score_batch boundary (the reference
    ImageDetect boundary): each ROI's pooled features + head pass are
    row-independent, so chunk size must not change them beyond compiled
    bf16-GEMM retiling noise; NMS downstream legitimately turns ULP ties
    into discrete differences and is only checked for finiteness."""
    b, p, s = 2, 192, 256
    base = preset("multipath_resnet18_integral")
    outs = {}
    inputs = detect_inputs(np.random.default_rng(3), b, p, s)
    for chunk in (64, 192):
        cfg = base.replace(
            model=dataclasses.replace(base.model, roi_impl="pyramid"),
            data=dataclasses.replace(base.data, image_size=(s, s),
                                     max_proposals=p),
            eval=dataclasses.replace(base.eval, roi_chunk=chunk))
        model = build_model(cfg.model)
        if "params" not in outs:
            outs["params"] = device_params(model, s)
        sf = jax.jit(lambda pa, im, hw, pr, _m=model, _c=cfg:
                     score_batch(pa, _m, _c, im, hw, pr))
        bx, pb = sf(outs["params"], *inputs[:3])
        outs[chunk] = (np.asarray(bx), np.asarray(pb))
        if chunk == 192:
            df = jax.jit(lambda pa, im, hw, pr, pm, _m=model, _c=cfg:
                         detect_batch(pa, _m, _c, im, hw, pr, pm))
            dets = df(outs["params"], *inputs)
            for k in ("boxes", "scores", "classes", "valid"):
                assert np.isfinite(
                    np.asarray(dets[k], np.float32)).all(), k
    # probs are post-softmax f32 in [0,1]: absolute tolerance covers bf16
    # pooled-feature retiling noise through the heads. boxes are decoded in
    # original pixel coords (<= s): relative-to-canvas tolerance.
    np.testing.assert_allclose(outs[64][1], outs[192][1], atol=2e-3,
                               err_msg="chunk variance in probs")
    np.testing.assert_allclose(outs[64][0], outs[192][0], atol=s * 2e-3,
                               err_msg="chunk variance in boxes")


def test_int8_head_matches_float_on_chip(rng):
    """The int8 serving path (ops/quant.py), COMPILED on the chip: the
    quantized head's post-softmax probabilities track the bf16 head's on the
    production Pallas detect graph. CPU tests pin the scheme's math
    (tests/test_quant.py); this pins the Mosaic/MXU int8 lowering — a
    regression in int8 dot_general or in the single-pass pooled-tensor
    quantization (docs/PERF.md r3: per-slice quantization silently lost the
    entire win) surfaces here, not in the driver's bench."""
    from multipathnet_tpu.ops.quant import quantize_head_params

    b, p, s = 2, 192, 256
    base = preset("multipath_resnet18_integral")
    inputs = detect_inputs(np.random.default_rng(7), b, p, s)
    outs = {}
    params = None
    for hq in ("none", "int8"):
        cfg = base.replace(
            model=dataclasses.replace(base.model, head_quant=hq),
            data=dataclasses.replace(base.data, image_size=(s, s),
                                     max_proposals=p))
        model = build_model(cfg.model)
        if params is None:
            params = device_params(model, s)
        pa = params if hq == "none" else jax.jit(quantize_head_params)(params)
        sf = jax.jit(lambda pa, im, hw, pr, _m=model, _c=cfg:
                     score_batch(pa, _m, _c, im, hw, pr))
        bx, pb = sf(pa, *inputs[:3])
        outs[hq] = (np.asarray(bx), np.asarray(pb))
    assert np.isfinite(outs["int8"][0]).all()
    assert np.isfinite(outs["int8"][1]).all()
    # random-weight probs are diffuse (far from softmax saturation): int8
    # quantization error stays within a few e-2 absolute on probabilities
    np.testing.assert_allclose(outs["int8"][1], outs["none"][1], atol=3e-2)
    np.testing.assert_allclose(outs["int8"][0], outs["none"][0], atol=s * 3e-2)


def test_windowed_max_equals_direct_on_chip(rng):
    """r3 windowed exact-max vs the direct oracle, ON the chip, in the
    level-0 (bit-exact) regime: boxes <= 7 cells at the finest stride-4
    level (28 px)."""
    base = preset("multipath_vgg16_reference")
    kw = dict(foveal_scales=(1.0,), dtype="float32", num_classes=81)
    img = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
    x1 = rng.uniform(0, 180, (48, 1)).astype(np.float32)
    y1 = rng.uniform(0, 180, (48, 1)).astype(np.float32)
    rois = np.concatenate(
        [x1, y1, x1 + rng.uniform(10, 27, (48, 1)).astype(np.float32),
         y1 + rng.uniform(10, 27, (48, 1)).astype(np.float32)], 1)[None]
    outs = {}
    params = None
    for impl in ("direct", "pyramid"):
        cfg = base.replace(model=dataclasses.replace(
            base.model, roi_impl=impl, **kw))
        m = build_model(cfg.model)
        if params is None:
            params = device_params(m, 256)
        f = jax.jit(lambda pa, im, r, _m=m: _m.apply(pa, im, r))
        s, d = f(params, jnp.asarray(img), jnp.asarray(rois))
        outs[impl] = (np.asarray(s), np.asarray(d))
    np.testing.assert_array_equal(outs["pyramid"][0], outs["direct"][0])
    np.testing.assert_array_equal(outs["pyramid"][1], outs["direct"][1])


def test_train_step_frozen_params_bit_identical(rng):
    """One compiled train step (Pallas forward + windowed backward) on the
    chip: loss finite, frozen trunk stages bit-identical, unfrozen moved."""
    from multipathnet_tpu.train.loop import Trainer
    from tools.prof_train import make_batch

    cfg = preset("multipath_vgg16_batched")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=(256, 256),
                                 max_proposals=128, rois_per_image=16),
        # warmup_steps=0: the default 500-step linear warmup starts at LR
        # exactly 0.0, so a single step from init moves nothing (r3 tier
        # failure) — the "unfrozen params moved" assertion needs LR > 0.
        train=dataclasses.replace(cfg.train, batch_size=2,
                                  freeze_backbone_stages=2,
                                  warmup_steps=0))
    tr = Trainer(cfg)
    state = tr.init_state(0)
    batch = make_batch(np.random.default_rng(0), B=2, P=128, G=8, size=256)
    before = jax.tree.map(np.asarray, state.params)
    state, m = tr._step(state, tr.shard_batch(batch))
    loss = float(m["loss"])
    assert np.isfinite(loss)
    after = jax.tree.map(np.asarray, state.params)
    bb_b = before["params"]["backbone"]
    bb_a = after["params"]["backbone"]
    frozen = [k for k in bb_b if k.startswith(("conv1_", "conv2_"))]
    moved = [k for k in bb_b if k.startswith(("conv4_", "conv5_"))]
    assert frozen and moved
    for k in frozen:
        np.testing.assert_array_equal(bb_b[k]["kernel"], bb_a[k]["kernel"])
    assert any(
        np.abs(bb_b[k]["kernel"].astype(np.float32)
               - bb_a[k]["kernel"].astype(np.float32)).max() > 0
        for k in moved)


def test_svd_factored_head_on_chip(rng):
    """The truncated-SVD serving path (ops/lowrank.py), COMPILED on the
    chip. Two contracts: (a) FULL-rank float factorization reproduces the
    unfactored head's boxes/probabilities to bf16 tolerance (pins the
    Mosaic lowering of the factor-GEMM chain — CPU tests pin the math);
    (b) the full serving composition (SVD + int8, the bench headline
    config) stays within the same few-e-2 envelope as plain int8 — the
    rank-t intermediate's per-row requantization adds one quantization
    pass, not a new error regime. Reduced-rank ACCURACY is a property of
    trained weights (random kernels have flat spectra), pinned on trained
    checkpoints in PERF.md 'SVD serving', not here."""
    from multipathnet_tpu.ops.lowrank import factorize_head_params
    from multipathnet_tpu.ops.quant import quantize_head_params

    b, p, s = 2, 192, 256
    fc, red = 256, 128
    base = preset("multipath_resnet18_integral")
    inputs = detect_inputs(np.random.default_rng(11), b, p, s)
    outs = {}
    params = None
    full = fc  # full rank: fc6 min(7*7*red, fc) = fc; fc7 min(fc, fc) = fc
    # Plain int8-vs-float on chip is already pinned by
    # test_int8_head_matches_float_on_chip — compiling that 4th full-model
    # config here only bought a finiteness check for ~3 min of chip
    # compile, so it was dropped (r4 suite-time pass).
    for tag, hq, rank in (("float", "none", 0),
                          ("svd", "none", full),
                          ("int8_svd", "int8", full)):
        cfg = base.replace(
            model=dataclasses.replace(base.model, head_quant=hq,
                                      fc_dim=fc, skip_reduce_dim=red,
                                      fc6_rank=rank, fc7_rank=rank),
            data=dataclasses.replace(base.data, image_size=(s, s),
                                     max_proposals=p))
        model = build_model(cfg.model)
        if params is None:
            params = device_params(model, s)
        pa = params
        if rank:
            pa = factorize_head_params(jax.device_get(pa), rank, rank)
        if hq == "int8":
            pa = jax.jit(quantize_head_params)(pa)
        sf = jax.jit(lambda pa, im, hw, pr, _m=model, _c=cfg:
                     score_batch(pa, _m, _c, im, hw, pr))
        bx, pb = sf(pa, *inputs[:3])
        outs[tag] = (np.asarray(bx), np.asarray(pb))

    for tag in ("svd", "int8_svd"):
        assert np.isfinite(outs[tag][0]).all(), tag
        assert np.isfinite(outs[tag][1]).all(), tag
    # (a) full-rank float factorization == float head (bf16 rounding only)
    np.testing.assert_allclose(outs["svd"][1], outs["float"][1], atol=5e-3)
    np.testing.assert_allclose(outs["svd"][0], outs["float"][0], atol=s * 5e-3)
    # (b) SVD+int8 tracks float like plain int8 does (same envelope)
    np.testing.assert_allclose(outs["int8_svd"][1], outs["float"][1],
                               atol=4e-2)
    np.testing.assert_allclose(outs["int8_svd"][0], outs["float"][0],
                               atol=s * 4e-2)

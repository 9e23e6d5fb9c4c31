"""Model assembly + sampler + transforms + detect path (tiny preset, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.data import sampler as S
from multipathnet_tpu.data import transforms as T
from multipathnet_tpu.models.multipath import build_model
from jitu import japply, jinit

RNG = np.random.default_rng(4)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = preset("tiny")
    model = build_model(cfg.model)
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray(RNG.uniform(5, 40, (2, 8, 4)), jnp.float32)
    rois = rois.at[..., 2:].add(10.0)
    params = jinit(model, jax.random.key(0), images, rois)
    return cfg, model, params


def test_forward_shapes(tiny_model):
    cfg, model, params = tiny_model
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[[4, 4, 30, 30], [10, 10, 50, 44]]] * 2, jnp.float32)
    scores, deltas = japply(model, params, images, rois)
    k = len(cfg.model.integral_thresholds)
    c = cfg.model.num_classes
    assert scores.shape == (2, 2, k, c)
    assert deltas.shape == (2, 2, 4 * c)
    assert scores.dtype == jnp.float32
    assert np.isfinite(np.asarray(scores)).all()


def test_forward_jit_and_grad(tiny_model):
    cfg, model, params = tiny_model
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[[4, 4, 30, 30]]], jnp.float32)

    @jax.jit
    def loss(p):
        s, d = model.apply(p, images, rois)
        return (s.sum() + d.sum()).astype(jnp.float32)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # trunk must receive gradient through ROI pooling
    gsum = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert gsum > 0


def test_backbone_stride_contract():
    from multipathnet_tpu.models.backbones import REGISTRY, get_backbone

    for name in REGISTRY:
        bb = get_backbone(name, jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        params = jinit(bb, jax.random.key(0), x)
        feats = japply(bb, params, x)
        for lvl, stride in bb.feature_strides.items():
            assert feats[lvl].shape[1] == 64 // stride, (name, lvl)


def test_vanilla_fastrcnn_config():
    cfg = preset("tiny")
    mc = cfg.model.__class__(**{**cfg.model.__dict__,
                                "foveal_scales": (1.0,),
                                "skip_levels": ("c5",),
                                "integral_thresholds": (0.5,)})
    model = build_model(mc)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[[4, 4, 30, 30]]], jnp.float32)
    params = jinit(model, jax.random.key(0), images, rois)
    scores, deltas = japply(model, params, images, rois)
    assert scores.shape == (1, 1, 1, mc.num_classes)


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

def _mk_scene():
    gt = jnp.asarray([[10, 10, 30, 30], [40, 40, 60, 60], [0, 0, 0, 0]],
                     jnp.float32)
    gt_cls = jnp.asarray([1, 2, 0], jnp.int32)
    gt_mask = jnp.asarray([True, True, False])
    props = []
    for (x1, y1, x2, y2) in [(10, 10, 30, 30), (12, 12, 32, 32),
                             (38, 42, 58, 62)]:
        props.append([x1, y1, x2, y2])  # high-IoU
    for _ in range(13):
        x1, y1 = RNG.uniform(0, 40, 2)
        props.append([x1, y1, x1 + 8, y1 + 8])  # mostly bg
    props = jnp.asarray(props, jnp.float32)
    mask = jnp.ones(16, bool)
    return props, mask, gt, gt_cls, gt_mask


def test_sampler_semantics():
    props, mask, gt, gt_cls, gt_mask = _mk_scene()
    out = S.sample_rois(jax.random.key(1), props, mask, gt, gt_cls, gt_mask,
                        rois_per_image=16, fg_fraction=0.25)
    out = jax.tree.map(np.asarray, out)
    fg = out.is_fg & out.valid
    bg = ~out.is_fg & out.valid
    assert fg.sum() >= 2  # GT in pool guarantees fg
    assert np.all(out.max_iou[fg] >= 0.5)
    assert np.all(out.matched_class[fg] >= 1)
    assert np.all(out.matched_class[~fg] == 0)
    if bg.any():
        assert np.all(out.max_iou[bg] < 0.5)
        assert np.all(out.max_iou[bg] >= 0.1)
    # fg slots: decoding targets recovers the matched GT box
    from multipathnet_tpu.ops import boxes as B

    dec = np.asarray(B.decode(jnp.asarray(out.rois), jnp.asarray(out.bbox_targets),
                              stds=(0.1, 0.1, 0.2, 0.2)))
    gtn = np.asarray(gt)
    for i in np.nonzero(fg)[0]:
        d = np.abs(gtn - dec[i]).sum(-1).min()
        assert d < 1e-2, f"fg slot {i} target does not decode to a GT box"


def test_sampler_no_gt_image():
    props, mask, gt, gt_cls, _ = _mk_scene()
    out = S.sample_rois(jax.random.key(2), props, mask, gt, gt_cls,
                        jnp.zeros(3, bool), rois_per_image=16)
    out = jax.tree.map(np.asarray, out)
    assert not (out.is_fg & out.valid).any()  # nothing can be fg
    assert np.all(out.matched_class[out.valid] == 0)


def test_sampler_deterministic_and_batched():
    props, mask, gt, gt_cls, gt_mask = _mk_scene()
    a = S.sample_rois(jax.random.key(3), props, mask, gt, gt_cls, gt_mask)
    b = S.sample_rois(jax.random.key(3), props, mask, gt, gt_cls, gt_mask)
    np.testing.assert_array_equal(np.asarray(a.rois), np.asarray(b.rois))
    batch = S.sample_batch(
        jax.random.key(4),
        jnp.stack([props] * 3), jnp.stack([mask] * 3), jnp.stack([gt] * 3),
        jnp.stack([gt_cls] * 3), jnp.stack([gt_mask] * 3),
        rois_per_image=8,
    )
    assert batch.rois.shape == (3, 8, 4)
    # different per-image keys -> different draws (almost surely)
    assert not np.array_equal(np.asarray(batch.rois[0]),
                              np.asarray(batch.rois[1]))


def test_integral_labels():
    mc = np.asarray([3, 2, 1], np.int32)
    iou = np.asarray([0.72, 0.55, 0.3], np.float32)
    fg = np.asarray([True, True, False])
    lab = np.asarray(S.integral_labels(jnp.asarray(mc), jnp.asarray(iou),
                                       jnp.asarray(fg),
                                       (0.5, 0.55, 0.6, 0.65, 0.7, 0.75)))
    np.testing.assert_array_equal(lab[0], [3, 3, 3, 3, 3, 0])  # iou .72
    np.testing.assert_array_equal(lab[1], [2, 2, 0, 0, 0, 0])  # iou .55
    np.testing.assert_array_equal(lab[2], [0, 0, 0, 0, 0, 0])  # bg


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def test_resize_to_canvas_scale_and_mask():
    img = np.full((40, 20, 3), 255, np.uint8)
    canvas, scale = T.resize_to_canvas(jnp.asarray(img), (64, 64))
    canvas, scale = np.asarray(canvas), float(scale)
    assert canvas.shape == (64, 64, 3)
    assert abs(scale - 1.6) < 1e-6  # min(64/40, 64/20)
    # valid region ~ (64, 32); beyond must be zeroed
    assert np.abs(canvas[:, 33:]).max() == 0
    assert np.abs(canvas[:60, :30]).max() > 0


def test_resize_respects_src_hw_padding():
    raw = np.zeros((64, 64, 3), np.uint8)
    raw[:40, :20] = 200  # valid extent 40x20, rest is pad
    c1, s1 = T.resize_to_canvas(jnp.asarray(raw), (64, 64), src_hw=(40, 20))
    assert abs(float(s1) - 1.6) < 1e-6
    assert np.abs(np.asarray(c1)[:, 33:]).max() == 0


def test_prereduce_equals_reference_concat_reduce():
    """The TPU layout (per-level 1x1 reduce on trunk maps -> pool -> sum)
    must equal the reference layout (pool raw maps -> concat -> 1x1 reduce):
    pooling is linear, so the two commute (models/heads.py docstring)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.backbones import get_backbone
    from multipathnet_tpu.models.multipath import MultiPathNet, build_model
    from multipathnet_tpu.ops import roi as roi_ops

    cfg = preset("tiny").model
    # dense topology: this test pins the pre-reduce ALGEBRA (every view x
    # every level); the view-level topology has its own test below
    cfg = dataclasses.replace(cfg, roi_impl="direct", train_roi_impl="direct",
                              dtype="float32", foveal_topology="dense")
    model = build_model(cfg)
    rng = jax.random.key(3)
    images = jax.random.uniform(rng, (2, 64, 64, 3))
    rois = jnp.asarray([[[4, 4, 40, 40], [8, 16, 30, 60]]] * 2, jnp.float32)
    params = jinit(model, jax.random.key(0), images, rois)

    # new path: reduced features -> pooled sum (+ bias + relu as in the head)
    feats = japply(model, params, images, method=MultiPathNet.features)
    pooled_new = japply(model, params, feats, rois, (64, 64),
                        method=MultiPathNet.pool_rois)
    bias = params["params"]["head"]["skip_bias"]
    new = jax.nn.relu(pooled_new + bias)

    # reference path: pool RAW trunk maps, concat levels, 1x1 reduce, relu
    bb = get_backbone(cfg.backbone, jnp.float32)
    raw = japply(bb, {"params": params["params"]["backbone"]}, images)
    strides = bb.feature_strides
    scales = {l: 1.0 / strides[l] for l in cfg.skip_levels}

    def pool_raw(*args):
        f_b = dict(zip(cfg.skip_levels, args[:-1]))
        return roi_ops.multilevel_foveal_roi_features(
            f_b, args[-1], scales=scales, foveal_factors=cfg.foveal_scales,
            image_hw=(64, 64), output_size=cfg.roi_output_size,
            samples_per_bin=cfg.roi_samples_per_bin, combine="concat")

    raw_pooled = jax.jit(jax.vmap(pool_raw))(
        *[raw[l] for l in cfg.skip_levels], rois)  # (B,F,R,G,G,sumC)
    w = jnp.concatenate(
        [params["params"][f"reduce_{l}"]["kernel"][0, 0]
         for l in cfg.skip_levels], axis=0)  # (sum_C, RD)
    ref = jax.nn.relu(raw_pooled @ w + bias)

    assert new.shape == ref.shape
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_roi_mode_max_reference_path():
    """roi_mode='max' (reference-exact inn.ROIPooling semantics): pools RAW
    trunk maps with integer-bin max, concats, THEN 1x1-reduces — verified
    against a manual oracle composition."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.backbones import get_backbone
    from multipathnet_tpu.models.multipath import MultiPathNet, build_model
    from multipathnet_tpu.ops import roi as roi_ops

    cfg = preset("tiny").model
    cfg = dataclasses.replace(cfg, roi_mode="max", roi_impl="direct",
                              train_roi_impl="direct", dtype="float32",
                              foveal_topology="dense")
    model = build_model(cfg)
    rng = jax.random.key(5)
    images = jax.random.uniform(rng, (1, 64, 64, 3))
    rois = jnp.asarray([[[4, 4, 40, 40], [8, 16, 30, 60]]], jnp.float32)
    params = jinit(model, jax.random.key(0), images, rois)
    scores, deltas = japply(model, params, images, rois)
    assert np.all(np.isfinite(np.asarray(scores)))
    assert np.all(np.isfinite(np.asarray(deltas)))

    # oracle: raw feats -> exact_max pool -> concat -> 1x1 reduce
    feats = japply(model, params, images, method=MultiPathNet.features)
    bb = get_backbone(cfg.backbone, jnp.float32)
    raw = japply(bb, {"params": params["params"]["backbone"]}, images)
    # in max mode features() must return RAW maps
    for l in cfg.skip_levels:
        np.testing.assert_array_equal(np.asarray(feats[l]), np.asarray(raw[l]))

    pooled = japply(model, params, feats, rois, (64, 64),
                    method=MultiPathNet.pool_rois)
    scales = {l: 1.0 / bb.feature_strides[l] for l in cfg.skip_levels}
    want_cat = jax.jit(jax.vmap(lambda *a: roi_ops.multilevel_foveal_roi_features(
        dict(zip(cfg.skip_levels, a[:-1])), a[-1], scales=scales,
        foveal_factors=cfg.foveal_scales, image_hw=(64, 64),
        output_size=cfg.roi_output_size, mode="exact_max",
        combine="concat")))(*[raw[l] for l in cfg.skip_levels], rois)
    off = 0
    want = None
    for l in cfg.skip_levels:
        c_l = raw[l].shape[-1]
        w = params["params"][f"reduce_{l}"]["kernel"][0, 0]
        part = want_cat[..., off:off + c_l] @ w
        want = part if want is None else want + part
        off += c_l
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_caffe_preprocess():
    """caffe_bgr: BGR order, 0-255 mean-pixel subtraction, no std."""
    import jax.numpy as jnp

    from multipathnet_tpu.data import transforms as T

    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 200  # R
    img[..., 1] = 150  # G
    img[..., 2] = 100  # B
    out = np.asarray(T.normalize(jnp.asarray(img), "caffe_bgr"))
    np.testing.assert_allclose(out[0, 0, 0], 100 - 102.9801, atol=1e-4)  # B
    np.testing.assert_allclose(out[0, 0, 1], 150 - 115.9465, atol=1e-4)  # G
    np.testing.assert_allclose(out[0, 0, 2], 200 - 122.7717, atol=1e-4)  # R
    # rgb_unit unchanged default
    out2 = np.asarray(T.normalize(jnp.asarray(img)))
    np.testing.assert_allclose(
        out2[0, 0, 0], (200 / 255 - 0.485) / 0.229, atol=1e-4)


def test_foveal_topology_reference_vs_dense():
    """"reference" topology (SURVEY.md §3.1 "ROIPool x7"): the 1x view pools
    ALL skip levels, context views pool only the LAST level. Verified against
    a composed dense-oracle: slice the per-(view,level) pools accordingly."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.multipath import MultiPathNet, build_model
    from multipathnet_tpu.ops import roi as roi_ops

    base = preset("tiny").model
    base = dataclasses.replace(base, roi_impl="direct",
                               train_roi_impl="direct", dtype="float32")
    ref_model = build_model(dataclasses.replace(
        base, foveal_topology="reference"))
    rng = jax.random.key(7)
    images = jax.random.uniform(rng, (1, 64, 64, 3))
    rois = jnp.asarray([[[4, 4, 40, 40], [8, 16, 30, 60]]], jnp.float32)
    params = jinit(ref_model, jax.random.key(0), images, rois)

    feats = japply(ref_model, params, images, method=MultiPathNet.features)
    got = japply(ref_model, params, feats, rois, (64, 64),
                 method=MultiPathNet.pool_rois)
    assert got.shape[1] == len(base.foveal_scales)  # F preserved

    # oracle: per-(view, level) single pools, then the reference combination
    strides = {"c3": 4, "c4": 8, "c5": 16}
    def pool_one(level, factors):
        def w(f_map, r):
            return roi_ops.multilevel_foveal_roi_features(
                {level: f_map}, r, scales={level: 1.0 / strides[level]},
                foveal_factors=factors, image_hw=(64, 64),
                output_size=base.roi_output_size,
                samples_per_bin=base.roi_samples_per_bin, combine="sum")
        return jax.jit(jax.vmap(w))(feats[level], rois)

    f0 = base.foveal_scales[:1]
    rest = base.foveal_scales[1:]
    want_1x = sum(pool_one(l, f0) for l in base.skip_levels)
    want_ctx = pool_one(base.skip_levels[-1], rest)
    want = jnp.concatenate([want_1x, want_ctx], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # dense differs (context views gain c3/c4 content)
    dense_model = build_model(dataclasses.replace(
        base, foveal_topology="dense"))
    got_d = japply(dense_model, params, feats, rois, (64, 64),
                   method=MultiPathNet.pool_rois)
    assert np.abs(np.asarray(got_d[:, 1:]) - np.asarray(got[:, 1:])).max() > 1e-3
    # ...but the 1x view is identical in both topologies
    np.testing.assert_allclose(np.asarray(got_d[:, 0]), np.asarray(got[:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_roi_mode_max_windowed_equals_direct_for_small_rois():
    """roi_impl='pyramid' under roi_mode='max' routes to the windowed max
    path (max pyramid + masked window max) — bit-exact vs the direct oracle
    for views whose bins span <= 1 base cell (VERDICT r2 item 7; larger
    views quantize bin edges to the pyramid cell, tested at op level in
    test_roi_pyramid.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.multipath import build_model

    base = preset("tiny").model
    # single foveal view: context expansion would push views past the
    # level-0 span where windowed == direct is exact
    kw = dict(roi_mode="max", train_roi_impl="direct", dtype="float32",
              foveal_scales=(1.0,))
    m_direct = build_model(dataclasses.replace(base, roi_impl="direct", **kw))
    m_window = build_model(dataclasses.replace(base, roi_impl="pyramid", **kw))

    rng = jax.random.key(2)
    images = jax.random.uniform(rng, (1, 64, 64, 3))
    # tinynet c5 stride is 8 -> <= 7*8 = 56px boxes stay at level 0; c3/c4
    # are finer, so smaller spans there too... keep boxes <= 28px for c3@2
    rois = jnp.asarray([[[4, 4, 30, 30], [8, 16, 30, 40], [40, 30, 62, 58]]],
                       jnp.float32)
    params = jinit(m_direct, jax.random.key(0), images, rois)
    s_d, d_d = japply(m_direct, params, images, rois)
    s_w, d_w = japply(m_window, params, images, rois)
    np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_w), np.asarray(d_d),
                               rtol=1e-5, atol=1e-5)

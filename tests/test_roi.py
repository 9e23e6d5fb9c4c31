"""ROI ops vs NumPy oracles (SURVEY.md §4: ROIPool kernel vs reference impl)."""

import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.ops import roi as R

RNG = np.random.default_rng(2)


def numpy_roi_align(feat, rois, g, scale, s):
    """Straightforward loop oracle for bilinear ROI align (avg mode)."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), g, g, c), np.float32)

    def bilin(y, x):
        y = min(max(y, 0.0), h - 1.0)
        x = min(max(x, 0.0), w - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        wy, wx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - wy) * (1 - wx)
            + feat[y0, x1] * (1 - wy) * wx
            + feat[y1, x0] * wy * (1 - wx)
            + feat[y1, x1] * wy * wx
        )

    for r, box in enumerate(rois):
        x1, y1, x2, y2 = box * scale
        bh = max(y2 - y1, 1e-6) / g
        bw = max(x2 - x1, 1e-6) / g
        for i in range(g):
            for j in range(g):
                acc = np.zeros(c, np.float32)
                for si in range(s):
                    for sj in range(s):
                        yy = y1 + (i + (si + 0.5) / s) * bh
                        xx = x1 + (j + (sj + 0.5) / s) * bw
                        acc += bilin(yy, xx)
                out[r, i, j] = acc / (s * s)
    return out


def numpy_roi_pool_max(feat, rois, g, scale):
    """Exact dynamic-extent max-pool oracle (inn.ROIPooling semantics)."""
    h, w, c = feat.shape
    out = np.zeros((len(rois), g, g, c), np.float32)
    for r, box in enumerate(rois):
        x1 = np.floor(box[0] * scale)
        y1 = np.floor(box[1] * scale)
        x2 = np.ceil(box[2] * scale)
        y2 = np.ceil(box[3] * scale)
        rh, rw = max(y2 - y1, 1.0), max(x2 - x1, 1.0)
        for i in range(g):
            ys = int(np.clip(np.floor(y1 + i * rh / g), 0, h))
            ye = int(np.clip(np.ceil(y1 + (i + 1) * rh / g), 0, h))
            for j in range(g):
                xs = int(np.clip(np.floor(x1 + j * rw / g), 0, w))
                xe = int(np.clip(np.ceil(x1 + (j + 1) * rw / g), 0, w))
                if ye > ys and xe > xs:
                    out[r, i, j] = feat[ys:ye, xs:xe].max(axis=(0, 1))
    return out


def rand_case(h=24, w=32, c=8, n=12, img_scale=16.0):
    feat = RNG.standard_normal((h, w, c)).astype(np.float32)
    x1 = RNG.uniform(0, w * img_scale * 0.7, n)
    y1 = RNG.uniform(0, h * img_scale * 0.7, n)
    bw = RNG.uniform(8, w * img_scale * 0.3, n)
    bh = RNG.uniform(8, h * img_scale * 0.3, n)
    rois = np.stack([x1, y1, x1 + bw, y1 + bh], -1).astype(np.float32)
    return feat, rois


def test_roi_align_matches_numpy_oracle():
    feat, rois = rand_case()
    got = np.asarray(
        R.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                    output_size=7, spatial_scale=1 / 16.0, samples_per_bin=2)
    )
    want = numpy_roi_align(feat, rois, 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_max_mode_bounded_by_avg_max():
    feat, rois = rand_case()
    mx = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois), mode="max"))
    av = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois), mode="avg"))
    assert np.all(mx >= av - 1e-5)


def test_roi_pool_max_matches_numpy_oracle():
    feat, rois = rand_case()
    got = np.asarray(
        R.roi_pool_max(jnp.asarray(feat), jnp.asarray(rois),
                       output_size=7, spatial_scale=1 / 16.0)
    )
    want = numpy_roi_pool_max(feat, rois, 7, 1 / 16.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_roi_align_grad_flows():
    import jax

    feat, rois = rand_case(h=8, w=8, c=2, n=3)

    def loss(f):
        return R.roi_align(f, jnp.asarray(rois), output_size=3,
                           spatial_scale=1 / 16.0).sum()

    g = jax.grad(loss)(jnp.asarray(feat))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_multilevel_foveal_shapes_and_semantics():
    h, w = 32, 32
    feats = {
        "c3": jnp.asarray(RNG.standard_normal((h // 4, w // 4, 4)), jnp.float32),
        "c4": jnp.asarray(RNG.standard_normal((h // 8, w // 8, 6)), jnp.float32),
        "c5": jnp.asarray(RNG.standard_normal((h // 16, w // 16, 8)), jnp.float32),
    }
    scales = {"c3": 0.25, "c4": 0.125, "c5": 0.0625}
    rois = jnp.asarray([[4.0, 4.0, 20.0, 24.0], [8.0, 2.0, 30.0, 18.0]])
    out = R.multilevel_foveal_roi_features(
        feats, rois, scales=scales, foveal_factors=(1.0, 2.0),
        image_hw=(h, w), output_size=3,
    )
    assert out.shape == (2, 2, 3, 3, 18)  # (F, R, G, G, 4+6+8)
    # foveal factor 1.0 slab must equal plain concat of per-level roi_align
    direct = jnp.concatenate(
        [R.roi_align(feats[l], rois, output_size=3, spatial_scale=scales[l])
         for l in ("c3", "c4", "c5")], axis=-1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(direct), atol=1e-6)


def test_batched_roi_align_vmap_consistency():
    feat0, rois0 = rand_case(n=4)
    feat1, rois1 = rand_case(n=4)
    feats = jnp.stack([jnp.asarray(feat0), jnp.asarray(feat1)])
    rois = jnp.stack([jnp.asarray(rois0), jnp.asarray(rois1)])
    out = R.batched_roi_align(feats, rois, output_size=5, spatial_scale=1 / 16.0)
    single = R.roi_align(jnp.asarray(feat1), jnp.asarray(rois1),
                         output_size=5, spatial_scale=1 / 16.0)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)

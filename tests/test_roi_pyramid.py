"""Pyramid ROI align vs direct roi_align oracle (SURVEY.md §7.3 item 1)."""

import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.ops import roi as R
from multipathnet_tpu.ops import roi_pyramid as RP

RNG = np.random.default_rng(8)


def make_feat(h=40, w=40, c=8):
    return jnp.asarray(RNG.standard_normal((h, w, c)), jnp.float32)


def test_level0_matches_roi_align_exactly():
    """ROIs with bins spanning <=1 base cell select level 0 => identical
    samples to direct roi_align."""
    feat = make_feat()
    scale = 1 / 16.0
    pyr = RP.build_pyramid(feat, scale)
    # bins span <= 1 cell: roi size <= 7 cells = 112 px
    x1 = RNG.uniform(0, 300, 20).astype(np.float32)
    y1 = RNG.uniform(0, 300, 20).astype(np.float32)
    w = RNG.uniform(20, 110, 20).astype(np.float32)
    h = RNG.uniform(20, 110, 20).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    got = RP.pyramid_roi_align(pyr, rois)
    want = R.roi_align(feat, rois, output_size=7, spatial_scale=scale,
                       samples_per_bin=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_large_output_size_level0_matches_roi_align():
    """G=28 (the mask decoder's output) through the G-dependent window
    (window_sizes, r3): level-0 ROIs must match direct roi_align exactly.
    Regression test for the silent 10-row-window clipping that corrupted
    every mask whose ROI spanned more than ~10 cells."""
    feat = make_feat(64, 64, 8)
    scale = 1 / 4.0
    pyr = RP.build_pyramid(feat, scale, output_size=28)
    assert pyr.flat.shape[1] >= RP.window_sizes(28)[1]
    # bins span <= 1 cell at level 0: roi size <= 28 cells = 112 px —
    # far beyond the old fixed 10-row window
    x1 = RNG.uniform(0, 120, 20).astype(np.float32)
    y1 = RNG.uniform(0, 120, 20).astype(np.float32)
    w = RNG.uniform(40, 110, 20).astype(np.float32)
    h = RNG.uniform(40, 110, 20).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    got = RP.pyramid_roi_align(pyr, rois, output_size=28, samples_per_bin=1)
    want = R.roi_align(feat, rois, output_size=28, spatial_scale=scale,
                       samples_per_bin=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_large_output_size_pooled_level_exact_oracle():
    """G=28 ROIs past level 0 must equal roi_align on the equivalently
    avg-pooled map (the same exact-oracle property the G=7 path pins in
    test_large_roi_uses_pooled_level) — under the r3 window bug this read
    window-edge clamping noise instead."""
    feat = make_feat(64, 64, 8)
    pyr = RP.build_pyramid(feat, 1.0, output_size=28)
    roi = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])  # 2 cells/bin -> level 1
    got = RP.pyramid_roi_align(pyr, roi, output_size=28, samples_per_bin=1)
    pooled1 = feat.reshape(32, 2, 32, 2, 8).mean(axis=(1, 3))
    want = R.roi_align(pooled1, roi / 2.0, output_size=28, spatial_scale=1.0,
                       samples_per_bin=1)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5)


def test_large_roi_uses_pooled_level():
    """A full-map ROI must select a coarse level and equal roi_align on the
    equivalently avg-pooled map."""
    feat = make_feat(64, 64, 4)
    pyr = RP.build_pyramid(feat, 1.0)
    roi = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])  # span 8 cells/bin -> level 3
    got = RP.pyramid_roi_align(pyr, roi)
    pooled3 = feat.reshape(8, 8, 8, 8, 4).mean(axis=(1, 3))  # 2^3 avg pool
    want = R.roi_align(pooled3, roi / 8.0, output_size=7, spatial_scale=1.0,
                       samples_per_bin=2)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=2e-5)


def test_border_and_degenerate_rois_finite():
    feat = make_feat(24, 40, 8)
    pyr = RP.build_pyramid(feat, 0.25)
    rois = jnp.asarray([
        [0, 0, 1, 1],             # tiny corner
        [150, 90, 160, 96],       # at far edge (map is 160x96 px)
        [-50, -50, 500, 500],     # way out of bounds
        [0, 0, 0, 0],             # degenerate
    ], jnp.float32)
    out = np.asarray(RP.pyramid_roi_align(pyr, rois))
    assert out.shape == (4, 7, 7, 8)
    assert np.isfinite(out).all()


def test_max_mode():
    feat = make_feat(32, 32, 4)
    pyr = RP.build_pyramid(feat, 1.0)
    rois = jnp.asarray([[2.0, 2.0, 9.0, 8.0]])  # span <= 7 cells -> level 0
    mx = np.asarray(RP.pyramid_roi_align(pyr, rois, mode="max"))
    av = np.asarray(RP.pyramid_roi_align(pyr, rois, mode="avg"))
    assert np.all(mx >= av - 1e-5)
    want = np.asarray(R.roi_align(feat, rois, output_size=7,
                                  spatial_scale=1.0, mode="max"))
    np.testing.assert_allclose(mx[0], want[0], atol=2e-5)


def test_multilevel_foveal_wrapper_shapes():
    feats = {"c3": make_feat(16, 16, 4), "c5": make_feat(4, 4, 8)}
    pyrs = {k: RP.build_pyramid(v, s)
            for (k, v), s in zip(feats.items(), (0.25, 0.0625))}
    rois = jnp.asarray([[4, 4, 40, 40], [8, 2, 60, 30]], jnp.float32)
    out = RP.multilevel_foveal_pyramid_features(
        pyrs, rois, foveal_factors=(1.0, 2.0), image_hw=(64, 64))
    assert out.shape == (2, 2, 7, 7, 12)
    assert np.isfinite(np.asarray(out)).all()
    # foveal slab 0 == plain concat of per-level pyramid pooling
    direct = jnp.concatenate(
        [RP.pyramid_roi_align(pyrs[k], rois) for k in ("c3", "c5")], axis=-1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(direct),
                               atol=1e-6)


def test_pyramid_structure():
    feat = make_feat(40, 40, 4)
    pyr = RP.build_pyramid(feat, 1.0)
    assert pyr.num_scales == RP.num_scales_for(40, 40)
    # level 1 content = 2x avg pool of level 0
    l1_rows = int(pyr.row_offsets[1])
    l1 = np.asarray(pyr.flat[l1_rows:l1_rows + 20, :20])
    want = np.asarray(feat).reshape(20, 2, 20, 2, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(l1, want, atol=1e-6)


# --- windowed reference-exact max (VERDICT r2 item 7) -----------------------


def _np_maxpool2x(a, times):
    """numpy 2x max pool applied `times` times, -inf edge padding."""
    a = np.asarray(a, np.float64)
    for _ in range(times):
        h, w, c = a.shape
        ph, pw = h + (h % 2), w + (w % 2)
        buf = np.full((ph, pw, c), -np.inf)
        buf[:h, :w] = a
        a = buf.reshape(ph // 2, 2, pw // 2, 2, c).max(axis=(1, 3))
    return a.astype(np.float32)


def test_exact_max_level0_bit_exact():
    """Views whose bins span <= 1 base cell: windowed max == roi_pool_max
    (the inn.ROIPooling parity oracle), bit-exact."""
    feat = make_feat()
    scale = 1 / 16.0
    pyr = RP.build_pyramid(feat, scale, mode="max")
    x1 = RNG.uniform(0, 300, 24).astype(np.float32)
    y1 = RNG.uniform(0, 300, 24).astype(np.float32)
    w = RNG.uniform(10, 110, 24).astype(np.float32)
    h = RNG.uniform(10, 110, 24).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    got = RP.pyramid_roi_align(pyr, rois, mode="exact_max")
    want = R.roi_pool_max(feat, rois, output_size=7, spatial_scale=scale)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exact_max_coarse_level_is_quantized_reference_rule():
    """Larger views: the SAME floor/ceil rule applied on the 2^l max-pooled
    map — equals roi_pool_max run on that map at the scaled spatial_scale."""
    feat = make_feat(40, 40, 4)
    scale = 1 / 4.0
    pyr = RP.build_pyramid(feat, scale, mode="max")
    # roi ~100px at 1/4 scale -> 25 cells -> span 25/7 ~ 3.6 -> level 2
    rois = jnp.asarray([[10.0, 14.0, 112.0, 118.0],
                        [0.0, 0.0, 159.0, 159.0]], jnp.float32)  # lvl 2, 3
    got = np.asarray(RP.pyramid_roi_align(pyr, rois, mode="exact_max"))
    for i, lvl in enumerate((2, 3)):
        lvl_map = _np_maxpool2x(np.asarray(feat), lvl)
        want = R.roi_pool_max(jnp.asarray(lvl_map), rois[i:i + 1],
                              output_size=7, spatial_scale=scale / 2 ** lvl)
        np.testing.assert_allclose(got[i], np.asarray(want)[0], atol=1e-6)


def test_exact_max_degenerate_and_padded_rois():
    """Zero-area padded boxes produce zeros (empty-bin rule), no NaN/inf."""
    feat = make_feat(16, 16, 4)
    pyr = RP.build_pyramid(feat, 0.25, mode="max")
    rois = jnp.asarray([[0, 0, 0, 0], [5, 5, 5, 5]], jnp.float32)
    out = np.asarray(RP.pyramid_roi_align(pyr, rois, mode="exact_max"))
    assert np.isfinite(out).all()
    # a point box still max-pools its single covered cell (roi_w/h >= 1)
    want = np.asarray(R.roi_pool_max(feat, rois, output_size=7,
                                     spatial_scale=0.25))
    np.testing.assert_array_equal(out, want)


def test_max_pyramid_structure():
    feat = make_feat(40, 40, 4)
    pyr = RP.build_pyramid(feat, 1.0, mode="max")
    l1_rows = int(pyr.row_offsets[1])
    l1 = np.asarray(pyr.flat[l1_rows:l1_rows + 20, :20])
    want = np.asarray(feat).reshape(20, 2, 20, 2, 4).max(axis=(1, 3))
    np.testing.assert_allclose(l1, want, atol=1e-6)
    # padding is large-negative, never selected by valid-region maxes
    # (level 1 is 20 cols wide inside the wmax=40 buffer -> col 39 is pad)
    assert float(pyr.flat[l1_rows, 39, 0]) < -1e37

"""Pallas window-pool kernel (interpret mode on CPU) vs XLA pyramid oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.ops import roi_pallas as RK
from multipathnet_tpu.ops import roi_pyramid as RP

RNG = np.random.default_rng(13)


def test_view_geometry_matches_oracle_windows():
    """Weights/origins must reproduce the oracle's pooled values when applied
    to the same windows (NumPy reference contraction)."""
    feat = jnp.asarray(RNG.standard_normal((24, 40, 8)), jnp.float32)
    pyr = RP.build_pyramid(feat, 0.25)
    n = 12
    x1 = RNG.uniform(0, 100, n).astype(np.float32)
    y1 = RNG.uniform(0, 60, n).astype(np.float32)
    w = RNG.uniform(8, 120, n).astype(np.float32)
    h = RNG.uniform(8, 60, n).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))

    row0, x0, wy, wx = jax.tree.map(
        np.asarray, RK.view_geometry(pyr, rois))
    flat = np.asarray(pyr.flat)
    got = np.stack([
        np.einsum("iy,yxc,jx->ijc", wy[v],
                  flat[row0[v]:row0[v] + RP.WINDOW,
                       x0[v]:x0[v] + RP.WINDOW_X], wx[v])
        for v in range(n)
    ])
    want = np.asarray(RP.pyramid_roi_align(pyr, rois))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_kernel_interpret_matches_oracle():
    feat = jnp.asarray(RNG.standard_normal((16, 24, 8)), jnp.float32)
    pyr = RP.build_pyramid(feat, 0.5)
    rois = jnp.asarray([
        [2, 2, 30, 20], [0, 0, 46, 30], [10, 5, 14, 9], [20, 10, 47, 31],
        [0, 0, 4, 4],
    ], jnp.float32)
    row0, x0, wy, wx = RK.view_geometry(pyr, rois)
    out = RK.pallas_window_pool(pyr.flat, row0, x0, wy, wx, tile=2,
                                interpret=True)
    want = RP.pyramid_roi_align(pyr, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_kernel_pads_to_tile_multiple():
    feat = jnp.asarray(RNG.standard_normal((16, 24, 8)), jnp.float32)
    pyr = RP.build_pyramid(feat, 0.5)
    rois = jnp.asarray([[2, 2, 30, 20], [4, 4, 20, 28], [8, 0, 40, 24]],
                       jnp.float32)  # 3 views, tile=4
    row0, x0, wy, wx = RK.view_geometry(pyr, rois)
    out = RK.pallas_window_pool(pyr.flat, row0, x0, wy, wx, tile=4,
                                interpret=True)
    assert out.shape[0] == 3
    want = RP.pyramid_roi_align(pyr, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_batched_pool_image_isolation():
    """Views must read ONLY their own image's pyramid rows."""
    f0 = jnp.zeros((16, 16, 8), jnp.float32)
    f1 = jnp.ones((16, 16, 8), jnp.float32)
    feats = jnp.stack([f0, f1])
    flat_all, meta = RP.build_pyramid_batch(feats, 1.0)
    rois = jnp.asarray([[2, 2, 12, 12], [2, 2, 12, 12]], jnp.float32)
    img_idx = jnp.asarray([0, 1], jnp.int32)
    out = RK.batched_pyramid_pool(flat_all, meta, rois, img_idx, tile=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 1.0, atol=1e-5)


def test_model_pallas_impl_matches_pyramid_impl():
    """Full model: roi_impl='pallas' (interpret) == roi_impl='pyramid'."""
    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.multipath import build_model

    cfg = preset("tiny")
    mk = lambda impl: dataclasses.replace(cfg.model, num_classes=5,
                                          roi_impl=impl)
    images = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)), jnp.float32)
    # small ROIs: even the 4x foveal view spans <= 1 cell/bin at c3
    # (4x * 7px <= 7 cells * 4px stride), so pyramid level 0 is chosen
    # everywhere and 'pallas' (which falls back to 'direct' for
    # sub-128-channel test trunks), 'pyramid', and 'direct' all compute
    # identical samples
    rois = jnp.asarray([[[4, 4, 11, 10], [22, 20, 29, 26]]] * 2, jnp.float32)

    m_pal = build_model(mk("pallas"))
    params = m_pal.init(jax.random.key(0), images, rois)
    s_pal, d_pal = m_pal.apply(params, images, rois)
    m_pyr = build_model(mk("pyramid"))
    s_pyr, d_pyr = m_pyr.apply(params, images, rois)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_pyr),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_pyr),
                               atol=5e-3)


def test_channel_padding_preserves_values():
    """Sub-128-channel levels are zero-padded on lanes for the TPU kernel;
    padding must not change pooled values for the real channels."""
    feat = jnp.asarray(RNG.standard_normal((1, 16, 24, 8)), jnp.float32)
    rois = jnp.asarray([[2, 2, 30, 20], [4, 0, 44, 30]], jnp.float32)
    img_idx = jnp.zeros(2, jnp.int32)
    flat, meta = RP.build_pyramid_batch(feat, 0.5)
    base = RK.batched_pyramid_pool(flat, meta, rois, img_idx, tile=2,
                                   interpret=True)
    padded = jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, 120)))
    flat_p, meta_p = RP.build_pyramid_batch(padded, 0.5)
    pooled_p = RK.batched_pyramid_pool(flat_p, meta_p, rois, img_idx, tile=2,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(pooled_p[..., :8]),
                               np.asarray(base), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_p[..., 8:]), 0.0, atol=1e-6)


def _multi_fixture(n=10, c=8, seed=21):
    rng = np.random.default_rng(seed)
    f3 = jnp.asarray(rng.standard_normal((32, 48, c)), jnp.float32)
    f4 = jnp.asarray(rng.standard_normal((16, 24, c)), jnp.float32)
    f5 = jnp.asarray(rng.standard_normal((8, 12, c)), jnp.float32)
    pyrs = [RP.build_pyramid(f3, 0.25), RP.build_pyramid(f4, 0.125),
            RP.build_pyramid(f5, 0.0625)]
    x1 = rng.uniform(0, 100, n).astype(np.float32)
    y1 = rng.uniform(0, 60, n).astype(np.float32)
    w = rng.uniform(8, 90, n).astype(np.float32)
    h = rng.uniform(8, 60, n).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    return pyrs, rois


def test_multi_level_kernel_matches_per_level_sum():
    """Fused multi-level kernel == sum of single-level kernel calls == sum of
    XLA pyramid oracles."""
    pyrs, rois = _multi_fixture()
    geos = [RK.view_geometry(p, rois) for p in pyrs]
    fused = RK.pallas_window_pool_multi(
        [p.flat for p in pyrs],
        [g[0] for g in geos], [g[1] for g in geos],
        [g[2] for g in geos], [g[3] for g in geos],
        tile=4, interpret=True)
    single = sum(RK.pallas_window_pool(p.flat, *g, tile=4, interpret=True)
                 for p, g in zip(pyrs, geos))
    oracle = sum(RP.pyramid_roi_align(p, rois) for p in pyrs)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(single),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=1e-4)


def test_multi_level_trainable_grads_match_per_level():
    """Custom-VJP backward of the fused kernel == per-level trainable grads."""
    pyrs, rois = _multi_fixture(n=6)
    geos = [RK.view_geometry(p, rois) for p in pyrs]
    flats = [p.flat for p in pyrs]
    args = ([g[0] for g in geos], [g[1] for g in geos],
            [g[2] for g in geos], [g[3] for g in geos])

    def loss_fused(fs):
        out = RK.multi_window_pool_trainable(fs, *args, 4, True)
        return jnp.sum(out * out)

    def loss_single(fs):
        total = sum(
            RK.window_pool_trainable(f, g[0], g[1], g[2], g[3], 4, True)
            for f, g in zip(fs, geos))
        return jnp.sum(total * total)

    v1, g1 = jax.value_and_grad(loss_fused)(flats)
    v2, g2 = jax.value_and_grad(loss_single)(flats)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _resident_fixture(b=3, v=5, c=8, seed=29):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((b, 24, 40, c)), jnp.float32)
    flat_all, meta = RP.build_pyramid_batch(feats, 0.25)
    x1 = rng.uniform(0, 100, (b * v)).astype(np.float32)
    y1 = rng.uniform(0, 60, (b * v)).astype(np.float32)
    w = rng.uniform(8, 120, (b * v)).astype(np.float32)
    h = rng.uniform(8, 60, (b * v)).astype(np.float32)
    views = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), v)
    return flat_all, meta, views, img_idx, b


def test_resident_pool_matches_window_pool():
    """VMEM-resident kernel == per-window DMA kernel == XLA oracle, including
    the V-padding path (v=5 with tile=2 pads each image's views to 6)."""
    flat_all, meta, views, img_idx, b = _resident_fixture()
    res = RK.batched_pyramid_pool_resident(
        flat_all, meta, views, b, tile=2, interpret=True)
    win = RK.batched_pyramid_pool(flat_all, meta, views, img_idx, tile=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(res), np.asarray(win), atol=1e-4)


def test_resident_pool_image_isolation():
    """Resident views must read ONLY their own image's pyramid block."""
    f0 = jnp.zeros((16, 16, 8), jnp.float32)
    f1 = jnp.ones((16, 16, 8), jnp.float32)
    flat_all, meta = RP.build_pyramid_batch(jnp.stack([f0, f1]), 1.0)
    views = jnp.asarray([[2, 2, 12, 12], [2, 2, 12, 12]], jnp.float32)
    out = RK.batched_pyramid_pool_resident(flat_all, meta, views, 2, tile=2,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 1.0, atol=1e-5)


def test_resident_trainable_grads_match_window_trainable():
    """Resident custom-VJP backward == window-kernel custom-VJP backward."""
    flat_all, meta, views, img_idx, b = _resident_fixture(b=2, v=4)
    rows = meta.flat.shape[0]

    def loss_resident(f):
        out = RK.batched_pyramid_pool_resident(
            f, meta, views, b, tile=2, interpret=True, trainable=True)
        return jnp.sum(out * out)

    def loss_window(f):
        row0, x0, wy, wx = RK.view_geometry(meta, views)
        row0 = row0 + img_idx * rows
        out = RK.window_pool_trainable(f, row0, x0, wy, wx, 2, True)
        return jnp.sum(out * out)

    v1, g1 = jax.value_and_grad(loss_resident)(flat_all)
    v2, g2 = jax.value_and_grad(loss_window)(flat_all)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)

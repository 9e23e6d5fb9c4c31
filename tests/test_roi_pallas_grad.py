"""Gradient correctness of the trainable window-pool (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multipathnet_tpu.ops import roi_pallas as RK
from multipathnet_tpu.ops import roi_pyramid as RP

RNG = np.random.default_rng(17)


def _case(n=5):
    feat = jnp.asarray(RNG.standard_normal((16, 24, 8)), jnp.float32)
    pyr = RP.build_pyramid(feat, 0.5)
    x1 = RNG.uniform(0, 20, n).astype(np.float32)
    y1 = RNG.uniform(0, 14, n).astype(np.float32)
    w = RNG.uniform(4, 26, n).astype(np.float32)
    h = RNG.uniform(4, 16, n).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    geo = RK.view_geometry(pyr, rois)
    return pyr.flat, geo


def test_trainable_grad_matches_xla_equivalent():
    flat, (row0, x0, wy, wx) = _case()
    n = row0.shape[0]
    cot = jnp.asarray(RNG.standard_normal((n, 7, 7, 8)), jnp.float32)

    def xla_equiv(f):
        outs = [
            jnp.einsum("iy,yxc,jx->ijc", wy[v],
                       lax.dynamic_slice(f, (row0[v], x0[v], 0),
                                         (RP.WINDOW, RP.WINDOW_X, f.shape[-1])),
                       wx[v])
            for v in range(n)
        ]
        return jnp.stack(outs)

    def loss_ref(f):
        return (xla_equiv(f) * cot).sum()

    def loss_kernel(f):
        out = RK.window_pool_trainable(f, row0, x0, wy, wx, 2, True)
        return (out.astype(jnp.float32) * cot).sum()

    # forward agreement
    np.testing.assert_allclose(
        np.asarray(RK.window_pool_trainable(flat, row0, x0, wy, wx, 2, True)),
        np.asarray(xla_equiv(flat)), atol=1e-4)
    # gradient agreement (incl. overlapping windows accumulating)
    g_ref = np.asarray(jax.grad(loss_ref)(flat))
    g_ker = np.asarray(jax.grad(loss_kernel)(flat))
    np.testing.assert_allclose(g_ker, g_ref, atol=1e-3, rtol=1e-4)
    assert np.abs(g_ker).sum() > 0


def test_trainable_train_step_runs_with_pallas_impl():
    """Tiny model trains one step with train_roi_impl='pallas' (interpret)."""
    import dataclasses

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.models.multipath import build_model
    from multipathnet_tpu.train.losses import detection_loss
    from multipathnet_tpu.data import sampler as S

    cfg = preset("tiny")
    mc = dataclasses.replace(cfg.model, num_classes=5,
                             train_roi_impl="pallas")
    model = build_model(mc)
    images = jnp.asarray(RNG.standard_normal((1, 64, 64, 3)), jnp.float32)
    rois = jnp.asarray([[[4, 4, 30, 30], [8, 8, 40, 44]]], jnp.float32)
    params = model.init(jax.random.key(0), images, rois)

    def loss_fn(p):
        scores, deltas = model.apply(p, images, rois, train=True,
                                     rngs={"dropout": jax.random.key(1)})
        return (scores.sum() + deltas.sum()).astype(jnp.float32)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # trunk receives gradient THROUGH the pallas pooling custom VJP
    trunk_g = sum(float(jnp.abs(l).sum()) for l in
                  jax.tree_util.tree_leaves(g["params"]["backbone"]))
    assert trunk_g > 0, "no gradient reached the backbone"


def test_placement_gemms_match_scatter():
    """_place_windows (narrow-level backward) must equal the scatter-add it
    replaces, on both narrow (routed) and forced-wide shapes."""
    for R, W, N in ((48, 24, 37), (40, 80, 21), (30, 160, 11)):
        row0 = jnp.asarray(RNG.integers(0, R - 10, N), jnp.int32)
        x0 = jnp.asarray(
            np.minimum(RNG.integers(0, W, N) // 8 * 8, W - 16), jnp.int32)
        gwin = jnp.asarray(RNG.standard_normal((N, 10, 16, 8)), jnp.float32)
        placed = RK._place_windows(row0, x0, gwin, (R, W, 8), jnp.float32,
                                   f32_dot=True)
        idx = jnp.stack([row0, x0], -1)
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        ref = lax.scatter_add(
            jnp.zeros((R, W, 8), jnp.float32), idx, gwin, dnums,
            indices_are_sorted=False, unique_indices=False,
            mode=lax.GatherScatterMode.CLIP)
        np.testing.assert_allclose(np.asarray(placed), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)


def test_pallas_grad_kernel_matches_scatter_backward():
    """The VMEM-accumulating Pallas backward (r3: pallas_window_grad via
    rows_list/batch on multi_window_pool_trainable) must produce the same
    pyramid gradients as the scatter/placement path, including per-image
    grouping, view padding, and overlapping windows (interpret mode)."""
    b, v = 2, 5  # 5 views/image -> padded to tile=4 multiple internally
    feat = jnp.asarray(RNG.standard_normal((2, 16, 24, 8)), jnp.float32)
    flat_b, meta = RP.build_pyramid_batch(feat, 0.5)
    rows = meta.flat.shape[0]
    x1 = RNG.uniform(0, 20, b * v).astype(np.float32)
    y1 = RNG.uniform(0, 14, b * v).astype(np.float32)
    w = RNG.uniform(4, 26, b * v).astype(np.float32)
    h = RNG.uniform(4, 16, b * v).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), v)

    cot = jnp.asarray(RNG.standard_normal((b * v, 7, 7, 8)), jnp.float32)

    def loss(f, use_kernel_bwd):
        kw = dict(trainable=True, tile=4, interpret=True)
        if use_kernel_bwd:
            out = RK.batched_pyramid_pool_multi([f], [meta], rois, img_idx,
                                                **kw)
        else:
            # same forward, scatter backward: call the trainable op without
            # rows_list/batch
            row0, x0, wy, wx = RK.view_geometry(meta, rois)
            row0 = row0 + img_idx * rows
            out = RK.multi_window_pool_trainable([f], [row0], [x0], [wy],
                                                 [wx], 4, True)
        return (out.astype(jnp.float32) * cot).sum()

    g_kernel = np.asarray(jax.grad(lambda f: loss(f, True))(flat_b))
    g_scatter = np.asarray(jax.grad(lambda f: loss(f, False))(flat_b))
    assert np.abs(g_scatter).sum() > 0
    np.testing.assert_allclose(g_kernel, g_scatter, atol=1e-4, rtol=1e-4)

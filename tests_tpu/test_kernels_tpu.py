"""Compiled (Mosaic) Pallas kernels vs XLA oracles ON THE CHIP.

Mirrors tests/test_roi_pallas.py's oracle structure with interpret=False and
lane-width channel counts (C >= 128 — Mosaic can't lane-merge smaller
windows; the CPU suite covers small-C interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from multipathnet_tpu.ops import roi_pallas as RK
from multipathnet_tpu.ops import roi_pyramid as RP


def make_views(rng, n, hmax=100, wmax=140):
    x1 = rng.uniform(0, wmax, n).astype(np.float32)
    y1 = rng.uniform(0, hmax, n).astype(np.float32)
    w = rng.uniform(8, 120, n).astype(np.float32)
    h = rng.uniform(8, 60, n).astype(np.float32)
    return jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], -1))


def test_window_kernel_compiled_vs_oracle(rng):
    feat = jnp.asarray(rng.standard_normal((24, 40, 128)), jnp.float32)
    pyr = RP.build_pyramid(feat, 0.25)
    rois = make_views(rng, 24)
    row0, x0, wy, wx = RK.view_geometry(pyr, rois)
    out = RK.pallas_window_pool(pyr.flat, row0, x0, wy, wx, tile=8,
                                interpret=False)
    want = RP.pyramid_roi_align(pyr, rois)
    # MXU matmuls at default precision carry bf16 operand rounding even for
    # f32 inputs (two chained GEMMs -> ~1.4e-2 max observed on 150k
    # elements); the CPU interpret tests pin exact f32 semantics, this pins
    # the compiled path's numerics window
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=1e-2)


def test_window_kernel_compiled_bf16(rng):
    """The production dtype: bf16 pyramid, bf16 window GEMMs on the MXU."""
    feat = jnp.asarray(rng.standard_normal((24, 40, 128)), jnp.bfloat16)
    pyr = RP.build_pyramid(feat, 0.25)
    rois = make_views(rng, 16)
    row0, x0, wy, wx = RK.view_geometry(pyr, rois)
    out = RK.pallas_window_pool(pyr.flat, row0, x0, wy, wx, tile=8,
                                interpret=False)
    want = RP.pyramid_roi_align(pyr, rois)  # f32 internal, cast at end
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_multi_level_kernel_compiled(rng):
    """Fused multi-level kernel == sum of per-level oracle pools."""
    f1 = jnp.asarray(rng.standard_normal((32, 48, 128)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((16, 24, 128)), jnp.float32)
    p1 = RP.build_pyramid(f1, 0.5)
    p2 = RP.build_pyramid(f2, 0.25)
    rois = make_views(rng, 24, hmax=50, wmax=80)
    g1 = RK.view_geometry(p1, rois)
    g2 = RK.view_geometry(p2, rois)
    out = RK.pallas_window_pool_multi(
        [p1.flat, p2.flat], [g1[0], g2[0]], [g1[1], g2[1]],
        [g1[2], g2[2]], [g1[3], g2[3]], tile=8, interpret=False)
    want = RP.pyramid_roi_align(p1, rois) + RP.pyramid_roi_align(p2, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)  # MXU bf16 rounding x2 levels


def test_resident_kernel_compiled(rng):
    """VMEM-resident per-image kernel == the window kernel on a batch."""
    b, n_per = 3, 16
    feats = jnp.asarray(rng.standard_normal((b, 16, 24, 128)), jnp.float32)
    flat_b, meta = RP.build_pyramid_batch(feats, 0.25)
    views = make_views(rng, b * n_per, hmax=50, wmax=80)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_per)
    got = RK.batched_pyramid_pool_resident(
        flat_b, meta, views, b, interpret=False)
    want = RK.batched_pyramid_pool(flat_b, meta, views, img_idx,
                                   interpret=False)
    # kernel-vs-kernel: same W2 weights, different GEMM shapes -> only MXU
    # rounding differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_placement_gemms_match_scatter_on_chip(rng):
    """The narrow-level backward GEMMs == lax.scatter_add on the MXU (the
    CPU oracle test forces f32 dot; this is the production bf16-operand
    path)."""
    n, R, W, C = 48, 40, 64, 128
    row0 = jnp.asarray(rng.integers(0, R - RP.WINDOW, n), jnp.int32)
    x0 = jnp.asarray((rng.integers(0, (W - RP.WINDOW_X) // 8, n) * 8),
                     jnp.int32)

    def scatter(gwin):
        idx = jnp.stack([row0, x0], axis=-1)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        return jax.lax.scatter_add(
            jnp.zeros((R, W, C), jnp.float32), idx, gwin, dnums,
            mode=jax.lax.GatherScatterMode.CLIP)

    shape = (n, RP.WINDOW, RP.WINDOW_X, C)
    # (a) STRUCTURAL exactness: small-integer grads are exact in bf16 and
    # their 48-deep sums (<= 96 in magnitude) are exact too, so any
    # placement/index bug shows as an integer-sized difference
    gwin_i = jnp.asarray(rng.integers(-2, 3, shape), jnp.float32)
    got = RK._place_windows(row0, x0, gwin_i, (R, W, C), jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(scatter(gwin_i)))
    # (b) numerics window on gaussian grads: the MXU runs the GEMMs with
    # bf16 operand rounding (production feeds bf16 anyway); 48-deep
    # accumulation measured |max| ~0.026
    gwin = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = RK._place_windows(row0, x0, gwin, (R, W, C), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(scatter(gwin)),
                               atol=5e-2)


def test_rmw_grad_kernel_on_chip(rng):
    """pallas_window_rmw_grad (r3 wide-level streaming backward) compiled on
    the chip == lax.scatter_add, both structurally (one-hot weights +
    small-integer grads: every value and every overlap sum is bf16-exact,
    so an index/ordering/DMA bug shows as an integer difference) and on
    gaussian grads within bf16 accumulation tolerance."""
    n, rows, width, C, G = 24, 40, 160, 128, 7
    row0 = jnp.asarray(rng.integers(0, rows - RP.WINDOW, n), jnp.int32)
    x0 = jnp.asarray((rng.integers(0, (width - RP.WINDOW_X) // 8, n) * 8),
                     jnp.int32)

    def scatter(gwin, dtype):
        idx = jnp.stack([row0, x0], axis=-1)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        return jax.lax.scatter_add(
            jnp.zeros((rows, width, C), dtype), idx,
            gwin.astype(dtype), dnums,
            mode=jax.lax.GatherScatterMode.CLIP)

    # (a) structural: one-hot wy/wx (bin i -> window row i, bin j -> col 2j)
    # -> gwin entries in {-2..2}, overlap sums bounded by 48 — bf16-exact
    wy = jnp.zeros((n, G, RP.WINDOW)).at[:, jnp.arange(G),
                                         jnp.arange(G)].set(1.0)
    wx = jnp.zeros((n, G, RP.WINDOW_X)).at[:, jnp.arange(G),
                                           2 * jnp.arange(G)].set(1.0)
    gout = jnp.asarray(rng.integers(-2, 3, (n, G, G, C)), jnp.float32)
    got = RK.pallas_window_rmw_grad(gout, row0, x0, wy, wx,
                                    (rows, width, C), jnp.bfloat16)
    m = jnp.einsum("ngy,nghc->nyhc", wy, gout)
    gwin = jnp.einsum("nyhc,nhx->nyxc", m, wx)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32),
        np.asarray(scatter(gwin, jnp.bfloat16), np.float32))
    # (b) gaussian weights/grads: bf16 per-update rounding differs from the
    # scatter's only in accumulation order
    wy = jnp.asarray(rng.standard_normal((n, G, RP.WINDOW)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((n, G, RP.WINDOW_X)), jnp.float32)
    gout = jnp.asarray(rng.standard_normal((n, G, G, C)), jnp.float32)
    got = RK.pallas_window_rmw_grad(gout, row0, x0, wy, wx,
                                    (rows, width, C), jnp.bfloat16)
    m = jnp.einsum("ngy,nghc->nyhc", wy, gout)
    gwin = jnp.einsum("nyhc,nhx->nyxc", m, wx)
    ref = np.asarray(scatter(gwin, jnp.bfloat16), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=0.02 * scale)


def test_bf16_pool_grad_accumulation_tolerance(rng):
    """ADVICE r2: the pool backward accumulates window grads in the
    pyramid's dtype (bf16 in production). Dense-overlap ROIs (many windows
    hitting the same cells) must keep bf16 accumulation within tolerance of
    f32 accumulation — the numeric property the dtype-follow optimization
    relies on."""
    feat32 = jnp.asarray(rng.standard_normal((16, 24, 128)), jnp.float32)

    def loss_for(dtype):
        feat = feat32.astype(dtype)
        pyr = RP.build_pyramid(feat, 0.25)
        # 64 near-identical ROIs -> maximal scatter overlap
        base = np.array([10.0, 8.0, 70.0, 50.0], np.float32)
        rois = jnp.asarray(base[None] + rng.uniform(-2, 2, (64, 4)).astype(
            np.float32))
        row0, x0, wy, wx = RK.view_geometry(pyr, rois)

        def f(flat):
            out = RK.multi_window_pool_trainable(
                [flat], [row0], [x0], [wy], [wx], 8, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(f)(pyr.flat)

    g_bf16 = np.asarray(loss_for(jnp.bfloat16), np.float32)
    g_f32 = np.asarray(loss_for(jnp.float32))
    assert np.isfinite(g_f32).all() and np.isfinite(g_bf16).all()
    # relative error of the accumulated gradient field, bf16 has ~2-3
    # significant digits; 64-deep overlap must not degrade beyond ~5%
    denom = np.abs(g_f32).max()
    rel = np.abs(g_bf16 - g_f32).max() / max(denom, 1e-6)
    assert rel < 0.05, f"bf16 pool-grad accumulation error {rel:.3f}"

"""Fused Pallas ROI kernel — pyramid window pooling at hardware speed.

The production ROI feature path (SURVEY.md §2.2 row 1: the inn.ROIPooling
CUDA kernel's TPU-native replacement). Same semantics as
ops/roi_pyramid.pyramid_roi_align (its test oracle), but implemented as a
Pallas kernel because both XLA formulations measured badly on the real v5e:
per-sample gather 864ms, vmapped-dynamic-slice pyramid 340ms with a 729s
compile (2026-08-16 profiles).

Design (see pallas_guide.md patterns: double buffering, PrefetchScalarGridSpec):

  host XLA (cheap, dense):  per (image, roi, foveal) view — pyramid scale
      selection, window origin (row0, x0), and the (G, WINDOW)/(G, WINDOW_X)
      bilinear weight rows with the S-sample averaging FOLDED IN (avg pooling
      commutes with the linear interpolation, so the sample axis disappears).
  kernel grid over view-tiles: double-buffered async DMA of each view's
      (WINDOW=10, WINDOW_X=16, C) window HBM->VMEM (the ONLY irregular
      access, expressed as one strided DMA per view), then ONE GEMM per view
          out = W2(G*G, 160) @ vec(window)(160, C)
      with the combined weight W2 = wy (x) wx rebuilt in-kernel from the
      tiny weight rows each grid step (_w2_all). Three kernel variants share
      this compute: per-window DMA (pallas_window_pool), multi-level fused
      (the level sum rides the GEMM as a K-concat), and VMEM-resident
      (pallas_resident_pool — the whole per-image pyramid is pipelined into
      VMEM and windows become direct dynamic-slice loads, for levels small
      enough to fit; docs/PERF.md quantifies each step).

  Window sizing: bins span (0.5, 1] pyramid cell at the selected scale
  (roi_pyramid.WINDOW comment), so G=7 bins + bilinear halo fit in 10 rows;
  x is 16 wide because DMA origins must be 8-aligned on the sublane dim
  (origin rounded down to 8) and 7 bins + halo then need <=16 cols. Per view
  at C=512: 160 KB of HBM traffic — vs the gather path's scattered reads.

Max-mode and gradients are not supported here (eval fast path); training and
max-mode use the XLA implementations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multipathnet_tpu.ops.roi_pyramid import WINDOW, WINDOW_X, Pyramid

LANES = 128  # TPU lane width; per-view quant scales are emitted lane-wide


def view_geometry(pyr: Pyramid, rois: jnp.ndarray, *, output_size: int = 7,
                  samples_per_bin: int = 2):
    """Vectorized scale selection + window origins + folded bilinear weights.

    rois (N, 4) image coords -> row0 (N,) int32 absolute pyramid row,
    x0 (N,) int32, wy (N, G, WINDOW=10) f32, wx (N, G, WINDOW_X=16) f32.
    Mirrors roi_pyramid._one_roi exactly (shared constants, tested equal).
    """
    g, s = output_size, samples_per_bin
    # the (0.5, 1]-cell level rule puts g bins + bilinear halo in g+3 rows;
    # these kernels are hard-tuned to g=7 (10x16 windows). A larger g would
    # SILENTLY clip samples into the window; roi_pyramid's XLA path sizes
    # its window per output_size (roi_pyramid.window_sizes, r3) and is the
    # supported route for large outputs (the 28x28 mask decoder).
    assert g + 3 <= WINDOW, (
        f"output_size={g} exceeds the kernels' window geometry "
        f"(WINDOW={WINDOW} fits g<={WINDOW - 3}); use the roi_pyramid XLA "
        f"path, which sizes its window per output_size")
    f32 = jnp.float32
    b = rois.astype(f32) * pyr.base_scale
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - y1, 1e-6)
    span = jnp.maximum(bw, bh) / g
    # bins span (0.5, 1] cell at the chosen scale (roi_pyramid.WINDOW note)
    lvl = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(span, 1.0))).astype(jnp.int32),
                   0, pyr.num_scales - 1)
    cell = jnp.exp2(lvl.astype(f32))
    hl = pyr.heights[lvl].astype(f32)
    wl = pyr.widths[lvl].astype(f32)

    off = (jnp.arange(g * s, dtype=f32) // s) + \
        ((jnp.arange(g * s) % s).astype(f32) + 0.5) / s
    sy = jnp.clip((y1[:, None] + off * bh[:, None] / g) / cell[:, None],
                  0.0, (hl - 1.0)[:, None])
    sx = jnp.clip((x1[:, None] + off * bw[:, None] / g) / cell[:, None],
                  0.0, (wl - 1.0)[:, None])

    y0 = jnp.clip(jnp.floor(sy[:, 0]).astype(jnp.int32), 0,
                  jnp.maximum(pyr.heights[lvl] - WINDOW, 0))
    # x window: 8-aligned start (HBM DMA sublane constraint), WINDOW_X cols
    wmax = pyr.flat.shape[1]
    x0 = jnp.clip(jnp.floor(sx[:, 0]).astype(jnp.int32), 0,
                  jnp.maximum(pyr.widths[lvl] - (WINDOW_X - 7), 0))
    x0 = jnp.minimum((x0 // 8) * 8, wmax - WINDOW_X)

    cells_y = jnp.arange(WINDOW, dtype=f32)
    cells_x = jnp.arange(WINDOW_X, dtype=f32)
    ly = jnp.clip(sy - y0[:, None].astype(f32), 0.0, WINDOW - 1.0)
    lx = jnp.clip(sx - x0[:, None].astype(f32), 0.0, WINDOW_X - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly[:, :, None] - cells_y))  # (N,GS,10)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx[:, :, None] - cells_x))  # (N,GS,16)
    # fold the S-sample average into the weights (linearity of bilinear)
    n = rois.shape[0]
    wy = wy.reshape(n, g, s, WINDOW).mean(axis=2)
    wx = wx.reshape(n, g, s, WINDOW_X).mean(axis=2)

    row0 = pyr.row_offsets[lvl] + y0
    return row0, x0, wy, wx


def _window_pool_kernel(row0_ref, x0_ref, ri_ref, rj_ref, eybd_ref, exbd_ref,
                        wy_ref, wx_ref, flat_ref, out_ref,
                        win, sems, *, tile: int, g: int):
    """Grid step: DMA `tile` windows (double buffered), build the combined
    weights in-kernel (see _w2_all), ONE GEMM per view:
    out = W2 (G*G, 160) @ window (160, C).

    The original two-stage contraction ((G,10)@(10,16C) then G small
    (G,16)@(16,C) dots) is 4x fewer FLOPs but its M=7/K=10 shapes waste the
    128x128 MXU; it measured ~0.55 us/view COMPUTE-bound — what round 1
    misattributed to a 300 GB/s DMA plateau (docs/PERF.md, W2 rows)."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    c = flat_ref.shape[-1]
    k = WINDOW * WINDOW_X

    def dma(step, slot, t):
        v = step * tile + t
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(row0_ref[v], WINDOW),
                        pl.ds(pl.multiple_of(x0_ref[v], 8), WINDOW_X), :],
            win.at[slot, t],
            sems.at[slot, t],
        )

    def start_all(step, slot):
        for t in range(tile):
            dma(step, slot, t).start()

    @pl.when(i == 0)
    def _():
        start_all(0, 0)

    @pl.when(i + 1 < n_steps)
    def _():
        start_all(i + 1, (i + 1) % 2)

    w2all = _w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref,
                    wy_ref[0], wx_ref[0])               # (G2P, tile*160)
    slot = i % 2
    for t in range(tile):
        dma(i, slot, t).wait()
        w = win[slot, t].reshape(k, c)                  # (160, C)
        w2 = w2all[:g * g, t * k:(t + 1) * k].astype(w.dtype)
        out_ref[t] = _dot(w2, w).astype(out_ref.dtype)  # (G*G, C)


# ---------------------------------------------------------------------------
# In-kernel combined-weight build. The GEMM form needs, per view, the matrix
# W2[(i,j),(y,x)] = wy[i,y] * wx[j,x] (G*G=49 x 160). Materializing it on the
# host costs ~500 MB of HBM write+read per group at bench shapes (~4 ms);
# instead the kernel rebuilds it each grid step from the tiny wy/wx rows
# (182 floats/view) with FOUR constant 0/1 expansion matmuls batched over
# the whole tile:
#     a2 = RI @ wycat @ EYBD    (G2P, tile*160): a2[(ij), t*160+(yx)] = wy_t[i,y]
#     b2 = RJ @ wxcat @ EXBD    likewise with wx_t[j,x]
#     W2_t = (a2 * b2)[:G*G, t*160:(t+1)*160]
# RI/RJ replicate the G weight rows into G*G bin rows; EYBD/EXBD spread the
# 10/16 window coords onto the 160-wide (y,x) axis, block-diagonally over the
# tile. G2P pads the bin-row axis to the sublane tile.
# ---------------------------------------------------------------------------


def _g2p(g: int) -> int:
    return -(-g * g // 64) * 64


def _expansion_consts(g: int, tile: int):
    """-> (ri (G2P, G), rj (G2P, G), eybd (tile*10, tile*160),
    exbd (tile*16, tile*160)) as static f32 arrays."""
    import numpy as np

    g2p, k = _g2p(g), WINDOW * WINDOW_X
    ri = np.zeros((g2p, g), np.float32)
    rj = np.zeros((g2p, g), np.float32)
    for i in range(g):
        for j in range(g):
            ri[i * g + j, i] = 1.0
            rj[i * g + j, j] = 1.0
    eybd = np.zeros((tile * WINDOW, tile * k), np.float32)
    exbd = np.zeros((tile * WINDOW_X, tile * k), np.float32)
    for t in range(tile):
        for y in range(WINDOW):
            eybd[t * WINDOW + y,
                 t * k + y * WINDOW_X:t * k + (y + 1) * WINDOW_X] = 1.0
        for x in range(WINDOW_X):
            exbd[t * WINDOW_X + x, t * k + x:(t + 1) * k:WINDOW_X] = 1.0
    return (jnp.asarray(ri), jnp.asarray(rj),
            jnp.asarray(eybd), jnp.asarray(exbd))


def _cat_layout(w: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(..., N, G, W) -> (..., N/tile, G, tile*W): each grid step's tile of
    per-view weight rows laid side by side (host-side transpose, so the
    kernel reads ONE aligned block per step)."""
    *lead, n, g, win = w.shape
    w = w.reshape(*lead, n // tile, tile, g, win)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2,
                                     len(lead) + 1, len(lead) + 3]
    return w.transpose(*perm).reshape(*lead, n // tile, g, tile * win)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref, wycat, wxcat):
    """One grid step's combined weights for ALL tile views:
    (G2P, tile*160) f32; view t's W2 is [:G*G, t*160:(t+1)*160]."""
    a2 = _dot(_dot(ri_ref[...], wycat), eybd_ref[...])
    b2 = _dot(_dot(rj_ref[...], wxcat), exbd_ref[...])
    return a2 * b2


def _quant_view(d, pool_dtype, bias_row):
    """In-kernel replica of the head's bias/relu + ops.quant.quantize_rows
    on ONE view's GEMM output d (G*G, C) f32. Cast order mirrors the XLA
    path bit for bit: GEMM f32 -> pool dtype (what the bf16 kernel would
    have stored) -> head dtype (bias_row's dtype) -> +bias, relu -> f32
    abs-max row scale -> round/clip int8. Returns (q (G*G, C) int8,
    s () f32)."""
    y = jnp.maximum(d.astype(pool_dtype).astype(bias_row.dtype)
                    + bias_row, 0).astype(jnp.float32)
    # amax * (1/127), NOT amax / 127 — must stay the same single op as
    # quantize_rows' (see its docstring: XLA's div-by-constant rewrite is
    # fusion-context-dependent and a 1-ULP scale gap flips round() ties)
    s = jnp.maximum(jnp.max(jnp.abs(y)) * jnp.float32(1.0 / 127.0), 1e-12)
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return q, s


def pallas_window_pool(flat: jnp.ndarray, row0: jnp.ndarray, x0: jnp.ndarray,
                       wy: jnp.ndarray, wx: jnp.ndarray, *,
                       tile: int = 8, interpret: bool = False) -> jnp.ndarray:
    """flat (rows, Wmax, C); row0/x0 (N,); wy (N, G, 10), wx (N, G, 16)
    -> (N, G, G, C).

    N is padded to a multiple of `tile` internally.
    """
    n, g = wy.shape[:2]
    c = flat.shape[-1]
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        row0 = jnp.pad(row0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))

    ri, rj, eybd, exbd = _expansion_consts(g, tile)
    g2p, k = _g2p(g), WINDOW * WINDOW_X

    grid = (n_pad // tile,)
    out = pl.pallas_call(
        partial(_window_pool_kernel, tile=tile, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0 in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
                pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW, tile * k),
                             lambda i, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW_X, tile * k),
                             lambda i, *_: (0, 0)),
                pl.BlockSpec((1, g, tile * WINDOW), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, g, tile * WINDOW_X),
                             lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # pyramid stays in HBM
            ],
            out_specs=pl.BlockSpec((tile, g * g, c), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, tile, WINDOW, WINDOW_X, c), flat.dtype),
                pltpu.SemaphoreType.DMA((2, tile)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, g * g, c), flat.dtype),
        interpret=interpret,
    )(row0.astype(jnp.int32), x0.astype(jnp.int32),
      ri, rj, eybd, exbd,
      _cat_layout(wy.astype(jnp.float32), tile),
      _cat_layout(wx.astype(jnp.float32), tile), flat)
    return out[:n].reshape(n, g, g, c)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def window_pool_trainable(flat, row0, x0, wy, wx, tile=8, interpret=False):
    """Differentiable window pooling: Pallas forward + windowed scatter-add
    backward. Grads flow to `flat` only (row0/x0/wy/wx derive from ROI
    coordinates, which are data, not parameters)."""
    return pallas_window_pool(flat, row0, x0, wy, wx, tile=tile,
                              interpret=interpret)


def _wpt_fwd(flat, row0, x0, wy, wx, tile, interpret):
    out = pallas_window_pool(flat, row0, x0, wy, wx, tile=tile,
                             interpret=interpret)
    # zero-stub residual carries flat's shape/dtype (dtype objects are not
    # JAX types; a broadcast zeros array is free under XLA)
    stub = jnp.broadcast_to(jnp.zeros((), flat.dtype), flat.shape)
    return out, (stub, row0, x0, wy, wx)


# Narrow levels route the backward through two dense one-hot GEMMs instead
# of lax.scatter_add: the scatter is HBM-traffic-bound and pays full-pyramid
# zero-init + RMW, while for Wmax <= _PLACE_MM_MAX_W the placement matmuls
# (probe: 11.5 vs 20.8 ms standalone on the c5 shapes, docs/PERF.md) write
# the grad buffer once and accumulate in f32 on the MXU. c4 (W=80) measured
# a wash on speed but keeps the better numerics; c3 (W=160) keeps the
# scatter — its one-hot row matrices grow with R*W and measured slower.
_PLACE_MM_MAX_W = 96


def _place_windows(row0, x0, gwin, shape, dtype, f32_dot=False):
    """Sum N (ht, wd, C) windows into a zero (R, W, C) buffer at (row0, x0)
    — the dense equivalent of the windowed scatter-add, as two GEMMs:
    gx[n,r,x,c] = sum_j 1[x0_n+j == x] gwin[n,r,j,c]
    out[R,x,c]  = sum_{n,r} 1[row0_n+r == R] gx[n,r,x,c]
    Indices are in-bounds by construction (view_geometry clamps), matching
    the scatter's CLIP-on-valid behavior."""
    R, W = shape[0], shape[1]
    n, ht, wd, c = gwin.shape
    # XLA:CPU's DotThunk rejects bf16xbf16->f32; tests (interpret mode) run
    # the GEMMs in f32. On TPU the MXU takes bf16 operands with f32
    # accumulation natively.
    cdt = jnp.float32 if f32_dot else dtype
    xs = x0.astype(jnp.int32)[:, None] + jnp.arange(wd, dtype=jnp.int32)[None]
    cols = (xs[:, :, None] == jnp.arange(W, dtype=jnp.int32)[None, None, :])
    gx = jnp.einsum("njx,nrjc->nrxc", cols.astype(cdt), gwin.astype(cdt),
                    preferred_element_type=jnp.float32)
    rows = (row0.astype(jnp.int32)[:, None]
            + jnp.arange(ht, dtype=jnp.int32)[None]).reshape(-1)
    oh = (rows[:, None] == jnp.arange(R, dtype=jnp.int32)[None, :])
    out = jnp.einsum("kr,kwc->rwc", oh.astype(cdt),
                     gx.reshape(n * ht, W, c).astype(cdt),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


# Per-image placement guard: the rows-one-hot einsum costs
# 2 * ht * (rows * width) * C FLOPs PER VIEW — linear in the per-image
# pyramid AREA (measured ~2.1 us/view at c4's 12.8k cells, ~8.6 us/view at
# c3's 51.2k, train shapes). The RMW streaming kernel
# (pallas_window_rmw_grad) is ~6 us/view regardless of area, so the
# placement wins only below ~24k cells; wider levels route to the RMW
# stream (c3: placement 6.0 / scatter 6.3 / RMW 3.0 ms, docs/PERF.md r3).
_PLACE_PER_IMAGE_MAX_CELLS = 24 * 1024


def _place_windows_per_image(row0_rel, x0, gwin, batch, rows, width, dtype,
                             f32_dot=False):
    """Per-image dense placement: sum each image's windows into its OWN
    (rows, width, C) block — the batched form of _place_windows whose
    row-one-hot contracts against image-local rows instead of the whole
    (batch * rows) flat buffer (8x fewer MXU FLOPs at batch 8).

    gwin (N, ht, wd, C) with N = batch * views_per_image, IMAGE-MAJOR;
    row0_rel/x0 (N,) image-relative window origins. Returns the flat
    (batch * rows, width, C) gradient buffer.
    """
    n, ht, wd, c = gwin.shape
    assert n % batch == 0, (n, batch)
    v = n // batch
    row0_rel = jnp.clip(row0_rel.astype(jnp.int32), 0, rows - ht)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, width - wd)
    cdt = jnp.float32 if f32_dot else dtype
    xs = x0[:, None] + jnp.arange(wd, dtype=jnp.int32)[None]
    cols = (xs[:, :, None] == jnp.arange(width, dtype=jnp.int32)[None, None])
    # gx in cdt (bf16 in production): a per-view spread over x, NOT an
    # accumulation — rounding here matches what the scatter path's
    # dtype-follow updates already do; cross-view accumulation happens in
    # the f32-accumulating rows einsum below.
    gx = jnp.einsum("njx,nrjc->nrxc", cols.astype(cdt), gwin.astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
    ridx = (row0_rel[:, None]
            + jnp.arange(ht, dtype=jnp.int32)[None]).reshape(batch, v * ht)
    oh = (ridx[:, :, None] == jnp.arange(rows, dtype=jnp.int32)[None, None])
    out = jnp.einsum("bkr,bkwc->brwc", oh.astype(cdt),
                     gx.reshape(batch, v * ht, width, c),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(batch * rows, width, c)


def _accumulate_windows(row0, x0, gwin, shape, dtype, f32_dot=False):
    """Route between the placement GEMMs (narrow levels) and scatter-add.

    Indices are clamped so a window never hangs past the buffer edge —
    matching the scatter path's GatherScatterMode.CLIP. view_geometry
    already clamps its outputs, but this helper is general-looking enough
    that a future caller could feed raw indices; without the clamp the
    GEMM path would silently DROP out-of-bounds one-hot rows where the
    scatter would clamp them."""
    n, ht, wd, _ = gwin.shape
    row0 = jnp.clip(row0, 0, shape[0] - ht)
    x0 = jnp.clip(x0, 0, shape[1] - wd)
    if shape[1] <= _PLACE_MM_MAX_W:
        return _place_windows(row0, x0, gwin, shape, dtype, f32_dot)
    idx = jnp.stack([row0, x0], axis=-1).astype(jnp.int32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )
    return jax.lax.scatter_add(
        jnp.zeros(shape, dtype), idx, gwin.astype(dtype), dnums,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def _wpt_bwd(tile, interpret, res, g):
    stub, row0, x0, wy, wx = res
    # window gradient: gwin[n] = Wy[n]^T @ g[n] @ Wx[n]  -> (N, 10, 16, C)
    g = g.astype(jnp.float32)
    m = jnp.einsum("ngy,nghc->nyhc", wy, g)          # (N, 10, G, C)
    gwin = jnp.einsum("nyhc,nhx->nyxc", m, wx)       # (N, 10, 16, C)
    g_flat = _accumulate_windows(row0, x0, gwin, stub.shape, stub.dtype,
                                 f32_dot=interpret)
    return g_flat, None, None, None, None


window_pool_trainable.defvjp(_wpt_fwd, _wpt_bwd)


def batched_pyramid_pool(flat_batch: jnp.ndarray, pyr_meta: Pyramid,
                         rois_views: jnp.ndarray, img_idx: jnp.ndarray, *,
                         output_size: int = 7, samples_per_bin: int = 2,
                         tile: int = 8, interpret: bool = False,
                         trainable: bool = False) -> jnp.ndarray:
    """Pool N roi-views against a batch of pyramids stacked along rows.

    flat_batch: (B * rows_per_image, Wmax, C) — B per-image pyramids
    concatenated on axis 0; pyr_meta: ONE image's Pyramid (offsets/heights/
    widths/base_scale); img_idx (N,) int32 selects each view's image.
    Returns (N, G, G, C).
    """
    rows_per_image = pyr_meta.flat.shape[0]
    row0, x0, wy, wx = view_geometry(
        pyr_meta, rois_views, output_size=output_size,
        samples_per_bin=samples_per_bin)
    row0 = row0 + img_idx.astype(jnp.int32) * rows_per_image
    if trainable:
        return window_pool_trainable(flat_batch, row0, x0, wy, wx, tile,
                                     interpret)
    return pallas_window_pool(flat_batch, row0, x0, wy, wx, tile=tile,
                              interpret=interpret)

# ---------------------------------------------------------------------------
# Multi-level fused pooling: one grid pass, L windows DMA'd per view, the
# level SUM accumulated in registers, ONE output write. Used by the skip-
# connection path after the per-level 1x1 reduction (all levels share C):
# sum_l(pool_l(reduce_l(f))) == reference reduce(concat_l(pool_l(f))).
# vs L separate pallas_window_pool calls + XLA add: saves (L-1) full output
# writes + L reads + (L-1) adds of the (N, G, G, C) tensor (~9.6 GB of HBM
# traffic at bench shapes) and overlaps all L DMAs per view.
# ---------------------------------------------------------------------------


def _multi_window_pool_kernel(row0_ref, x0_ref, ri_ref, rj_ref, eybd_ref,
                              exbd_ref, wy_ref, wx_ref, *refs,
                              tile: int, g: int, n_levels: int,
                              nslots: int = 2, quant: bool = False):
    """Grid step: DMA tile x L windows (nslots-deep buffered), then ONE GEMM
    per view computes both the bilinear pooling AND the level sum: the L
    windows sit in one scratch slab read as (L*160, C), and the combined
    weight (G*G, L*160) is the per-level W2s concatenated along K — a
    concat along a contraction axis IS a sum.

    row0_ref/x0_ref: (L, Npad) SMEM. wy_ref (L, 1, G, tile*WINDOW) /
    wx_ref (L, 1, G, tile*WINDOW_X) VMEM blocks (combined weights built
    in-kernel per level, see _w2_all). refs = L flat pyramids in HBM +
    out_ref + win scratch (nslots, tile, L, WINDOW, WINDOW_X, C) + sems.
    """
    flats = refs[:n_levels]
    if quant:
        (bias_ref, out_ref, out_s_ref, win, sems) = refs[n_levels:]
    else:
        out_ref, win, sems = refs[n_levels:]
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    c = flats[0].shape[-1]
    k = WINDOW * WINDOW_X

    def dma(step, slot, t, lv):
        v = step * tile + t
        return pltpu.make_async_copy(
            flats[lv].at[pl.ds(row0_ref[lv, v], WINDOW),
                         pl.ds(pl.multiple_of(x0_ref[lv, v], 8), WINDOW_X), :],
            win.at[slot, t, lv],
            sems.at[slot, t, lv],
        )

    def start_all(step, slot):
        for t in range(tile):
            for lv in range(n_levels):
                dma(step, slot, t, lv).start()

    @pl.when(i == 0)
    def _():
        # prime the pipeline: steps 0..nslots-2 (grid-clamped)
        for s_ in range(nslots - 1):
            @pl.when(s_ < n_steps)
            def _():
                start_all(s_, s_)

    @pl.when(i + nslots - 1 < n_steps)
    def _():
        start_all(i + nslots - 1, (i + nslots - 1) % nslots)

    w2alls = [_w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref,
                      wy_ref[lv, 0], wx_ref[lv, 0])
              for lv in range(n_levels)]               # L x (G2P, tile*160)
    slot = i % nslots
    srows = []
    for t in range(tile):
        for lv in range(n_levels):
            dma(i, slot, t, lv).wait()
        w = win[slot, t].reshape(n_levels * k, c)
        w2 = jnp.concatenate(
            [w2alls[lv][:g * g, t * k:(t + 1) * k] for lv in range(n_levels)],
            axis=1).astype(w.dtype)                    # (G*G, L*160)
        d = _dot(w2, w)                                # (G*G, C) f32
        if quant:
            q, s_ = _quant_view(d, flats[0].dtype, bias_ref[0])
            out_ref[t] = q
            srows.append(jnp.full((LANES,), s_, jnp.float32))
        else:
            out_ref[t] = d.astype(out_ref.dtype)       # (G*G, C)
    if quant:
        out_s_ref[...] = jnp.stack(srows)              # (tile, LANES)


def pallas_window_pool_multi(flats, row0s, x0s, wys, wxs, *,
                             tile: int = 8, nslots: int = 2,
                             interpret: bool = False, quant_bias=None):
    """Level-summed window pooling.

    flats: list of L (rows_l, Wmax_l, C) pyramids (same C); row0s/x0s/wys/wxs:
    lists of per-level geometry ((N,), (N,), (N, G, WINDOW), (N, G, WINDOW_X)).
    nslots: DMA buffer depth (2 = classic double buffering; deeper keeps more
    windows in flight at tile*L*window*C*nslots bytes of VMEM).
    Returns (N, G, G, C) = sum over levels of the per-level pooled features.

    quant_bias: optional (C,) head-dtype skip bias. When given, the kernel
    applies bias+relu and per-view int8 quantization IN-KERNEL (_quant_view —
    bit-mirrors heads.py's relu + ops.quant.quantize_rows) and returns
    ((N, G, G, C) int8, (N, 1) f32 scales) — the int8 serving head's exact
    input layout, skipping the pooled tensor's bf16 write + re-read + int8
    re-write (~3.2 GB of HBM at bench shapes, docs/PERF.md r5).
    """
    nl = len(flats)
    assert nl >= 1 and len({f.shape[-1] for f in flats}) == 1
    n, g = wys[0].shape[:2]
    c = flats[0].shape[-1]
    n_pad = ((n + tile - 1) // tile) * tile
    pad = n_pad - n

    row0 = jnp.stack([jnp.pad(r, (0, pad)) for r in row0s])  # (L, Npad)
    x0 = jnp.stack([jnp.pad(x, (0, pad)) for x in x0s])
    wycat = jnp.stack([
        _cat_layout(jnp.pad(wy_, ((0, pad), (0, 0), (0, 0))).astype(
            jnp.float32), tile) for wy_ in wys])  # (L, Nt, G, tile*10)
    wxcat = jnp.stack([
        _cat_layout(jnp.pad(wx_, ((0, pad), (0, 0), (0, 0))).astype(
            jnp.float32), tile) for wx_ in wxs])
    ri, rj, eybd, exbd = _expansion_consts(g, tile)
    g2p, k = _g2p(g), WINDOW * WINDOW_X

    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
        pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
        pl.BlockSpec((tile * WINDOW, tile * k),
                     lambda i, *_: (0, 0)),
        pl.BlockSpec((tile * WINDOW_X, tile * k),
                     lambda i, *_: (0, 0)),
        pl.BlockSpec((nl, 1, g, tile * WINDOW),
                     lambda i, *_: (0, i, 0, 0)),
        pl.BlockSpec((nl, 1, g, tile * WINDOW_X),
                     lambda i, *_: (0, i, 0, 0)),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * nl
    operands = [row0.astype(jnp.int32), x0.astype(jnp.int32),
                ri, rj, eybd, exbd, wycat, wxcat, *flats]
    quant = quant_bias is not None
    if quant:
        in_specs.append(pl.BlockSpec((1, c), lambda i, *_: (0, 0)))
        operands.append(quant_bias.reshape(1, c))
        out_specs = (pl.BlockSpec((tile, g * g, c), lambda i, *_: (i, 0, 0)),
                     pl.BlockSpec((tile, LANES), lambda i, *_: (i, 0)))
        out_shape = (jax.ShapeDtypeStruct((n_pad, g * g, c), jnp.int8),
                     jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32))
    else:
        out_specs = pl.BlockSpec((tile, g * g, c), lambda i, *_: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_pad, g * g, c), flats[0].dtype)
    out = pl.pallas_call(
        partial(_multi_window_pool_kernel, tile=tile, g=g, n_levels=nl,
                nslots=nslots, quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0 in SMEM
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nslots, tile, nl, WINDOW, WINDOW_X, c),
                           flats[0].dtype),
                pltpu.SemaphoreType.DMA((nslots, tile, nl)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if quant:
        q, s = out
        return q[:n].reshape(n, g, g, c), s[:n, :1]
    return out[:n].reshape(n, g, g, c)


def _multi_pool(flats, row0s, x0s, wys, wxs, tile, interpret):
    return pallas_window_pool_multi(flats, row0s, x0s, wys, wxs,
                                    tile=tile, interpret=interpret)


# ---------------------------------------------------------------------------
# Pallas pool BACKWARD: VMEM-accumulating per-image grad kernel (the r2
# "next idea"). The XLA backward pays, per level, a full grad-buffer
# zero-init + windowed scatter RMW (or the placement GEMMs' one-hot
# matmuls). Here the per-image grad buffer lives in VMEM across the view
# grid axis: grid (B, V/tile), the output block (1, rows, Wmax, C) maps to
# image b only, so Pallas keeps it resident while j sweeps the views —
# zeroed at j==0, accumulated with direct dynamic-slice adds, written back
# to HBM once per image. Per view the window cotangent is ONE GEMM,
#     gwin(160, C) = W2(G*G, 160)^T @ gout(G*G, C)
# the exact transpose of the forward's contraction (same in-kernel W2
# build). Accumulation is f32 regardless of the pyramid dtype — strictly
# better numerics than the dtype-follow scatter (the ADVICE r2 bf16
# accumulation concern) at no HBM cost (the f32 buffer only exists in
# VMEM; the HBM writeback is once per image).
# Applies to levels whose PER-IMAGE pyramid fits the VMEM budget (c5 and
# coarser at bench shapes — where 2/3 of reference-topology views land);
# wider levels keep the scatter/placement path.
# ---------------------------------------------------------------------------

_GRAD_VMEM_BUDGET = 7 * 1024 * 1024  # f32 per-image grad block, bytes


def _window_grad_kernel(row0_ref, x0_ref, ri_ref, rj_ref, eybd_ref, exbd_ref,
                        wy_ref, wx_ref, g_ref, out_ref, *, tile: int, g: int):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    k = WINDOW * WINDOW_X
    c = out_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    w2all = _w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref,
                    wy_ref[0, 0], wx_ref[0, 0])          # (G2P, tile*160)
    for t in range(tile):
        v = j * tile + t
        w2 = w2all[:g * g, t * k:(t + 1) * k]            # (G*G, 160) f32
        gt = g_ref[0, t].astype(jnp.float32)             # (G*G, C)
        # contract the bin axis of both operands: (160, C)
        gwin = jax.lax.dot_general(w2, gt, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        r0 = row0_ref[bi, v]
        x0 = pl.multiple_of(x0_ref[bi, v], 8)
        cur = out_ref[0, pl.ds(r0, WINDOW), pl.ds(x0, WINDOW_X), :]
        out_ref[0, pl.ds(r0, WINDOW), pl.ds(x0, WINDOW_X), :] = (
            cur + gwin.reshape(WINDOW, WINDOW_X, c))


def pallas_window_grad(gout: jnp.ndarray, row0_rel: jnp.ndarray,
                       x0: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray,
                       batch: int, rows: int, wmax: int, *,
                       tile: int = 8, interpret: bool = False) -> jnp.ndarray:
    """gout (N, G, G, C) f32 cotangent, views IMAGE-GROUPED (N = batch * V);
    row0_rel/x0 (N,) image-RELATIVE window origins; wy/wx the forward's
    weight rows. Returns (batch * rows, wmax, C) f32 pyramid gradient."""
    n, g = wy.shape[:2]
    c = gout.shape[-1]
    assert n % batch == 0, (n, batch)
    v = n // batch
    v_pad = ((v + tile - 1) // tile) * tile

    def per_img(a):
        a = a.reshape(batch, v, *a.shape[1:])
        return jnp.pad(a, ((0, 0), (0, v_pad - v)) +
                       ((0, 0),) * (a.ndim - 2))

    gb = per_img(gout.astype(jnp.float32).reshape(n, g * g, c))
    row0b = per_img(row0_rel.astype(jnp.int32))
    x0b = per_img(x0.astype(jnp.int32))
    # padded views carry zero weights -> zero gwin -> harmless adds at (0,0)
    wyb = per_img(wy.astype(jnp.float32))
    wxb = per_img(wx.astype(jnp.float32))

    ri, rj, eybd, exbd = _expansion_consts(g, tile)
    g2p, k = _g2p(g), WINDOW * WINDOW_X

    grid = (batch, v_pad // tile)
    out = pl.pallas_call(
        partial(_window_grad_kernel, tile=tile, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0 in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((g2p, g), lambda bi, j, *_: (0, 0)),
                pl.BlockSpec((g2p, g), lambda bi, j, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW, tile * k),
                             lambda bi, j, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW_X, tile * k),
                             lambda bi, j, *_: (0, 0)),
                pl.BlockSpec((1, 1, g, tile * WINDOW),
                             lambda bi, j, *_: (bi, j, 0, 0)),
                pl.BlockSpec((1, 1, g, tile * WINDOW_X),
                             lambda bi, j, *_: (bi, j, 0, 0)),
                pl.BlockSpec((1, tile, g * g, c),
                             lambda bi, j, *_: (bi, j, 0, 0)),
            ],
            # the accumulator: one per-image block, resident across j
            out_specs=pl.BlockSpec((1, rows, wmax, c),
                                   lambda bi, j, *_: (bi, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, rows, wmax, c), jnp.float32),
        interpret=interpret,
    )(row0b, x0b, ri, rj, eybd, exbd,
      _cat_layout(wyb, tile), _cat_layout(wxb, tile), gb)
    return out.reshape(batch * rows, wmax, c)


def _window_rmw_grad_kernel(row0_ref, x0_ref, ri_ref, rj_ref, eybd_ref,
                            exbd_ref, wy_ref, wx_ref, g_ref, acc_ref,
                            out_ref, win, sem_in, sem_out, *,
                            tile: int, g: int):
    """Sequential per-view HBM read-modify-write: for each view, DMA its
    10x16 window of the (zero-initialized, input-output-aliased) grad buffer
    into VMEM, add the W2^T-GEMM window cotangent, DMA it back. The copy-out
    wait before the next view's copy-in serializes overlapping windows —
    grid steps execute in order on the core, so the accumulation is exact
    (in the buffer's dtype, like the scatter path it replaces)."""
    del acc_ref  # aliased storage: initial contents only
    i = pl.program_id(0)
    k = WINDOW * WINDOW_X
    c = g_ref.shape[-1]
    w2all = _w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref,
                    wy_ref[0], wx_ref[0])                # (G2P, tile*160)
    for t in range(tile):
        v = i * tile + t
        r0 = row0_ref[v]
        x0 = pl.multiple_of(x0_ref[v], 8)
        cin = pltpu.make_async_copy(
            out_ref.at[pl.ds(r0, WINDOW), pl.ds(x0, WINDOW_X), :],
            win, sem_in)
        cin.start()
        # overlap the window GEMM with the copy-in
        w2 = w2all[:g * g, t * k:(t + 1) * k]            # (G*G, 160) f32
        gt = g_ref[t].astype(jnp.float32)                # (G*G, C)
        gwin = jax.lax.dot_general(w2, gt, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cin.wait()
        win[...] = (win[...].astype(jnp.float32)
                    + gwin.reshape(WINDOW, WINDOW_X, c)).astype(win.dtype)
        cout = pltpu.make_async_copy(
            win, out_ref.at[pl.ds(r0, WINDOW), pl.ds(x0, WINDOW_X), :],
            sem_out)
        cout.start()
        cout.wait()


def pallas_window_rmw_grad(gout: jnp.ndarray, row0: jnp.ndarray,
                           x0: jnp.ndarray, wy: jnp.ndarray,
                           wx: jnp.ndarray, shape, dtype, *,
                           tile: int = 8,
                           interpret: bool = False) -> jnp.ndarray:
    """Windowed scatter-add as a Pallas RMW stream — for levels too WIDE for
    the VMEM-resident backward (pallas_window_grad) where both XLA
    alternatives are slow for structural reasons: lax.scatter_add serializes
    ~12 us/window on TPU, and the placement GEMMs' one-hot rows matrix grows
    with the pyramid area (docs/PERF.md r3 c3 rows). Here the traffic is the
    floor — zero-init + 2x160KB per view — and the serialization is only
    the DMA round-trip latency (~3 us/view at train shapes).

    gout (N, G, G, C) cotangent; row0/x0 (N,) ABSOLUTE window origins into
    the stacked (shape[0], shape[1], C) flat buffer; returns that buffer.
    Accumulation dtype = buffer dtype (scatter-path numerics)."""
    n, g = wy.shape[:2]
    c = gout.shape[-1]
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        row0 = jnp.pad(row0, (0, pad))
        x0 = jnp.pad(x0, (0, pad))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))   # zero weights ->
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))   # zero gwin adds
        gout = jnp.pad(gout, ((0, pad),) + ((0, 0),) * (gout.ndim - 1))

    acc = jnp.zeros(shape, dtype)
    ri, rj, eybd, exbd = _expansion_consts(g, tile)
    g2p, k = _g2p(g), WINDOW * WINDOW_X

    grid = (n_pad // tile,)
    return pl.pallas_call(
        partial(_window_rmw_grad_kernel, tile=tile, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0 in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
                pl.BlockSpec((g2p, g), lambda i, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW, tile * k),
                             lambda i, *_: (0, 0)),
                pl.BlockSpec((tile * WINDOW_X, tile * k),
                             lambda i, *_: (0, 0)),
                pl.BlockSpec((1, g, tile * WINDOW), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, g, tile * WINDOW_X),
                             lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((tile, g * g, c), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # acc (aliased to out)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((WINDOW, WINDOW_X, c), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(tuple(shape), dtype),
        # arg numbering includes the 2 scalar-prefetch operands
        input_output_aliases={9: 0},
        interpret=interpret,
    )(row0.astype(jnp.int32), x0.astype(jnp.int32),
      ri, rj, eybd, exbd,
      _cat_layout(wy.astype(jnp.float32), tile),
      _cat_layout(wx.astype(jnp.float32), tile),
      gout.astype(jnp.float32).reshape(n_pad, g * g, c), acc)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def multi_window_pool_trainable(flats, row0s, x0s, wys, wxs,
                                tile=8, interpret=False,
                                rows_list=None, batch=None):
    """Differentiable level-summed pooling: fused Pallas forward + per-level
    backward (grads flow to `flats` only). rows_list (tuple of per-level
    rows-per-image) + batch enable the VMEM-accumulating Pallas backward for
    levels that fit (_GRAD_VMEM_BUDGET); without them (or for wide levels)
    the windowed scatter-add / placement-GEMM path runs."""
    return _multi_pool(flats, row0s, x0s, wys, wxs, tile, interpret)


def _mwpt_fwd(flats, row0s, x0s, wys, wxs, tile, interpret, rows_list, batch):
    out = _multi_pool(flats, row0s, x0s, wys, wxs, tile, interpret)
    stubs = [jnp.broadcast_to(jnp.zeros((), f.dtype), f.shape) for f in flats]
    return out, (stubs, row0s, x0s, wys, wxs)


def _mwpt_bwd(tile, interpret, rows_list, batch, res, g):
    stubs, row0s, x0s, wys, wxs = res
    g = g.astype(jnp.float32)
    grads = []
    for li, (stub, row0, x0, wy, wx) in enumerate(
            zip(stubs, row0s, x0s, wys, wxs)):
        rows = rows_list[li] if rows_list else 0
        wmax, c = stub.shape[1], stub.shape[2]
        if (rows and batch
                and rows * wmax * c * 4 <= _GRAD_VMEM_BUDGET):
            # VMEM-accumulating per-image kernel (f32 accumulation);
            # row0 arrives image-absolute (batched_pyramid_pool_multi)
            img_off = jnp.repeat(
                jnp.arange(batch, dtype=jnp.int32) * rows,
                row0.shape[0] // batch)
            grads.append(pallas_window_grad(
                g, row0.astype(jnp.int32) - img_off, x0, wy, wx,
                batch, rows, wmax, tile=tile,
                interpret=interpret).astype(stub.dtype))
            continue
        if rows and batch and rows * wmax > _PLACE_PER_IMAGE_MAX_CELLS:
            # too wide for VMEM residence AND too large in area for the
            # placement GEMMs: stream per-view HBM read-modify-writes
            # (measured 6.2 -> ~2.5 ms on c3 at train shapes, docs/PERF.md)
            grads.append(pallas_window_rmw_grad(
                g, row0.astype(jnp.int32), x0, wy, wx,
                (stub.shape[0], wmax, c), stub.dtype, tile=tile,
                interpret=interpret))
            continue
        m = jnp.einsum("ngy,nghc->nyhc", wy, g)       # (N, 10, G, C)
        gwin = jnp.einsum("nyhc,nhx->nyxc", m, wx)    # (N, 10, 16, C)
        if (rows and batch
                and rows * wmax <= _PLACE_PER_IMAGE_MAX_CELLS):
            # levels too wide for the VMEM kernel but small enough in area:
            # per-image placement GEMMs (image-local one-hot rows — 8x fewer
            # MXU FLOPs than the full-batch placement, and no scatter RMW)
            img_off = jnp.repeat(
                jnp.arange(batch, dtype=jnp.int32) * rows,
                row0.shape[0] // batch)
            grads.append(_place_windows_per_image(
                row0.astype(jnp.int32) - img_off, x0, gwin, batch, rows,
                wmax, stub.dtype, f32_dot=interpret))
            continue
        # accumulate in the pyramid's own dtype: the result is cast to it
        # anyway (the build-VJP consumes it), and the f32 detour doubled the
        # zero-init + scatter + read-back HBM traffic of buffers that are
        # ~2x the trunk maps (813 MB for c3 at bench shapes)
        grads.append(_accumulate_windows(row0, x0, gwin, stub.shape,
                                         stub.dtype, f32_dot=interpret))
    return grads, None, None, None, None


multi_window_pool_trainable.defvjp(_mwpt_fwd, _mwpt_bwd)


# ---------------------------------------------------------------------------
# VMEM-resident pooling: when one image's WHOLE pyramid fits in VMEM (the c5
# pyramid at 640^2 is ~3.3 MB bf16), DMA-ing a 160 KB HBM window per view is
# pure waste — the "reference" foveal topology pools its 3 context views only
# from c5, i.e. 3/4 of all views read an HBM-resident 3 MB buffer 24000 times
# (~3.8 GB at bench shapes, ~13 ms at the measured 300 GB/s window-DMA
# plateau). This kernel instead pipelines the (rows, Wmax, C) per-image
# pyramid into VMEM as a normal Pallas input block (double-buffered across
# the image grid axis by the pipeline) and extracts each view's 10x16 window
# with a local VMEM->VMEM async copy; the two-stage matmul is identical to
# _window_pool_kernel. Traffic: B * pyramid bytes (26 MB) instead of
# N * window bytes (3.8 GB).
# ---------------------------------------------------------------------------


def _resident_pool_kernel(row0_ref, x0_ref, ri_ref, rj_ref, eybd_ref,
                          exbd_ref, wy_ref, wx_ref, flat_ref,
                          *refs, tile: int, g: int, quant: bool = False):
    """Grid (B, V/tile): flat_ref is image b's pyramid, resident in VMEM.

    row0_ref/x0_ref (B, Vpad) SMEM, image-RELATIVE rows. wy_ref
    (1, 1, G, tile*WINDOW) / wx_ref (1, 1, G, tile*WINDOW_X) VMEM blocks
    (combined weights built in-kernel, see _w2_all). Windows are read with
    DIRECT dynamic-slice loads from the resident block — no per-view DMA at
    all (24k local copies measured ~12 ms of pure descriptor overhead;
    direct loads are free).

    Why ONE (G*G, 160) x (160, C) GEMM instead of the window kernel's old
    two-stage (G,10)@(10,16C) + G x (G,16)@(16,C): the two-stage form is
    4x fewer FLOPs but its M=7/K=10 shapes waste the 128x128 MXU — measured
    0.79 us/view, fully compute-bound (docs/PERF.md, resident rows). The
    combined form is K=160, M=49: ~8x fewer MXU passes per view.
    """
    if quant:
        bias_ref, out_ref, out_s_ref = refs
    else:
        (out_ref,) = refs
    b = pl.program_id(0)
    j = pl.program_id(1)
    c = flat_ref.shape[-1]
    k = WINDOW * WINDOW_X

    w2all = _w2_all(ri_ref, rj_ref, eybd_ref, exbd_ref,
                    wy_ref[0, 0], wx_ref[0, 0])         # (G2P, tile*160)
    srows = []
    for t in range(tile):
        v = j * tile + t
        w = flat_ref[0, pl.ds(row0_ref[b, v], WINDOW),
                     pl.ds(pl.multiple_of(x0_ref[b, v], 8), WINDOW_X), :]
        w = w.reshape(k, c)                             # (160, C)
        w2 = w2all[:g * g, t * k:(t + 1) * k].astype(w.dtype)
        d = _dot(w2, w)                                 # (G*G, C) f32
        if quant:
            q, s_ = _quant_view(d, flat_ref.dtype, bias_ref[0])
            out_ref[0, t] = q
            srows.append(jnp.full((LANES,), s_, jnp.float32))
        else:
            out_ref[0, t] = d.astype(out_ref.dtype)     # (G*G, C)
    if quant:
        out_s_ref[0] = jnp.stack(srows)                 # (tile, LANES)


def pallas_resident_pool(flat: jnp.ndarray, row0: jnp.ndarray,
                         x0: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray, *,
                         tile: int = 8,
                         interpret: bool = False, quant_bias=None):
    """flat (B, rows, Wmax, C) per-image pyramids; row0/x0 (B, V)
    image-relative; wy (B, V, G, WINDOW), wx (B, V, G, WINDOW_X)
    -> (B, V, G, G, C). V is padded to a multiple of `tile` internally.

    quant_bias: optional (C,) head-dtype skip bias — emit bias/relu'd int8
    + per-view f32 scales instead (see pallas_window_pool_multi); returns
    ((B, V, G, G, C) int8, (B, V, 1) f32).
    """
    b, v, g = wy.shape[:3]
    rows, wmax, c = flat.shape[1:]
    v_pad = ((v + tile - 1) // tile) * tile
    if v_pad != v:
        pad = ((0, 0), (0, v_pad - v))
        row0 = jnp.pad(row0, pad)
        x0 = jnp.pad(x0, pad)
        wy = jnp.pad(wy, pad + ((0, 0), (0, 0)))
        wx = jnp.pad(wx, pad + ((0, 0), (0, 0)))

    ri, rj, eybd, exbd = _expansion_consts(g, tile)
    g2p, k = _g2p(g), WINDOW * WINDOW_X

    grid = (b, v_pad // tile)
    in_specs = [
        pl.BlockSpec((g2p, g), lambda bi, j, *_: (0, 0)),
        pl.BlockSpec((g2p, g), lambda bi, j, *_: (0, 0)),
        pl.BlockSpec((tile * WINDOW, tile * k),
                     lambda bi, j, *_: (0, 0)),
        pl.BlockSpec((tile * WINDOW_X, tile * k),
                     lambda bi, j, *_: (0, 0)),
        pl.BlockSpec((1, 1, g, tile * WINDOW),
                     lambda bi, j, *_: (bi, j, 0, 0)),
        pl.BlockSpec((1, 1, g, tile * WINDOW_X),
                     lambda bi, j, *_: (bi, j, 0, 0)),
        # the whole per-image pyramid, pipelined per grid-b
        pl.BlockSpec((1, rows, wmax, c),
                     lambda bi, j, *_: (bi, 0, 0, 0)),
    ]
    operands = [row0.astype(jnp.int32), x0.astype(jnp.int32),
                ri, rj, eybd, exbd,
                _cat_layout(wy.astype(jnp.float32), tile),
                _cat_layout(wx.astype(jnp.float32), tile), flat]
    quant = quant_bias is not None
    if quant:
        in_specs.append(pl.BlockSpec((1, c), lambda bi, j, *_: (0, 0)))
        operands.append(quant_bias.reshape(1, c))
        out_specs = (pl.BlockSpec((1, tile, g * g, c),
                                  lambda bi, j, *_: (bi, j, 0, 0)),
                     pl.BlockSpec((1, tile, LANES),
                                  lambda bi, j, *_: (bi, j, 0)))
        out_shape = (jax.ShapeDtypeStruct((b, v_pad, g * g, c), jnp.int8),
                     jax.ShapeDtypeStruct((b, v_pad, LANES), jnp.float32))
    else:
        out_specs = pl.BlockSpec((1, tile, g * g, c),
                                 lambda bi, j, *_: (bi, j, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, v_pad, g * g, c), flat.dtype)
    out = pl.pallas_call(
        partial(_resident_pool_kernel, tile=tile, g=g, quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0 in SMEM
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if quant:
        q, s = out
        return (q[:, :v].reshape(b, v, g, g, c), s[:, :v, :1])
    return out[:, :v].reshape(b, v, g, g, c)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def resident_pool_trainable(flat, row0, x0, wy, wx, tile=8, interpret=False):
    """Differentiable resident pooling: Pallas forward + the same windowed
    scatter-add backward as window_pool_trainable (grads to `flat` only)."""
    return pallas_resident_pool(flat, row0, x0, wy, wx, tile=tile,
                                interpret=interpret)


def _rpt_fwd(flat, row0, x0, wy, wx, tile, interpret):
    out = pallas_resident_pool(flat, row0, x0, wy, wx, tile=tile,
                               interpret=interpret)
    stub = jnp.broadcast_to(jnp.zeros((), flat.dtype), flat.shape)
    return out, (stub, row0, x0, wy, wx)


def _rpt_bwd(tile, interpret, res, g):
    stub, row0, x0, wy, wx = res
    b, rows = stub.shape[:2]
    v = row0.shape[1]
    g = g.astype(jnp.float32).reshape(b * v, *g.shape[2:])
    wy_f = wy.reshape(b * v, *wy.shape[2:])
    wx_f = wx.reshape(b * v, *wx.shape[2:])
    # absolute rows into the (B*rows, Wmax, C) view of flat
    img_off = jnp.arange(b, dtype=jnp.int32)[:, None] * rows
    row_abs = (row0.astype(jnp.int32) + img_off).reshape(b * v)
    m = jnp.einsum("ngy,nghc->nyhc", wy_f, g)
    gwin = jnp.einsum("nyhc,nhx->nyxc", m, wx_f)
    g_flat = _accumulate_windows(
        row_abs, x0.reshape(b * v), gwin, (b * rows,) + stub.shape[2:],
        stub.dtype, f32_dot=interpret).reshape(stub.shape)
    return g_flat, None, None, None, None


resident_pool_trainable.defvjp(_rpt_fwd, _rpt_bwd)


def batched_pyramid_pool_resident(flat_batch: jnp.ndarray, pyr_meta: Pyramid,
                                  rois_views: jnp.ndarray, batch: int, *,
                                  output_size: int = 7,
                                  samples_per_bin: int = 2, tile: int = 8,
                                  interpret: bool = False,
                                  trainable: bool = False, quant_bias=None):
    """Resident-pyramid pooling over a batch (see batched_pyramid_pool).

    flat_batch: (B * rows, Wmax, C) stacked pyramids; rois_views (N, 4) with
    N = B * views_per_image, GROUPED BY IMAGE (image-major order — the
    layout pool_rois produces). Returns (N, G, G, C).
    """
    rows = pyr_meta.flat.shape[0]
    wmax, c = flat_batch.shape[1:]
    n = rois_views.shape[0]
    assert n % batch == 0, (n, batch)
    v = n // batch
    row0, x0, wy, wx = view_geometry(
        pyr_meta, rois_views, output_size=output_size,
        samples_per_bin=samples_per_bin)
    g = wy.shape[1]
    args = (flat_batch.reshape(batch, rows, wmax, c),
            row0.reshape(batch, v), x0.reshape(batch, v),
            wy.reshape(batch, v, g, WINDOW), wx.reshape(batch, v, g, WINDOW_X))
    if trainable:
        assert quant_bias is None, "quantized emission is eval-only"
        out = resident_pool_trainable(*args, tile, interpret)
    elif quant_bias is not None:
        q, s = pallas_resident_pool(*args, tile=tile, interpret=interpret,
                                    quant_bias=quant_bias)
        return q.reshape(n, g, g, c), s.reshape(n, 1)
    else:
        out = pallas_resident_pool(*args, tile=tile, interpret=interpret)
    return out.reshape(n, g, g, c)


def batched_pyramid_pool_multi(flat_batches, pyr_metas, rois_views_per_level,
                               img_idx, *, output_size: int = 7,
                               samples_per_bin: int = 2, tile: int = 8,
                               interpret: bool = False,
                               trainable: bool = False, quant_bias=None):
    """Level-summed pooling over batched pyramids (see batched_pyramid_pool).

    flat_batches: list of L (B * rows_l, Wmax_l, C) stacked pyramids;
    pyr_metas: list of L single-image Pyramid metas;
    rois_views_per_level: ONE (N, 4) array shared by all levels.
    Returns (N, G, G, C) summed over levels.
    """
    row0s, x0s, wys, wxs = [], [], [], []
    for flat_b, meta in zip(flat_batches, pyr_metas):
        rows_per_image = meta.flat.shape[0]
        row0, x0, wy, wx = view_geometry(
            meta, rois_views_per_level, output_size=output_size,
            samples_per_bin=samples_per_bin)
        row0s.append(row0 + img_idx.astype(jnp.int32) * rows_per_image)
        x0s.append(x0)
        wys.append(wy)
        wxs.append(wx)
    if trainable:
        assert quant_bias is None, "quantized emission is eval-only"
        rows_list = tuple(meta.flat.shape[0] for meta in pyr_metas)
        batch = flat_batches[0].shape[0] // rows_list[0]
        return multi_window_pool_trainable(
            list(flat_batches), row0s, x0s, wys, wxs, tile, interpret,
            rows_list, batch)
    return pallas_window_pool_multi(
        list(flat_batches), row0s, x0s, wys, wxs, tile=tile,
        interpret=interpret, quant_bias=quant_bias)

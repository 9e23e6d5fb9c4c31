"""Pyramid ROI align — the TPU-native ROI feature extractor.

Why not direct gather-based roi_align (ops/roi.py)? Profiling on the real v5e
(2026-08-16) put the XLA per-sample gather at 864ms for 8x512 ROIs — 95% of
inference — and Mosaic's dynamic_gather does not compile on this toolchain.
TPUs want dense, static, contiguous access; per-sample scatter/gather is a
GPU-ism. Redesign (DESIGN.md):

  1. For each backbone level, pre-build a 2x avg-pool pyramid ONCE per image
     (dense, cheap, fuses into the trunk).
  2. Each (ROI, foveal) view picks the pyramid scale where its 7 bins span
     1-2 cells => all of its bilinear samples live in a fixed 16x16 window.
  3. Extract the window with a single dynamic_slice (no gather) and evaluate
     all G*S x G*S samples as two small matmuls:
         V = Wy @ window @ Wx^T      (Wy/Wx: dense (G*S, 16) bilinear weights)
     then mean/max over the S x S samples per bin.

Numerics: for ROIs whose bins already span <= 2 cells at the base scale this
is EXACTLY roi_align (level 0, same samples — tested bit-close in
tests/test_roi_pyramid.py). For larger ROIs the samples read the 2^l-pooled
map: anti-aliased area sampling instead of roi_align's sparse point sampling —
a deliberate, documented improvement (large-ROI point sampling aliases; cf.
ViP, PAPERS.md, on pooling approximations).

The whole op is static-shaped XLA (vmapped dynamic_slice + batched matmul);
ops/roi_pallas.py supplies a fused kernel with identical semantics; this
module is its oracle.

Pyramid storage: each level's scales are stacked along rows in ONE
(sum_rows, Wmax, C) buffer with per-scale row offsets, so scale selection is
an offset add, not a tensor switch.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Pyramid scale rule: each (ROI, foveal) view picks the scale where its bins
# span (0.5, 1] cell — samples are then spaced <= 0.5 cells (S=2), i.e. dense
# area sampling of the pooled map. The G-bin sampling extent is <= G - 0.5
# cells + 1 fractional start + 1 bilinear neighbor, so the window is
# G-DEPENDENT (r3 fix: the constants below were silently applied to every
# output size, clipping any G > 7 — e.g. the 28x28 mask decoder — into a
# 10-row window):


def window_sizes(output_size: int) -> tuple:
    """-> (rows, cols) of the sampling window for a G-bin view.

    rows: G + 3 (G=7 -> 10, the tuned detector window). cols: + up to 7
    alignment-slack cells (the Pallas twin 8-aligns the window origin down;
    this XLA path shares the geometry so the two stay testably equal),
    rounded up to a multiple of 8 (G=7 -> 16)."""
    return output_size + 3, -(-(output_size + 9) // 8) * 8


# The G=7 instances — the detector geometry the Pallas kernels
# (ops/roi_pallas.py) are hard-tuned to; they assert G <= 7 and share these.
WINDOW, WINDOW_X = window_sizes(7)
# History: the first kernel used bins in (1, 2] with 16x24 windows; the
# (0.5, 1] rule cuts window DMA traffic 2.4x for identical output structure
# (docs/PERF.md) at the cost of one extra pyramid scale.


class Pyramid(NamedTuple):
    flat: jnp.ndarray        # (sum_rows, Wmax, C)
    row_offsets: jnp.ndarray  # (L,) int32 — scale l starts at this row
    heights: jnp.ndarray     # (L,) int32 — valid rows per scale
    widths: jnp.ndarray      # (L,) int32 — valid cols per scale
    base_scale: float        # spatial_scale of scale 0 (e.g. 1/4 for c3)
    num_scales: int


def num_scales_for(h: int, w: int, output_size: int = 7) -> int:
    """Enough scales that the largest possible ROI has bins within a cell."""
    span = max(h, w) / output_size
    return max(1, int(math.ceil(math.log2(max(span, 1.0)))) + 1)


# Padding value for max pyramids: large-negative finite (min-finite of f32;
# also representable in bf16). Masked maxes never select it for non-empty
# bins (bin extents are clamped into the valid map) — it only guards the
# buffer padding.
_NEG = -3.0e38


def build_pyramid(feat: jnp.ndarray, spatial_scale: float,
                  num_scales: int | None = None,
                  output_size: int = 7, mode: str = "avg") -> Pyramid:
    """feat (H, W, C) -> stacked 2x pooled pyramid. Pure XLA, fuses with the
    trunk; cost ~1.33x the base map in memory/bandwidth.

    mode="avg" (default): 2x area pooling, zero padding — the roi_align
    family. mode="max": 2x max pooling, large-negative padding — feeds
    pyramid_roi_pool_max (the windowed reference-exact-max path)."""
    h, w, c = feat.shape
    if num_scales is None:
        num_scales = num_scales_for(h, w, output_size)
    win_y, win_x = window_sizes(output_size)
    wmax = max(-(-w // 8) * 8, win_x)
    min_rows = max(win_y, 1)
    pad_val = 0.0 if mode == "avg" else _NEG
    levels, heights, widths = [], [], []
    cur = feat
    for _ in range(num_scales):
        ch, cw = cur.shape[:2]
        heights.append(ch)
        widths.append(cw)
        rows = max(ch, min_rows)
        lv = jnp.full((rows, wmax, c), pad_val, feat.dtype)
        lv = lv.at[:ch, :cw].set(cur)
        levels.append(lv)
        # 2x pool (pad odd dims)
        ph, pw = ch + (ch % 2), cw + (cw % 2)
        nxt = jnp.full((ph, pw, c), pad_val, feat.dtype).at[:ch, :cw].set(cur)
        if mode == "max":
            cur = nxt.reshape(ph // 2, 2, pw // 2, 2, c).max(axis=(1, 3))
            continue
        cnt = jnp.zeros((ph, pw, 1), feat.dtype).at[:ch, :cw].set(1.0)
        pooled = nxt.reshape(ph // 2, 2, pw // 2, 2, c).sum(axis=(1, 3))
        norm = cnt.reshape(ph // 2, 2, pw // 2, 2, 1).sum(axis=(1, 3))
        cur = pooled / jnp.maximum(norm, 1.0)
    row_offsets = jnp.asarray(
        [0] + list(jnp.cumsum(jnp.asarray([l.shape[0] for l in levels]))[:-1]),
        jnp.int32)
    return Pyramid(
        flat=jnp.concatenate(levels, axis=0),
        row_offsets=row_offsets,
        heights=jnp.asarray(heights, jnp.int32),
        widths=jnp.asarray(widths, jnp.int32),
        base_scale=spatial_scale,
        num_scales=num_scales,
    )


def build_pyramid_batch(feats: jnp.ndarray, spatial_scale: float,
                        num_scales: int | None = None,
                        output_size: int = 7, mode: str = "avg"):
    """feats (B, H, W, C) -> (flat_batch (B*rows, Wmax, C), meta Pyramid).

    meta describes ONE image's pyramid (static fields stay Python ints —
    plain vmap over build_pyramid would try to batch them).
    """
    b, h, w, _ = feats.shape
    if num_scales is None:
        num_scales = num_scales_for(h, w, output_size)
    flat_b = jax.vmap(
        lambda x: build_pyramid(x, spatial_scale, num_scales, output_size,
                                mode).flat
    )(feats)
    meta = build_pyramid(feats[0], spatial_scale, num_scales, output_size,
                         mode)
    meta = Pyramid(flat_b[0], meta.row_offsets, meta.heights, meta.widths,
                   spatial_scale, num_scales)
    return flat_b.reshape(b * flat_b.shape[1], *flat_b.shape[2:]), meta


def _sample_weights(coords: jnp.ndarray, window: int) -> jnp.ndarray:
    """coords (N,) local window coords -> (N, window) bilinear weight rows."""
    cells = jnp.arange(window, dtype=coords.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - cells[None, :]))


def _one_roi(pyr: Pyramid, roi: jnp.ndarray, g: int, s: int, mode: str):
    """roi (4,) image coords -> (G, G, C) pooled features."""
    f32 = jnp.float32
    b = roi.astype(f32) * pyr.base_scale  # base-level cells
    x1, y1, x2, y2 = b[0], b[1], b[2], b[3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    span = jnp.maximum(bw, bh) / g  # cells per bin at base scale
    # scale where bins span (0.5, 1] cell (see WINDOW comment above)
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(span, 1.0))).astype(jnp.int32),
        0, pyr.num_scales - 1)
    cell = jnp.exp2(lvl.astype(f32))  # base cells per cell at lvl

    hl = pyr.heights[lvl].astype(f32)
    wl = pyr.widths[lvl].astype(f32)

    # sample positions in lvl-cells, clamped to the valid map
    off = (jnp.arange(g * s, dtype=f32) // s) + \
        ((jnp.arange(g * s) % s).astype(f32) + 0.5) / s
    sy = jnp.clip((y1 + off * bh / g) / cell, 0.0, hl - 1.0)
    sx = jnp.clip((x1 + off * bw / g) / cell, 0.0, wl - 1.0)

    win_y, win_x = window_sizes(g)
    y0 = jnp.clip(jnp.floor(sy[0]).astype(jnp.int32), 0,
                  jnp.maximum(pyr.heights[lvl] - win_y, 0))
    x0 = jnp.clip(jnp.floor(sx[0]).astype(jnp.int32), 0,
                  jnp.maximum(pyr.widths[lvl] - win_x, 0))

    wy = _sample_weights(jnp.clip(sy - y0.astype(f32), 0.0, win_y - 1.0),
                         win_y)
    wx = _sample_weights(jnp.clip(sx - x0.astype(f32), 0.0, win_x - 1.0),
                         win_x)

    row = pyr.row_offsets[lvl] + y0
    win = lax.dynamic_slice(
        pyr.flat, (row, x0, 0), (win_y, win_x, pyr.flat.shape[-1]))
    win = win.astype(f32)

    # V[i, j, c] = sum_y sum_x wy[i,y] win[y,x,c] wx[j,x]
    t = jnp.einsum("iy,yxc->ixc", wy, win)
    v = jnp.einsum("ixc,jx->ijc", t, wx)  # (G*S, G*S, C)
    c = v.shape[-1]
    v = v.reshape(g, s, g, s, c)
    if mode == "avg":
        return v.mean(axis=(1, 3))
    if mode == "max":
        return v.max(axis=(1, 3))
    raise ValueError(f"mode must be avg|max, got {mode!r}")


def _one_roi_max(pyr: Pyramid, roi: jnp.ndarray, g: int):
    """Reference-exact ROIPooling max (inn.ROIPooling / ops.roi.roi_pool_max
    semantics) through the same 10x16 window machinery as _one_roi: integer
    floor/ceil bin extents, max over covered cells, empty bins -> 0 —
    evaluated as two masked max-reductions over the window instead of the
    bilinear W2 GEMMs (VERDICT r2 item 7: parity evals shouldn't pay the
    864 ms/batch gather path).

    `pyr` must be a mode="max" pyramid. Exactness contract (pinned in
    tests/test_roi_pyramid.py): for views whose bins span <= 1 base cell
    (level 0) the output is BIT-EXACT vs roi_pool_max; larger views apply
    the same floor/ceil rule at the selected pyramid scale, i.e. bin edges
    quantize to 2^l base cells — the reference's own over-coverage rule at
    the pyramid's cell size (each level-l cell is the max of its 2^l x 2^l
    base cells). docs/PARITY.md records the distinction; roi_impl="direct"
    remains the bit-exact-at-all-scales oracle."""
    f32 = jnp.float32
    b = roi.astype(f32) * pyr.base_scale  # base-level cells
    bw = jnp.maximum(b[2] - b[0], 1e-6)
    bh = jnp.maximum(b[3] - b[1], 1e-6)
    span = jnp.maximum(bw, bh) / g
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(span, 1.0))).astype(jnp.int32),
        0, pyr.num_scales - 1)
    cell = jnp.exp2(lvl.astype(f32))

    # the reference formula, applied at level-l granularity
    x1 = jnp.floor(b[0] / cell)
    y1 = jnp.floor(b[1] / cell)
    x2 = jnp.ceil(b[2] / cell)
    y2 = jnp.ceil(b[3] / cell)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    roi_w = jnp.maximum(x2 - x1, 1.0)
    hl = pyr.heights[lvl].astype(f32)
    wl = pyr.widths[lvl].astype(f32)
    bins = jnp.arange(g, dtype=f32)
    ys = jnp.clip(jnp.floor(y1 + bins * roi_h / g), 0, hl)
    ye = jnp.clip(jnp.ceil(y1 + (bins + 1) * roi_h / g), 0, hl)
    xs = jnp.clip(jnp.floor(x1 + bins * roi_w / g), 0, wl)
    xe = jnp.clip(jnp.ceil(x1 + (bins + 1) * roi_w / g), 0, wl)

    win_y, win_x = window_sizes(g)
    y0 = jnp.clip(y1.astype(jnp.int32), 0,
                  jnp.maximum(pyr.heights[lvl] - win_y, 0))
    x0 = jnp.clip(x1.astype(jnp.int32), 0,
                  jnp.maximum(pyr.widths[lvl] - win_x, 0))

    # window-cell membership masks: (G, win_y) / (G, win_x)
    wy_cells = (y0 + jnp.arange(win_y, dtype=jnp.int32)).astype(f32)
    wx_cells = (x0 + jnp.arange(win_x, dtype=jnp.int32)).astype(f32)
    my = (wy_cells[None, :] >= ys[:, None]) & (wy_cells[None, :] < ye[:, None])
    mx = (wx_cells[None, :] >= xs[:, None]) & (wx_cells[None, :] < xe[:, None])

    row = pyr.row_offsets[lvl] + y0
    win = lax.dynamic_slice(
        pyr.flat, (row, x0, 0),
        (win_y, win_x, pyr.flat.shape[-1])).astype(f32)

    # two-stage masked max: rows into bins, then cols into bins
    t = jnp.max(jnp.where(my[:, :, None, None], win[None], _NEG),
                axis=1)                                   # (G, WX, C)
    v = jnp.max(jnp.where(mx[None, :, :, None], t[:, None], _NEG),
                axis=2)                                   # (G, G, C)
    empty = (ye <= ys)[:, None] | (xe <= xs)[None, :]
    return jnp.where(empty[:, :, None] | (v <= _NEG / 2), 0.0, v)


def pyramid_roi_align(pyr: Pyramid, rois: jnp.ndarray, *,
                      output_size: int = 7, samples_per_bin: int = 2,
                      mode: str = "avg") -> jnp.ndarray:
    """rois (R, 4) image coords -> (R, G, G, C). vmapped static-window sampler.

    mode="avg"|"max": bilinear point samples, mean/max per bin (avg pyramid).
    mode="exact_max": reference ROIPooling max semantics (max pyramid)."""
    if mode == "exact_max":
        return jax.vmap(
            lambda r: _one_roi_max(pyr, r, output_size))(rois)
    return jax.vmap(
        lambda r: _one_roi(pyr, r, output_size, samples_per_bin, mode)
    )(rois)


def multilevel_foveal_pyramid_features(
    pyramids: dict,          # {level_name: Pyramid}
    rois: jnp.ndarray,       # (R, 4) image coords
    *,
    foveal_factors=(1.0, 1.5, 2.0, 4.0),
    image_hw=None,
    output_size: int = 7,
    samples_per_bin: int = 2,
    mode: str = "avg",
    combine: str = "concat",
) -> jnp.ndarray:
    """Drop-in replacement for ops.roi.multilevel_foveal_roi_features with
    pyramid sampling: (F, R, G, G, sum_l C_l) for combine="concat",
    (F, R, G, G, C) for combine="sum" (pre-reduced equal-C levels)."""
    from multipathnet_tpu.ops import boxes as box_ops

    out_per_f = []
    for f in foveal_factors:
        if image_hw is not None:
            r = box_ops.expand(rois, f, image_hw[0], image_hw[1])
        else:
            r = box_ops.expand(rois, f)
        pooled = [
            pyramid_roi_align(pyr, r, output_size=output_size,
                              samples_per_bin=samples_per_bin, mode=mode)
            for pyr in pyramids.values()
        ]
        if combine == "sum":
            out_per_f.append(sum(pooled))
        else:
            out_per_f.append(jnp.concatenate(pooled, axis=-1))
    return jnp.stack(out_per_f, axis=0)

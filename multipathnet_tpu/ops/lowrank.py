"""Truncated-SVD low-rank factorization of the FC detection heads (serving).

Fast R-CNN §3.1 "Truncated SVD for faster detection" (PAPERS.md,
arXiv:1504.08083) — the reference family's own deployment compression: at
export, each fc kernel W (K, N) is replaced by its rank-t factorization
W ≈ A @ B with A = U_t (K, t) and B = diag(s_t) V_tᵀ (t, N), turning one
GEMM into two with t·(K+N) ≪ K·N MACs. The paper compressed VGG-16's fc6
to t=1024 and fc7 to t=256 for a ~30% detection speedup at ~0.3 mAP cost.

Here it is a LOAD/EXPORT-TIME transform like int8 quantization (and composes
with it — factorize first in float, then ops.quant.quantize_head_params
quantizes both factors; Int8Dense's dynamic per-row activation scales
re-quantize the rank-t intermediate in-graph). Checkpoints stay full-rank
float; `factorize_head_params` rewrites fc6_f{i}/fc7_f{i} {kernel, bias}
into fc6_f{i}_u {kernel (K, t)} + fc6_f{i} {kernel (t, N), bias} — the
layout a head built with fc6_rank/fc7_rank > 0 expects (models/heads.py).

Exactness: at t = min(K, N) the factorization reproduces W to f32 SVD
round-off (pinned by tests/test_lowrank.py); accuracy at reduced rank is
pinned on a trained model's AP. SVD runs on host NumPy — a one-time export
cost (~minutes for the 25088x4096 fc6 at full scale, trivial in tests).
"""

from __future__ import annotations

import numpy as np


def factorize_kernel(w, rank: int):
    """(K, N) float kernel -> (A (K, rank), B (rank, N)) with A @ B ≈ W.

    A = U_t, B = diag(s_t) V_tᵀ (singular values folded into B so A's
    columns stay orthonormal — keeps A's dynamic range tame for the int8
    per-channel weight quantization that may follow)."""
    w = np.asarray(w, np.float32)
    k, n = w.shape
    assert 1 <= rank <= min(k, n), (rank, w.shape)
    u, s, vt = np.linalg.svd(w, full_matrices=False)
    a = u[:, :rank]
    b = s[:rank, None] * vt[:rank]
    return a.astype(np.float32), b.astype(np.float32)


def is_factored(params) -> bool:
    """True if the head params already carry low-rank factor layers."""
    from collections.abc import Mapping

    def scan(d) -> bool:
        if not isinstance(d, Mapping):
            return False
        return any(
            (isinstance(k, str) and k.endswith("_u")
             and (k.startswith("fc6_f") or k.startswith("fc7_f")))
            or scan(v)
            for k, v in d.items())

    return scan(params)


def factorize_head_params(params, fc6_rank: int = 0, fc7_rank: int = 0):
    """One-time transform: factorize every fc6_f*/fc7_f* Dense kernel in the
    (float) param tree at the given ranks (0 = leave that family full-rank).
    Everything else — trunk, reduces, cls_bbox, biases — is untouched. The
    returned tree matches a model built with the same fc6_rank/fc7_rank.

    Must run BEFORE int8 quantization (needs float kernels; asserts)."""
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params

    def rank_for(name: str) -> int:
        if name.startswith("fc6_f") and not name.endswith("_u"):
            return fc6_rank
        if name.startswith("fc7_f") and not name.endswith("_u"):
            return fc7_rank
        return 0

    def walk(d):
        out = {}
        for k, v in d.items():
            r = rank_for(k) if isinstance(v, dict) else 0
            if r > 0 and isinstance(v, dict) and "kernel" in v:
                assert "kernel_i8" not in v, (
                    f"{k} is already int8-quantized; factorize the FLOAT "
                    "checkpoint first, then quantize")
                assert f"{k}_u" not in d, f"{k} is already factored"
                a, b = factorize_kernel(v["kernel"], r)
                out[f"{k}_u"] = {"kernel": a}
                out[k] = {"kernel": b,
                          **({"bias": v["bias"]} if "bias" in v else {})}
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(tree)

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


def check_factored_ranks(params, fc6_rank: int, fc7_rank: int) -> None:
    """Validate that an already-factored tree's factor shapes match the
    config's ranks. `is_factored` is rank-agnostic, so without this check a
    tree factored at DIFFERENT ranks would pass straight through export and
    only fail with an opaque flax shape error at bundle load (r3 ADVICE,
    low). Raises ValueError naming the mismatching layer."""
    from collections.abc import Mapping

    want = {"fc6_f": fc6_rank, "fc7_f": fc7_rank}

    def scan(d):
        if not isinstance(d, Mapping):
            return
        for k, v in d.items():
            if (isinstance(k, str) and k.endswith("_u")
                    and isinstance(v, Mapping) and "kernel" in v):
                for prefix, r in want.items():
                    if k.startswith(prefix):
                        got = v["kernel"].shape[1]
                        if got != r:
                            raise ValueError(
                                f"params are factored at rank {got} for {k} "
                                f"but the config says "
                                f"{prefix.rstrip('_f')}_rank={r}; re-export "
                                "from the full-rank float checkpoint")
            scan(v)

    scan(params)


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
            if r > 0 and isinstance(v, dict) and "kernel_i8" in v:
                # ValueError, not assert: a user-reachable deploy-path error
                # (re-exporting a quantized tree with SVD ranks added), and
                # asserts vanish under python -O. Checked BEFORE the "kernel"
                # gate — the int8 layout has no float "kernel" leaf, so the
                # tree would otherwise pass through unfactored and fail with
                # an opaque flax shape error at first apply (r3 ADVICE, low).
                raise ValueError(
                    f"{k} is already int8-quantized; SVD factorization "
                    "needs float kernels — re-export from the float "
                    "checkpoint (factorize first, then quantize)")
            if r > 0 and isinstance(v, dict) and "kernel" in v:
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

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
pinned on a trained model's AP (docs/PERF.md "SVD serving"). SVD runs on
host NumPy at export; deep truncations route through a randomized range
finder (factorize_kernel method="auto") — exact SVD of one 25088x4096 fc6
kernel measured ~10 minutes on a 1-core host, randomized runs in seconds
at near-optimal truncation error.
"""

from __future__ import annotations

import warnings

import numpy as np

# Relative Frobenius truncation error above which factorize_head_params
# warns. Measured context (2026-08-19, 256² synthetic train run): a
# 100-step checkpoint's near-init fc6 kernels (flat spectrum) truncate at
# rel err ~0.8 at the paper ranks and the factored model's AP collapses to
# 0.0 while plain int8 stays IDENTICAL to float — truncated SVD is only a
# valid serving transform once the weights have trained long enough to
# develop spectral decay (docs/PERF.md "SVD serving").
TRUNCATION_WARN_REL_ERR = 0.5


def factorize_kernel(w, rank: int, method: str = "auto",
                     oversample: int = 16, power_iters: int = 2,
                     seed: int = 0):
    """(K, N) float kernel -> (A (K, rank), B (rank, N)) with A @ B ≈ W.

    A = U_t, B = diag(s_t) V_tᵀ (singular values folded into B so A's
    columns stay orthonormal — keeps A's dynamic range tame for the int8
    per-channel weight quantization that may follow).

    method:
      "exact"      — full np.linalg.svd then truncate. O(K·N·min(K,N)):
                     ~10 min PER 25088x4096 fc6 kernel on a 1-core host —
                     fine for tests, hostile for real exports.
      "randomized" — Halko/Martinsson/Tropp randomized range finder
                     (random projection + QR + small exact SVD, with
                     `power_iters` subspace iterations and `oversample`
                     extra columns). O(K·N·rank): the same fc6 kernel
                     factorizes in seconds, with truncation error within
                     fractions of a percent of optimal at these spectra
                     (pinned by tests/test_lowrank.py). Deterministic for
                     a given seed.
      "auto"       — randomized when the truncation is deep
                     (rank + oversample < min(K, N) // 2, the regime where
                     it both wins time and stays near-optimal), exact
                     otherwise (shallow truncations / tiny kernels, where
                     exact is cheap and randomized loses its advantage).
    """
    w = np.asarray(w, np.float32)
    k, n = w.shape
    assert 1 <= rank <= min(k, n), (rank, w.shape)
    if method == "auto":
        method = ("randomized"
                  if rank + oversample < min(k, n) // 2 else "exact")
    if method == "exact":
        u, s, vt = np.linalg.svd(w, full_matrices=False)
    else:
        assert method == "randomized", method
        rng = np.random.default_rng(seed)
        r = min(rank + oversample, min(k, n))
        # range finder on the TALL side (K >= N: sample the row space)
        tall = w if k >= n else w.T
        g = rng.standard_normal((tall.shape[1], r)).astype(np.float32)
        y = tall @ g
        for _ in range(power_iters):  # sharpen the spectrum (Halko alg 4.4)
            y, _ = np.linalg.qr(y)
            y = tall @ (tall.T @ y)
        q, _ = np.linalg.qr(y)                 # (max(K,N), r) orthonormal
        bb = q.T @ tall                        # (r, min(K,N))
        ub, s, vt_s = np.linalg.svd(bb, full_matrices=False)
        u_tall = q @ ub                        # (max(K,N), r)
        if k >= n:
            u, vt = u_tall, vt_s
        else:  # w = (tall)^T = V S U^T of the tall factorization
            u, vt = vt_s.T, u_tall.T
    a = u[:, :rank]
    b = s[:rank, None] * vt[:rank]
    return a.astype(np.float32), b.astype(np.float32)


def truncation_rel_err(w, a, b) -> float:
    """Relative Frobenius error ||W - AB|| / ||W|| of a factorization from
    factorize_kernel, in O(K·N) without forming AB: A's columns are
    orthonormal and B = AᵀW (both constructions), so AB is an orthogonal
    projection of W and ||W - AB||² = ||W||² - ||B||² (Pythagoras)."""
    wsq = float(np.sum(np.square(np.asarray(w, np.float32))))
    bsq = float(np.sum(np.square(np.asarray(b, np.float32))))
    return float(np.sqrt(max(0.0, 1.0 - bsq / max(wsq, 1e-30))))


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


def factorize_head_params(params, fc6_rank: int = 0, fc7_rank: int = 0,
                          report: dict | None = None):
    """One-time transform: factorize every fc6_f*/fc7_f* Dense kernel in the
    (float) param tree at the given ranks (0 = leave that family full-rank).
    Everything else — trunk, reduces, cls_bbox, biases — is untouched. The
    returned tree matches a model built with the same fc6_rank/fc7_rank.

    Must run BEFORE int8 quantization (needs float kernels; asserts).

    If `report` is a dict it is filled with {kernel name: relative Frobenius
    truncation error}. Independently, a UserWarning fires when any kernel
    truncates worse than TRUNCATION_WARN_REL_ERR — the checkpoint's spectrum
    is too flat for the requested rank (typically: undertrained weights; see
    the constant's docstring for the measured AP-0.0 failure this guards)."""
    import flax

    tree = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
    errs = report if report is not None else {}

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
                errs[k] = truncation_rel_err(v["kernel"], a, b)
                out[f"{k}_u"] = {"kernel": a}
                out[k] = {"kernel": b,
                          **({"bias": v["bias"]} if "bias" in v else {})}
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    out = walk(tree)
    bad = {k: e for k, e in errs.items() if e > TRUNCATION_WARN_REL_ERR}
    if bad:
        worst = max(bad, key=bad.get)
        warnings.warn(
            f"truncated-SVD rank is too aggressive for this checkpoint's "
            f"spectrum: {len(bad)}/{len(errs)} kernels lose >"
            f"{TRUNCATION_WARN_REL_ERR:.0%} of their Frobenius energy "
            f"(worst {worst}: rel err {bad[worst]:.2f}). Undertrained "
            f"checkpoints have near-flat spectra and factor to garbage "
            f"(measured AP 0.0 — docs/PERF.md 'SVD serving'); train "
            f"longer or raise fc6_rank/fc7_rank.", stacklevel=2)
    return out

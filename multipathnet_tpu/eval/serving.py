"""Serving bundles: the deployment artifact for trained detectors.

The reference deployed `torch.save`'d `.t7` model files (SURVEY.md §2.1 demo
row: `resnet18_integral_coco.t7`) that fused weights + architecture. The
TPU-native equivalent is a self-contained directory:

    bundle/
      config.json     # the full Config tree (architecture + eval protocol)
      params.msgpack  # flax-serialized param tree, already in SERVING form
                      # (int8 head when config.model.head_quant == "int8")

`save_bundle` quantizes at export (ops/quant.py) so the artifact loads
straight onto the chip with zero load-time transforms; `load_detector`
rebuilds the exact jitted graph. Bundles are inference-only — training
checkpoints (orbax, float) remain the source of truth, and a bundle is one
`cli.export_serving` call away from any of them.
"""

from __future__ import annotations

import json
import os

from multipathnet_tpu.core.config import Config


def save_bundle(path: str, cfg: Config, params, quant: str = "keep",
                svd_report: dict | None = None) -> None:
    """Write a serving bundle. `params` is a float (training) tree unless the
    cfg already carries a quantized head. quant: "keep" honors
    cfg.model.head_quant; "int8"/"none" override it (the exported config is
    rewritten to match, so load_detector builds the right head).

    `svd_report`, if given, is filled with per-kernel SVD truncation errors
    when the config carries fc ranks (ops/lowrank.factorize_head_params) —
    cli.export_serving prints it so an export against an undertrained
    checkpoint is visibly lossy, not just warned about."""
    import dataclasses

    import flax.serialization

    from multipathnet_tpu.ops.quant import quantize_head_params

    if quant != "keep":
        assert quant in ("int8", "none"), quant
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, head_quant=quant))
    import jax

    if cfg.model.fc6_rank or cfg.model.fc7_rank:
        # truncated-SVD compression (ops/lowrank.py) happens at export, like
        # quantization — and must precede it (SVD needs float kernels)
        from multipathnet_tpu.ops.lowrank import (check_factored_ranks,
                                                  factorize_head_params,
                                                  is_factored)

        if not is_factored(params):
            params = factorize_head_params(
                params, cfg.model.fc6_rank, cfg.model.fc7_rank,
                report=svd_report)
        else:
            # already-factored trees must match the config's ranks, or the
            # bundle would only fail at load with a flax shape error
            check_factored_ranks(params, cfg.model.fc6_rank,
                                 cfg.model.fc7_rank)

    already_quantized = any(
        "kernel_i8" in str(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params))
    if cfg.model.head_quant == "int8":
        if not already_quantized:
            params = quantize_head_params(params)
    elif already_quantized:
        # no dequantize path exists: a float config over int8 params would
        # only fail at first apply, after deployment — fail at export instead
        raise ValueError(
            "params are already int8-quantized but the bundle config says "
            "head_quant='none'; re-export from the float checkpoint")

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    import jax

    params = jax.device_get(params)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))


def load_bundle(path: str):
    """-> (cfg, model, params): the architecture + serving-form weights."""
    import flax.serialization

    from multipathnet_tpu.models.multipath import build_model

    with open(os.path.join(path, "config.json")) as f:
        cfg = Config.from_json(f.read())
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = flax.serialization.msgpack_restore(f.read())
    return cfg, build_model(cfg.model), params


def load_detector(path: str, mesh=None):
    """One-call serving entry: bundle dir -> ready Detector (optionally DP
    over a mesh — eval/detect.py Detector semantics)."""
    from multipathnet_tpu.eval.detect import Detector

    cfg, model, params = load_bundle(path)
    return Detector(model, params, cfg, mesh=mesh)

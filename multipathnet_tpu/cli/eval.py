"""Evaluation entry point — run_test.lua analog (SURVEY.md §2.1, §3.2).

    python -m multipathnet_tpu.cli.eval --preset tiny --synthetic \
        --checkpoint-dir /tmp/mpnet_ckpt
Prints the full COCO metric table; exits nonzero if no data.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np

from multipathnet_tpu.cli import common


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_args(p)
    p.add_argument("--checkpoint-dir", default="",
                   help="restore params from here (default: random init)")
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--json", action="store_true",
                   help="print metrics as one JSON line")
    args = p.parse_args(argv)

    cfg = common.build_config(args)
    loader, props = common.resolve_data(args, cfg)
    if loader.num_classes != cfg.model.num_classes:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, num_classes=loader.num_classes))

    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.train.loop import Trainer

    # checkpoints are float trees: restore against a float model; the int8
    # serving path (head_quant="int8") is applied to the EVAL model below
    # (Detector quantizes the restored float params at load)
    quant = cfg.model.head_quant
    float_cfg = cfg if quant == "none" else cfg.replace(
        model=dataclasses.replace(cfg.model, head_quant="none"))
    trainer = Trainer(float_cfg)
    state = trainer.init_state()
    if args.checkpoint_dir:
        import os

        from multipathnet_tpu.train.checkpoint import Checkpointer

        ckpt = Checkpointer(os.path.join(args.checkpoint_dir, "ckpt"))
        restored = ckpt.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
        state = restored
        print(f"restored step {int(np.asarray(state.step))}")

    # DP eval over every available chip (largest device count dividing the
    # eval batch; single-device hosts degrade to a plain jit)
    from multipathnet_tpu.core.mesh import DATA_AXIS, largest_data_mesh

    mesh = largest_data_mesh(max(cfg.train.batch_size, 1))
    n = mesh.shape[DATA_AXIS]
    if n == 1:
        mesh = None
    else:
        print(f"eval mesh: {n}-wide data parallel")

    eval_model = trainer.model
    if quant != "none":
        from multipathnet_tpu.models.multipath import build_model

        eval_model = build_model(cfg.model)
        print(f"head_quant={quant}: quantizing restored checkpoint at load")
    tester = Tester(eval_model, state.params, cfg, loader, props,
                    mesh=mesh)
    metrics = tester.test(max_images=args.max_images or None, verbose=not args.json)
    if args.json:
        print(json.dumps({k: round(v, 5) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()

"""Evaluation entry point — run_test.lua analog (SURVEY.md §2.1, §3.2).

    python -m multipathnet_tpu.cli.eval --preset tiny --synthetic \
        --checkpoint-dir /tmp/mpnet_ckpt
Prints the full COCO metric table; exits nonzero if no data.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

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

    trainer, state = common.restore_float_state(cfg, args.checkpoint_dir)

    # DP eval over every available chip (largest device count dividing the
    # eval batch; single-device hosts degrade to a plain jit)
    from multipathnet_tpu.core.mesh import DATA_AXIS, largest_data_mesh

    mesh = largest_data_mesh(max(cfg.train.batch_size, 1))
    n = mesh.shape[DATA_AXIS]
    if n == 1:
        mesh = None
    else:
        import sys

        print(f"eval mesh: {n}-wide data parallel", file=sys.stderr)

    tester = Tester(common.eval_model_for(cfg, trainer), state.params, cfg,
                    loader, props, mesh=mesh)
    metrics = tester.test(max_images=args.max_images or None, verbose=not args.json)
    if args.json:
        print(json.dumps({k: round(v, 5) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()

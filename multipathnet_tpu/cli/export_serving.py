"""Export a serving bundle from a training checkpoint.

    python -m multipathnet_tpu.cli.export_serving --preset multipath_vgg16_batched \
        --checkpoint-dir /tmp/mpnet_ckpt --out /tmp/mpnet_bundle --quant int8

The TPU-native analog of shipping a `.t7` model file (SURVEY.md §2.1 demo
row): the bundle fuses config + weights, with the FC heads already quantized
for the MXU's int8 path when --quant int8 (the default; docs/PERF.md r3:
75.4 -> 104.6 img/s on the headline bench, AP-preservation tested).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from multipathnet_tpu.cli import common


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_args(p)
    p.add_argument("--checkpoint-dir", default="",
                   help="orbax checkpoint dir (default: random init — "
                        "useful only for smoke tests)")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--quant", default="int8", choices=("int8", "none"),
                   help="head quantization of the exported bundle")
    p.add_argument("--svd-fc6", type=int, default=-1, metavar="RANK",
                   help="truncated-SVD rank for fc6 (Fast R-CNN §3.1; "
                        "0 = full rank; default: the preset's fc6_rank)")
    p.add_argument("--svd-fc7", type=int, default=-1, metavar="RANK",
                   help="truncated-SVD rank for fc7 (0 = full rank; "
                        "default: the preset's fc7_rank)")
    args = p.parse_args(argv)

    cfg = common.build_config(args)
    if args.svd_fc6 >= 0 or args.svd_fc7 >= 0:
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model,
            fc6_rank=args.svd_fc6 if args.svd_fc6 >= 0 else cfg.model.fc6_rank,
            fc7_rank=args.svd_fc7 if args.svd_fc7 >= 0 else cfg.model.fc7_rank,
        ))

    from multipathnet_tpu.eval.serving import save_bundle

    trainer, state = common.restore_float_state(cfg, args.checkpoint_dir)
    if args.checkpoint_dir:
        print(f"exporting step {int(np.asarray(state.step))}")

    svd_report: dict = {}
    save_bundle(args.out, cfg, state.params, quant=args.quant,
                svd_report=svd_report)
    if svd_report:
        # per-kernel SVD truncation loss, visible at export time — an
        # undertrained checkpoint's flat spectrum factors to garbage
        # (measured AP 0.0; ops/lowrank.py TRUNCATION_WARN_REL_ERR)
        print("SVD truncation rel err: " + ", ".join(
            f"{k}={e:.3f}" for k, e in sorted(svd_report.items())))
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in sorted(os.listdir(args.out))}
    print(f"bundle written to {args.out}: " +
          ", ".join(f"{f} ({s/1e6:.1f} MB)" for f, s in sizes.items()))


if __name__ == "__main__":
    main()

"""VERDICT r4 #6: can REAL training produce a decayed-spectrum checkpoint
where int8+SVD serving tracks float accuracy?

The r4 matrix showed SVD(1024/256) losing a third of AP on every checkpoint
this environment can produce — because a 16-image overfit barely moves the
Frobenius mass off the flat random-init spectrum (docs/PERF.md "SVD
serving"). The physical claim behind the headline config is that trained
VGG-16 spectra DECAY (Fast R-CNN §3.1 measured -0.3 mAP at these ranks on
the real ImageNet+COCO net). Weight decay is the mechanism that shrinks the
task-irrelevant random mass while gradients keep replenishing the task
subspace, so a soak with real (strong) weight decay is the honest way to
move this fixture along the spectrum axis.

    PYTHONPATH=/root/.axon_site:. python tools/soak_svd_decay.py \
        [--steps 2000] [--wd 0.1] [--snap-every 500] [--size 256]

Per snapshot it reports fc6/fc7 relative Frobenius truncation error at the
headline ranks and the full float / int8 / SVD / int8+SVD COCO eval — the
same 4-way protocol as the r4 matrix, in ONE process (each config's detect
graph compiles once; params are jit args).
"""

from __future__ import annotations

import argparse
import dataclasses
import faulthandler
import signal
import sys
import tempfile
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--snap-every", type=int, default=500)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--eval-batch", type=int, default=8)
    args = p.parse_args()

    # the VGG-16 train-step compile runs ~25 min through the remote
    # compiler (measured r5); the persistent cache is the difference
    # between paying it once and paying it per soak. MPNET_COMPILE_CACHE=off
    # still disables.
    from multipathnet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.data import synthetic
    from multipathnet_tpu.data.coco import CocoLoader
    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.data.proposals import ProposalStore
    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.models.multipath import build_model
    from multipathnet_tpu.ops.lowrank import factorize_head_params
    from multipathnet_tpu.ops.quant import quantize_head_params
    from multipathnet_tpu.train.loop import Trainer

    s = args.size
    cfg = preset("multipath_vgg16_train")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=(s, s)),
        train=dataclasses.replace(
            cfg.train, lr=args.lr, weight_decay=args.wd, warmup_steps=0,
            total_steps=args.steps),
    )
    log(f"backend={jax.default_backend()} wd={args.wd} lr={args.lr} "
        f"steps={args.steps} size={s}")

    root = tempfile.mkdtemp(prefix="mpnet_soak_")
    fx = synthetic.generate(root, num_images=args.images, image_size=s,
                            num_classes=cfg.model.num_classes - 1,
                            proposals_per_image=64, seed=7)
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    pipe = DetectionPipeline(loader, props, cfg.data,
                             batch_size=cfg.train.batch_size,
                             seed=cfg.train.seed)

    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    log("state initialized")

    # one Tester per serving config, compiled ONCE — snapshot params are
    # swapped in as jit args (Detector passes self.params per call)
    r6, r7 = 1024, 256
    mk = lambda **kw: cfg.replace(model=dataclasses.replace(cfg.model, **kw))
    configs = {
        "float": mk(),
        "int8": mk(head_quant="int8"),
        "svd": mk(fc6_rank=r6, fc7_rank=r7),
        "int8+svd": mk(head_quant="int8", fc6_rank=r6, fc7_rank=r7),
    }
    testers = {}

    def snapshot_eval(step, params):
        import warnings

        # ONE host factorization per snapshot (the Halko pass on 4x fc6
        # 25088x4096 kernels costs minutes on this 1-core host) — its
        # report carries the rel-err table and its tree feeds both SVD
        # serving configs
        report: dict = {}
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            factored = factorize_head_params(params, r6, r7, report=report)
        f6 = [v for k, v in report.items() if "fc6" in k]
        f7 = [v for k, v in report.items() if "fc7" in k]
        log(f"[step {step}] rel trunc err: fc6 "
            f"{min(f6):.3f}-{max(f6):.3f}  fc7 {min(f7):.3f}-{max(f7):.3f} "
            f"(factorize {time.time()-t0:.0f}s)")
        trees = {
            "float": params,
            "int8": quantize_head_params(params),
            "svd": factored,
            "int8+svd": quantize_head_params(factored),
        }
        row = {}
        for name, ccfg in configs.items():
            t0 = time.time()
            pq = trees[name]
            if name not in testers:
                testers[name] = Tester(build_model(ccfg.model), pq, ccfg,
                                       loader, props,
                                       batch_size=args.eval_batch)
            else:
                testers[name].detector.params = pq
            ap = testers[name].test()
            row[name] = ap
            log(f"[step {step}] {name:9s} AP {ap['AP']:.4f} "
                f"AP50 {ap['AP50']:.4f} AP75 {ap['AP75']:.4f} "
                f"({time.time()-t0:.0f}s)")
        gap = row["float"]["AP"] - row["int8+svd"]["AP"]
        log(f"[step {step}] float-vs-int8+svd AP gap: {gap:+.4f}")
        return row

    t0 = time.time()
    step = 0
    ep = 0
    while step < args.steps:
        for batch in pipe.epoch(ep):
            state, m = trainer.step(state, batch)
            step += 1
            if step == 1:
                log(f"step 1 done ({time.time()-t0:.0f}s incl. train "
                    f"compile)")
            if step % 100 == 0:
                log(f"step {step}: loss {float(m['loss']):.4f} "
                    f"({(time.time()-t0)/step*1e3:.0f} ms/step)")
            if step % args.snap_every == 0 or step == args.steps:
                snapshot_eval(step, state.params)
            if step >= args.steps:
                break
        ep += 1
    log("done")


if __name__ == "__main__":
    main()

"""Bulk proposal export: run the SharpMask net over a split and write the
proposals .npz the detector consumes.

This is the reference's offline-proposal workflow (SURVEY.md §0: proposals
are computed offline by DeepMask/SharpMask and stored on disk; training/eval
consume the files). Usage:

    python -m multipathnet_tpu.cli.export_proposals --preset tiny --synthetic \
        --dataset-root /tmp/ds --proposal-checkpoint-dir /tmp/smrun \
        --output /tmp/ds/proposals_generated.npz --top-k 64
"""

from __future__ import annotations

import argparse

import numpy as np

from multipathnet_tpu.cli import common


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_config_args(p)
    p.add_argument("--proposal-checkpoint-dir", default="",
                   help="SharpMask checkpoint (random init if omitted)")
    p.add_argument("--output", required=True, help="output proposals .npz")
    p.add_argument("--top-k", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--with-masks", action="store_true",
                   help="decode a segmentation mask per proposal and store "
                        "it as compressed RLE alongside the boxes — the "
                        "reference's DeepMask/SharpMask proposal files were "
                        "mask proposals (SURVEY.md §0); this makes the "
                        "exported .npz the same artifact shape")
    p.add_argument("--mask-threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    cfg = common.build_config(args)
    loader, _ = common.resolve_data(args, cfg)

    import jax.numpy as jnp

    from multipathnet_tpu.data.proposals import ProposalStore
    from multipathnet_tpu.data.transforms import normalize
    from multipathnet_tpu.models.sharpmask import generate_proposals
    from multipathnet_tpu.train.proposal import ProposalTrainer

    trainer = ProposalTrainer(cfg)
    state = trainer.init_state()
    if args.proposal_checkpoint_dir:
        import os

        from multipathnet_tpu.train.checkpoint import Checkpointer

        restored = Checkpointer(os.path.join(
            args.proposal_checkpoint_dir, "ckpt")).restore_latest(state)
        if restored is None:
            raise SystemExit(
                f"no checkpoint under {args.proposal_checkpoint_dir}")
        state = restored
        print(f"proposal net: restored step {int(np.asarray(state.step))}")

    import jax

    @jax.jit
    def run(params, images):
        out = generate_proposals(trainer.model, params, images,
                                 top_k=args.top_k,
                                 with_masks=args.with_masks)
        return (out["boxes"], out["scores"],
                out.get("masks", jax.numpy.zeros((0,))))

    sizes = {loader.image_size(i) for i in range(len(loader))}
    if len(sizes) != 1:
        raise SystemExit(
            "export_proposals currently requires uniform image sizes "
            f"(got {sorted(sizes)[:4]}...); resize offline or extend with "
            "the padded-canvas path used by the detector pipeline")

    boxes_per, scores_per, ids, rles = [], [], [], []
    bs = args.batch_size
    n = len(loader)
    for s in range(0, n, bs):
        idxs = list(range(s, min(s + bs, n)))
        raw = np.stack([loader.load_image(i) for i in
                        idxs + [idxs[-1]] * (bs - len(idxs))])
        images = normalize(jnp.asarray(raw))
        b, sc, mk = run(state.params, images)
        b, sc = np.asarray(b), np.asarray(sc)
        for j, i in enumerate(idxs):
            boxes_per.append(b[j])
            scores_per.append(sc[j])
            ids.append(loader.image_id(i))
            if args.with_masks:
                from multipathnet_tpu.data import rle as rle_codec

                h, w = loader.image_size(i)
                rles.extend(rle_codec.masks_to_rles(
                    np.asarray(mk[j]), b[j], h, w,
                    threshold=args.mask_threshold))
        print(f"\r{min(s + bs, n)}/{n} images", end="", flush=True)
    print()
    store = ProposalStore.from_lists(boxes_per, scores_per, ids)
    if args.with_masks:
        store.rles = rles
    store.save(args.output)
    print(f"wrote {args.output}: {len(ids)} images x {args.top_k} proposals"
          + (" (+RLE masks)" if args.with_masks else ""))


if __name__ == "__main__":
    main()

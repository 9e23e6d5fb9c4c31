"""PASCAL VOC loader + end-to-end VOC protocol (SURVEY.md §2.1 'and PASCAL';
round-1 VERDICT missing #2: the evaluator existed with no data source)."""

import dataclasses

import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.core.mesh import make_mesh
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.data.voc import VOC_CLASSES, VocLoader


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    fx = synthetic.generate_voc(root, num_images=8, image_size=64,
                                num_classes=4, proposals_per_image=24,
                                seed=5, difficult_frac=0.25)
    return root, fx


def test_voc_loader_roundtrip(voc_tree):
    root, fx = voc_tree
    loader = VocLoader(root, split="test")
    assert len(loader) == 8
    assert loader.num_classes == 21  # standard 20 VOC classes + bg
    assert loader.protocol == "voc"
    saw_difficult = False
    for i in range(len(loader)):
        img = loader.load_image(i)
        h, w = loader.image_size(i)
        assert img.shape == (h, w, 3) == (64, 64, 3)
        ann = loader.annotations(i)
        g = len(ann["boxes"])
        assert g >= 1
        assert ann["classes"].min() >= 1 and ann["classes"].max() <= 4
        assert not ann["iscrowd"].any()
        assert ann["difficult"].shape == (g,)
        saw_difficult |= bool(ann["difficult"].any())
        # 1-based-inclusive -> 0-based-half-open roundtrip within XML rounding
        assert np.all(ann["boxes"][:, 2] > ann["boxes"][:, 0])
        assert np.all(ann["boxes"][:, :2] >= -0.01)
        assert np.all(ann["boxes"][:, 2:] <= 64.01)
    assert saw_difficult  # difficult_frac=0.25 over ~20 objects


def test_voc_boxes_match_generated_geometry(voc_tree):
    """The XML coordinate convention is exact: proposals were jittered from
    the same GT, so every image has at least one proposal with IoU > 0.5
    against a loaded GT box."""
    from multipathnet_tpu.ops import boxes as box_ops

    import jax.numpy as jnp

    root, fx = voc_tree
    loader = VocLoader(root, split="test")
    props = ProposalStore.load(fx["proposals"])
    for i in range(len(loader)):
        ann = loader.annotations(i)
        pb, _ = props.for_image_id(loader.image_id(i))
        iou = np.asarray(box_ops.iou_matrix(jnp.asarray(pb),
                                            jnp.asarray(ann["boxes"])))
        assert iou.max() > 0.5, f"image {i}: max IoU {iou.max():.2f}"


@pytest.mark.slow
def test_voc_e2e_train_and_map(voc_tree):
    """Mirror of the COCO e2e overfit test on the VOC protocol: pipeline ->
    train -> Tester routes to the VOC devkit mAP evaluator, mAP rises."""
    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.train.loop import Trainer

    root, fx = voc_tree
    loader = VocLoader(root, split="test", classes=VOC_CLASSES[:4])
    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    props = ProposalStore.load(fx["proposals"])
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)

    from state_cache import cached_state

    def build():
        state = trainer.init_state()
        before = Tester(trainer.model, state.params, cfg, loader, props,
                        batch_size=2).test()
        for ep in range(12):
            for batch in pipe.epoch(ep):
                state, m = trainer.step(state, batch)
        return state, before

    state, before = cached_state("voc-e2e-12ep", build)
    assert "mAP" in before  # VOC protocol auto-selected from the loader
    after = Tester(trainer.model, state.params, cfg, loader, props,
                   batch_size=2).test()
    assert after["mAP"] > before["mAP"] + 0.1, (before["mAP"], after["mAP"])
    assert any(k.startswith("AP_") for k in after)


def test_eval_cli_voc_synthetic(tmp_path, capsys):
    """VERDICT #5 acceptance: `cli/eval --dataset voc` on a synthetic tree."""
    import json

    from multipathnet_tpu.cli import eval as eval_cli

    eval_cli.main([
        "--preset", "tiny", "--synthetic", "--dataset", "voc",
        "--dataset-root", str(tmp_path / "voc"),
        "--json",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    m = json.loads(out)
    assert "mAP" in m

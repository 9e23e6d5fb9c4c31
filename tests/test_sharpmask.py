"""SharpMask proposal generator: shapes, anchors, training smoke, generation
quality after overfit (config-5 capability, SURVEY.md §3.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.core.mesh import make_mesh
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.coco import CocoLoader
from multipathnet_tpu.data.pipeline import DetectionPipeline
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.models.sharpmask import (SharpMaskNet, anchor_boxes,
                                               generate_proposals)
from multipathnet_tpu.train.proposal import ProposalTrainer


def test_anchor_boxes():
    a = np.asarray(anchor_boxes(4, 4, 16, (32.0, 64.0)))
    assert a.shape == (32, 4)
    # first cell center (8, 8), scale 32 -> box (-8, -8, 24, 24)
    np.testing.assert_allclose(a[0], [-8, -8, 24, 24])
    np.testing.assert_allclose(a[1], [-24, -24, 40, 40])
    w = a[:, 2] - a[:, 0]
    assert set(np.unique(w)) == {32.0, 64.0}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("sm_ds")
    fx = synthetic.generate(str(root), num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=8, seed=21)
    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, num_classes=5, backbone="tinynet"))
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    trainer = ProposalTrainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0,
                             with_masks=True, mask_size=28)
    return cfg, trainer, pipe, loader


def test_pipeline_produces_mask_targets(setup):
    cfg, trainer, pipe, loader = setup
    batch = next(pipe.epoch(0))
    assert batch.gt_masks is not None
    g = cfg.data.max_gt_per_image
    assert batch.gt_masks.shape == (2, g, 28, 28)
    valid = batch.gt_mask[0]
    # valid GT slots have non-trivial masks (the shape fills part of its box)
    for gi in np.nonzero(valid)[0]:
        m = batch.gt_masks[0, gi]
        assert 0.05 < m.mean() <= 1.0


def test_forward_and_generate_shapes(setup):
    cfg, trainer, pipe, loader = setup
    state = trainer.init_state()
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = generate_proposals(trainer.model, state.params, images, top_k=16)
    assert out["boxes"].shape == (2, 16, 4)
    assert out["scores"].shape == (2, 16)
    assert out["masks"].shape == (2, 16, 28, 28)
    b = np.asarray(out["boxes"])
    assert b.min() >= 0 and b.max() <= 64
    s = np.asarray(out["scores"])
    assert np.all((s >= 0) & (s <= 1))


@pytest.mark.slow
def test_proposal_training_learns_objectness(setup):
    cfg, trainer, pipe, loader = setup
    state = trainer.init_state()
    losses = []
    for ep in range(12):
        for batch in pipe.epoch(ep):
            state, m = trainer.step(state, batch)
            losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses[:2] + losses[-2:]

    # trained proposals should cover GT decently: recall@16 at IoU 0.5
    from multipathnet_tpu.ops.boxes import iou_matrix

    hits, total = 0, 0
    for i in range(4):
        img = loader.load_image(i).astype(np.float32)
        from multipathnet_tpu.data.transforms import normalize

        x = jnp.asarray(normalize(jnp.asarray(img)))[None]
        out = generate_proposals(trainer.model, state.params, x, top_k=16,
                                 with_masks=False)
        ann = loader.annotations(i)
        iou = np.asarray(iou_matrix(jnp.asarray(out["boxes"][0]),
                                    jnp.asarray(ann["boxes"])))
        hits += (iou.max(0) >= 0.5).sum()
        total += len(ann["boxes"])
    recall = hits / max(total, 1)
    assert recall >= 0.5, f"proposal recall@16 too low: {recall:.2f}"

"""End-to-end golden test: train on synthetic -> COCO AP rises from ~0 to
high (SURVEY.md §4: 'the effective integration test is the evaluator').

This is the offline analog of the reference's minival-reproduction check:
every production component runs — synthetic COCO on disk, host pipeline,
device-side preprocessing + sampling, MultiPath foveal/skip/integral model,
detection graph with NMS, self-contained AP evaluator.
Calibration (CPU, 2026-08-16): untrained AP50=0.02, ep30 AP50=0.82.
"""

import dataclasses

import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.core.mesh import make_mesh
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.coco import CocoLoader
from multipathnet_tpu.data.pipeline import DetectionPipeline
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.eval.tester import Tester
from multipathnet_tpu.train.loop import Trainer


@pytest.mark.slow
def test_overfit_synthetic_reaches_high_ap(tmp_path):
    fx = synthetic.generate(str(tmp_path), num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=24, seed=5)
    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)

    state = trainer.init_state()
    before = Tester(trainer.model, state.params, cfg, loader, props,
                    batch_size=2).test()
    losses = []
    for ep in range(30):
        for batch in pipe.epoch(ep):
            state, m = trainer.step(state, batch)
            losses.append(float(m["loss"]))
    after = Tester(trainer.model, state.params, cfg, loader, props,
                   batch_size=2).test()

    assert np.all(np.isfinite(losses))
    assert after["AP50"] > 0.5, (before, after)
    assert after["AP50"] > before["AP50"] + 0.3
    assert losses[-1] < losses[0] * 0.75

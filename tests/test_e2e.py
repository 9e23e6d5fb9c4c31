"""End-to-end golden test: train on synthetic -> COCO AP rises from ~0 to
high (SURVEY.md §4: 'the effective integration test is the evaluator').

This is the offline analog of the reference's minival-reproduction check:
every production component runs — synthetic COCO on disk, host pipeline,
device-side preprocessing + sampling, MultiPath foveal/skip/integral model,
detection graph with NMS, self-contained AP evaluator.
Calibration (CPU, 2026-08-16): untrained AP50=0.02, ep30 AP50=0.82.
The trained state is built by the session-scoped `overfit_tiny` fixture
(tests/conftest.py) and shared with the int8 AP-preservation test.
"""

import numpy as np
import pytest

from multipathnet_tpu.eval.tester import Tester


@pytest.mark.slow
def test_overfit_synthetic_reaches_high_ap(overfit_tiny):
    fx = overfit_tiny
    after = Tester(fx["trainer"].model, fx["state"].params, fx["cfg"],
                   fx["loader"], fx["props"], batch_size=2).test()
    losses = fx["losses"]

    assert np.all(np.isfinite(losses))
    assert after["AP50"] > 0.5, (fx["before"], after)
    assert after["AP50"] > fx["before"]["AP50"] + 0.3
    assert losses[-1] < losses[0] * 0.75

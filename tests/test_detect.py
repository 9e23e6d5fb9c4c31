"""Detection path contract tests (eval/detect.py + tester.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.coco import CocoLoader
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.eval.detect import Detector, detect_batch
from multipathnet_tpu.eval.tester import Tester, groundtruth_to_coco
from multipathnet_tpu.models.multipath import build_model

RNG = np.random.default_rng(6)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("det_ds")
    fx = synthetic.generate(str(root), num_images=4, image_size=64,
                            num_classes=4, proposals_per_image=24, seed=9)
    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    model = build_model(cfg.model)
    images = jnp.zeros((1, *cfg.data.image_size, 3), jnp.float32)
    rois = jnp.asarray([[[0, 0, 32, 32]]], jnp.float32)
    params = model.init(jax.random.key(0), images, rois)
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    return cfg, model, params, loader, props


def _batch_inputs(loader, props, cfg, n=2):
    from multipathnet_tpu.data.pipeline import DetectionPipeline

    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=n, seed=0)
    idxs, batch = next(pipe.eval_batches())
    return idxs, batch


def test_detector_output_contract(setup):
    cfg, model, params, loader, props = setup
    det = Detector(model, params, cfg)
    idxs, batch = _batch_inputs(loader, props, cfg)
    out = det(batch.images, batch.src_hws, batch.proposals, batch.prop_mask)
    d = cfg.eval.max_detections
    b = batch.images.shape[0]
    assert out["boxes"].shape == (b, d, 4)
    assert out["scores"].shape == (b, d)
    assert out["classes"].shape == (b, d)
    v = out["valid"]
    assert np.all(out["scores"][v] >= 0) and np.all(out["scores"][v] <= 1)
    assert np.all(out["classes"][v] >= 1)
    assert np.all(out["classes"][v] <= cfg.model.num_classes - 1)
    bx = out["boxes"][v]
    # boxes in ORIGINAL image coords, inside the 64x64 image
    assert bx.min() >= -1e-3 and bx.max() <= 64 + 1e-3
    assert np.all(bx[:, 2] >= bx[:, 0]) and np.all(bx[:, 3] >= bx[:, 1])


def test_detector_chunking_invariance(setup):
    cfg, model, params, loader, props = setup
    idxs, batch = _batch_inputs(loader, props, cfg)
    outs = []
    for chunk in (8, 32):
        c2 = cfg.replace(eval=dataclasses.replace(cfg.eval, roi_chunk=chunk))
        out = jax.jit(
            lambda p, im, hw, pr, pm: detect_batch(p, model, c2, im, hw, pr, pm)
        )(params, jnp.asarray(batch.images), jnp.asarray(batch.src_hws),
          jnp.asarray(batch.proposals), jnp.asarray(batch.prop_mask))
        outs.append(jax.tree.map(np.asarray, out))
    np.testing.assert_allclose(outs[0]["scores"], outs[1]["scores"],
                               atol=1e-5)
    np.testing.assert_allclose(outs[0]["boxes"], outs[1]["boxes"], atol=1e-3)


def test_tester_runs_and_scores(setup):
    cfg, model, params, loader, props = setup
    tester = Tester(model, params, cfg, loader, props, batch_size=2)
    metrics = tester.test()
    assert "AP" in metrics and "AP50" in metrics
    assert -1.0 <= metrics["AP"] <= 1.0  # random weights: likely ~0


def test_tester_dp_mesh_matches_single_device(setup):
    """First-class DP eval (r3): Tester(mesh=) shards each eval batch over
    the mesh's data axis and must reproduce the single-device metrics —
    the split loop is unchanged, GSPMD partitions the detect graph."""
    from multipathnet_tpu.core.mesh import make_mesh

    cfg, model, params, loader, props = setup
    m1 = Tester(model, params, cfg, loader, props, batch_size=2).test()
    m2 = Tester(model, params, cfg, loader, props, batch_size=2,
                mesh=make_mesh(n_data=2)).test()
    for k in ("AP", "AP50", "AP75"):
        assert m1[k] == pytest.approx(m2[k], abs=1e-6), k


def test_groundtruth_conversion(setup):
    _, _, _, loader, _ = setup
    gts = groundtruth_to_coco(loader)
    assert len(gts) >= 4
    for g in gts:
        assert g["bbox"][2] > 0 and g["bbox"][3] > 0
        assert g["category_id"] in loader.category_ids


def test_detector_hostile_inputs_stay_finite(setup):
    """Robustness probes promoted from the on-TPU verify script: all-invalid
    proposal masks, garbage coordinates in masked-out rows, zero-area but
    VALID boxes, and uint8 inputs must all produce finite, masked output."""
    cfg, model, params, loader, props = setup
    b, p = 2, 24
    images = jnp.asarray(RNG.integers(0, 255, (b, 64, 64, 3)), jnp.uint8)
    src_hws = jnp.full((b, 2), 64.0, jnp.float32)
    x1 = RNG.uniform(0, 40, (b, p)).astype(np.float32)
    y1 = RNG.uniform(0, 40, (b, p)).astype(np.float32)
    w = RNG.uniform(4, 24, (b, p)).astype(np.float32)
    props_a = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + w], -1))
    # garbage coords in masked-out tail + a zero-area valid box
    props_a = props_a.at[:, -4:].set(jnp.asarray([1e4, 1e4, 1e4, 1e4]))
    props_a = props_a.at[:, 5].set(jnp.asarray([20.0, 20.0, 20.0, 20.0]))
    mask = jnp.ones((b, p), bool).at[:, -4:].set(False)

    out = detect_batch(params, model, cfg, images, src_hws, props_a, mask)
    for k in ("boxes", "scores"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # no detection may originate from a masked-out (garbage) proposal slot
    valid = np.asarray(out["valid"])
    src = np.asarray(out["indices"])
    assert not np.any(valid & (src >= p - 4)), "garbage slot leaked through"

    # all-invalid mask: finite and (at most) nothing valid survives scoring
    out0 = detect_batch(params, model, cfg, images, src_hws, props_a,
                        jnp.zeros((b, p), bool))
    assert np.isfinite(np.asarray(out0["scores"])).all()
    assert int(np.asarray(out0["valid"]).sum()) == 0

"""Multi-device semantics on the virtual 8-CPU mesh (SURVEY.md §4
'distributed tests'): DP equivalence across mesh widths, DP+TP equivalence,
and real TP sharding of the FC kernels."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.core.mesh import MODEL_AXIS, make_mesh
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.coco import CocoLoader
from multipathnet_tpu.data.pipeline import DetectionPipeline
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("shard_ds")
    fx = synthetic.generate(str(root), num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=16, seed=31)
    cfg = preset("tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, num_classes=5, fc_dim=64),
        train=dataclasses.replace(cfg.train, batch_size=4))
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=4, seed=0)
    return cfg, next(pipe.epoch(0))


def _loss_after_step(cfg, batch, mesh):
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    state, m = trainer.step(state, batch)
    return float(m["loss"]), trainer, state


@pytest.mark.slow
def test_dp_width_invariance(data):
    """Same batch, same seed: loss identical on 1-, 2-, and 4-wide data
    meshes (the psum is an implementation detail, not a semantic one)."""
    cfg, batch = data
    l1, _, _ = _loss_after_step(cfg, batch, make_mesh(n_data=1))
    l2, _, _ = _loss_after_step(cfg, batch, make_mesh(n_data=2))
    l4, _, _ = _loss_after_step(cfg, batch, make_mesh(n_data=4))
    assert l1 == pytest.approx(l2, rel=1e-5)
    assert l1 == pytest.approx(l4, rel=1e-5)


@pytest.mark.slow
def test_dp_tp_matches_dp(data):
    """2x2 (data x model) mesh computes the same loss as pure DP, and the
    FC kernels are actually sharded over the model axis."""
    cfg, batch = data
    l_dp, _, _ = _loss_after_step(cfg, batch, make_mesh(n_data=4))
    l_tp, trainer, state = _loss_after_step(
        cfg, batch, make_mesh(n_data=2, n_model=2))
    assert l_dp == pytest.approx(l_tp, rel=1e-4)

    fc6 = state.params["params"]["head"]["fc6_f0"]["kernel"]
    spec = fc6.sharding.spec
    assert spec[-1] == MODEL_AXIS, f"fc6 kernel not TP-sharded: {spec}"
    # each shard holds half the output features
    shard_shape = fc6.sharding.shard_shape(fc6.shape)
    assert shard_shape[1] == fc6.shape[1] // 2
    fc7 = state.params["params"]["head"]["fc7_f0"]["kernel"]
    assert fc7.sharding.spec[0] == MODEL_AXIS  # row-parallel


def test_tp_second_step_runs(data):
    cfg, batch = data
    _, trainer, state = _loss_after_step(
        cfg, batch, make_mesh(n_data=2, n_model=2))
    state, m = trainer.step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(np.asarray(state.step)) == 2


@pytest.mark.slow
def test_tp4_matches_dp(data):
    """Model axis wider than 2: a 2x4 (data x model) mesh reproduces the
    pure-DP loss and shards each FC kernel into quarters — the Megatron
    rules must hold at any width that divides fc_dim."""
    cfg, batch = data
    l_dp, _, _ = _loss_after_step(cfg, batch, make_mesh(n_data=4))
    l_tp, _, state = _loss_after_step(
        cfg, batch, make_mesh(n_data=2, n_model=4))
    assert l_dp == pytest.approx(l_tp, rel=1e-4)
    fc6 = state.params["params"]["head"]["fc6_f0"]["kernel"]
    assert fc6.sharding.shard_shape(fc6.shape)[1] == fc6.shape[1] // 4

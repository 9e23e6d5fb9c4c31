"""Training integration: overfit the synthetic set, checkpoint/resume,
determinism (SURVEY.md §4 'determinism tests', M4 smoke test)."""

import jax
import numpy as np
import pytest

from multipathnet_tpu.core.config import preset
from multipathnet_tpu.core.mesh import make_mesh
from multipathnet_tpu.data import synthetic
from multipathnet_tpu.data.coco import CocoLoader
from multipathnet_tpu.data.pipeline import DetectionPipeline
from multipathnet_tpu.data.proposals import ProposalStore
from multipathnet_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    fx = synthetic.generate(str(root), num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=24, seed=5)
    cfg = preset("tiny")
    cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "num_classes": 5}))
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    mesh = make_mesh(n_data=2)
    trainer = Trainer(cfg, mesh=mesh)
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)
    return cfg, trainer, pipe, loader, props


def test_train_loss_decreases(setup):
    cfg, trainer, pipe, *_ = setup
    state = trainer.init_state()
    losses = []
    for epoch in range(8):
        for batch in pipe.epoch(epoch):
            state, m = trainer.step(state, batch)
            losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    first, last = np.mean(losses[:4]), np.mean(losses[-4:])
    assert last < first * 0.8, f"no learning: {first:.3f} -> {last:.3f}"
    assert int(np.asarray(state.step)) == len(losses)


def test_device_prefetch_preserves_stream(setup):
    """epoch_on_device must yield the same batches, in order, as epoch() —
    it only moves the host->device transfer earlier. Also pins depth > n
    and the step-compatibility of prefetched (device-resident) batches."""
    from multipathnet_tpu.data.pipeline import device_prefetch

    cfg, trainer, pipe, *_ = setup
    host = list(pipe.epoch(0))
    dev = list(pipe.epoch_on_device(0, trainer.shard_batch))
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        for hf, df in zip(hb, db):
            if hf is not None:
                np.testing.assert_array_equal(np.asarray(hf), np.asarray(df))
    # depth larger than the stream: everything still comes out once
    out = list(device_prefetch(iter(range(3)), lambda x: x * 10, depth=8))
    assert out == [0, 10, 20]
    # a prefetched batch feeds the jitted step unchanged
    state = trainer.init_state()
    state, m = trainer.step(state, dev[0])
    assert np.isfinite(float(m["loss"]))


def test_train_step_deterministic(setup):
    cfg, trainer, pipe, *_ = setup
    batch = next(pipe.epoch(0))
    s1, m1 = trainer.step(trainer.init_state(), batch)
    s2, m2 = trainer.step(trainer.init_state(), batch)
    assert float(m1["loss"]) == float(m2["loss"])
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_contract(setup):
    cfg, trainer, pipe, *_ = setup
    batch = next(pipe.epoch(1))
    _, m = trainer.step(trainer.init_state(), batch)
    k = len(cfg.model.integral_thresholds)
    for key in ["loss", "loss_cls", "loss_bbox", "acc_head0", "num_fg",
                "grad_norm"] + [f"loss_cls_h{i}" for i in range(k)]:
        assert key in m, key
        assert np.isfinite(float(m[key])), key
    assert float(m["num_fg"]) > 0  # jittered-GT proposals guarantee fg


def test_checkpoint_roundtrip(setup, tmp_path):
    from multipathnet_tpu.train.checkpoint import Checkpointer

    cfg, trainer, pipe, *_ = setup
    state = trainer.init_state()
    batch = next(pipe.epoch(2))
    state, _ = trainer.step(state, batch)
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(state, force=True)
    ck.wait()
    assert ck.latest_step() == 1
    restored = ck.restore_latest(trainer.init_state())
    assert int(np.asarray(restored.step)) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state steps identically to the original
    s_a, m_a = trainer.step(state, batch)
    s_b, m_b = trainer.step(restored, batch)
    assert float(m_a["loss"]) == float(m_b["loss"])


def test_checkpoint_cross_mesh_portability(setup, tmp_path):
    """r4 VERDICT #8: TP shards params AND momentum (core/mesh.py
    tree_sharding), so a checkpoint written under a DP×TP mesh must restore
    on a DIFFERENT mesh — a single device, and a different TP width —
    bit-identically, and the restored state must take a working step.
    Deploy-relevant the day a real pod appears: serving meshes rarely match
    training meshes."""
    from multipathnet_tpu.train.checkpoint import Checkpointer

    cfg, _, pipe, *_ = setup
    batch = next(pipe.epoch(3))

    tr_a = Trainer(cfg, mesh=make_mesh(n_data=2, n_model=2))
    state = tr_a.init_state()
    for _ in range(2):  # two steps: non-trivial momentum in opt_state
        state, _ = tr_a.step(state, batch)
    host = jax.tree.map(np.asarray, (state.params, state.opt_state))
    ck = Checkpointer(str(tmp_path / "xmesh"))
    ck.save(state, force=True)
    ck.wait()

    # 1-device mesh and a WIDER TP mesh (fc_dim 64 shards 4-way; cls_bbox's
    # 50-dim output falls back to replicated at TP4, col-parallel at TP2 —
    # i.e. the restore also crosses a per-leaf layout change)
    single = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    wide = make_mesh(n_data=2, n_model=4)
    for mesh in (single, wide):
        tr_b = Trainer(cfg, mesh=mesh)
        restored = Checkpointer(str(tmp_path / "xmesh")).restore_latest(
            tr_b.init_state())
        assert int(np.asarray(restored.step)) == 2
        got = jax.tree.map(np.asarray, (restored.params, restored.opt_state))
        for a, b in zip(jax.tree_util.tree_leaves(host),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(a, b)
        s2, m = tr_b.step(restored, batch)
        assert np.isfinite(float(m["loss"]))
        assert int(np.asarray(s2.step)) == 3


def test_freeze_backbone_all_trunks():
    """NoBackprop analog (round-1 VERDICT weak #4): freezing must zero grads
    on the named stages for EVERY backbone, not just VGG."""
    import dataclasses

    import jax.numpy as jnp

    from multipathnet_tpu.models.backbones import get_backbone
    from multipathnet_tpu.train.loop import _freeze_mask

    cases = {
        "vgg16": ("conv1_1", "conv2_2"),
        "resnet18": ("stem", "stage2_block0"),
        "alexnet": ("conv1", "conv2"),
        "tinynet": ("conv1", "conv2"),
    }
    for name, frozen_names in cases.items():
        bb = get_backbone(name, jnp.float32)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        # mimic the model param tree layout: params under a "backbone" scope
        tree = {"params": {"backbone": variables["params"],
                           "head": {"fc6_f0": {"kernel": jnp.zeros((2, 2))}}}}
        mask = _freeze_mask(tree, 2, bb)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        frozen = {".".join(str(getattr(p, "key", "")) for p in path): v
                  for path, v in flat}
        n_frozen = sum(1 for v in frozen.values() if v == 0.0)
        assert n_frozen > 0, f"{name}: nothing frozen"
        for want in frozen_names:
            hits = [k for k in frozen if f".{want}" in k]
            assert hits, f"{name}: no params match {want}"
            assert all(frozen[k] == 0.0 for k in hits), (name, want)
        # head params never frozen
        assert all(v == 1.0 for k, v in frozen.items() if ".head." in k)


def test_freeze_stop_gradient_zeroes_grads_without_mask():
    """Freezing is a stop_gradient in the trunk, not just an update mask:
    grads of frozen-stage params must be EXACTLY zero at the model level
    (so XLA skips the frozen backward), for every backbone."""
    import jax.numpy as jnp

    from multipathnet_tpu.models.backbones import get_backbone

    for name in ("vgg16", "resnet18", "alexnet", "tinynet"):
        bb = get_backbone(name, jnp.float32, freeze_stages=2)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        variables = jax.jit(bb.init)(jax.random.key(0), x)

        def loss(v):
            feats = bb.apply(v, x)
            return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                       for f in feats.values())

        grads = jax.jit(jax.grad(loss))(variables)["params"]
        prefixes = type(bb).frozen_prefixes(2)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        saw_frozen = saw_live = False
        for path, g in flat:
            top = str(getattr(path[0], "key", ""))
            if top.startswith(prefixes):
                assert not np.any(np.asarray(g)), (name, top)
                saw_frozen = True
            elif np.any(np.asarray(g)):
                saw_live = True
        assert saw_frozen and saw_live, (name, saw_frozen, saw_live)


def test_freeze_unknown_backbone_errors():
    import flax.linen as nn
    import jax.numpy as jnp

    from multipathnet_tpu.train.loop import _freeze_mask

    class NoTable(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    with pytest.raises(ValueError, match="frozen_prefixes"):
        _freeze_mask({"params": {}}, 2, NoTable())


def test_resnet_train_step_runs(tmp_path):
    """ResNet BN stats are frozen (use_running_average always True), so the
    jitted train step needs no mutable batch_stats — round-1 latent bug."""
    import dataclasses

    cfg = preset("tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, backbone="resnet18"),
        train=dataclasses.replace(cfg.train, freeze_backbone_stages=2))
    fx = synthetic.generate(str(tmp_path), num_images=4, image_size=64,
                            num_classes=4, proposals_per_image=16, seed=7)
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)
    state = trainer.init_state()
    p0 = jax.tree.map(np.asarray, state.params)
    state, m = trainer.step(state, next(pipe.epoch(0)))
    assert np.isfinite(float(m["loss"]))
    # frozen stem/stage2 params unchanged; some unfrozen param changed
    pb0 = p0["params"]["backbone"]
    pb1 = jax.tree.map(np.asarray, state.params)["params"]["backbone"]
    np.testing.assert_array_equal(
        pb0["stem"]["kernel"], pb1["stem"]["kernel"])
    np.testing.assert_array_equal(
        pb0["stage2_block0"]["Conv_0"]["kernel"],
        pb1["stage2_block0"]["Conv_0"]["kernel"])
    changed = np.any(pb0["stage3_block0"]["Conv_0"]["kernel"]
                     != pb1["stage3_block0"]["Conv_0"]["kernel"])
    assert changed, "unfrozen stage3 did not update"


def test_bn_running_stats_never_train(tmp_path):
    """BN running mean/var live in the batch_stats collection and are NOT
    trainable (resnet.py docstring: frozen pretrained stats, affine-only
    fine-tuning — the reference's BN handling, SURVEY.md §2.1 "Model
    utils"). A train step with freeze_backbone_stages=0 and weight decay
    ON must leave them bit-identical: they are neither gradient-updated
    nor weight-decayed. (r3 bug: the unsplit value_and_grad over the full
    variables dict let SGD+decay silently walk the running stats.)"""
    import dataclasses

    cfg = preset("tiny")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, backbone="resnet18"),
        train=dataclasses.replace(cfg.train, freeze_backbone_stages=0))
    assert cfg.train.weight_decay > 0  # the decay path must be exercised
    fx = synthetic.generate(str(tmp_path), num_images=4, image_size=64,
                            num_classes=4, proposals_per_image=16, seed=7)
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)
    state = trainer.init_state()
    assert "batch_stats" in state.params
    s0 = jax.tree.map(np.asarray, state.params["batch_stats"])
    batch = next(pipe.epoch(0))
    state, m = trainer.step(state, batch)
    state, m = trainer.step(state, batch)
    assert np.isfinite(float(m["loss"]))
    s2 = jax.tree.map(np.asarray, state.params["batch_stats"])
    jax.tree.map(np.testing.assert_array_equal, s0, s2)
    # ...while trainable affine BN params DID move
    g0 = jax.tree.map(np.asarray, state.params)["params"]["backbone"]
    assert np.any(g0["stem_bn"]["scale"] != 1.0)


def test_integral_loss_agg():
    """Pin both aggregation modes of the MultiPath §3.3 integral loss:
    "sum" = paper-literal sum of the K per-head cross-entropies
    (ParallelCriterion semantics); "mean" (default) = sum / K. Total is
    cls + bbox_weight * bbox. Rationale for the default: losses.py docstring."""
    import jax.numpy as jnp

    from multipathnet_tpu.data.sampler import RoiSample
    from multipathnet_tpu.train.losses import detection_loss

    b, s, k, c = 2, 8, 6, 5
    key = jax.random.key(0)
    scores = jax.random.normal(key, (b, s, k, c))
    deltas = jax.random.normal(jax.random.key(1), (b, s, 4 * c))
    sample = RoiSample(
        rois=jnp.zeros((b, s, 4)),
        matched_class=jnp.ones((b, s), jnp.int32),
        max_iou=jnp.full((b, s), 0.8),
        is_fg=jnp.ones((b, s), bool),
        bbox_targets=jnp.zeros((b, s, 4)),
        valid=jnp.ones((b, s), bool),
    )
    total, m = detection_loss(
        scores, deltas, sample,
        integral_thresholds=(0.50, 0.55, 0.60, 0.65, 0.70, 0.75),
        num_classes=c, bbox_loss_weight=2.0, integral_agg="sum")
    per_head = sum(float(m[f"loss_cls_h{i}"]) for i in range(k))
    assert abs(float(m["loss_cls"]) - per_head) < 1e-5
    assert abs(float(total) - (per_head + 2.0 * float(m["loss_bbox"]))) < 1e-5

    total_m, mm = detection_loss(
        scores, deltas, sample,
        integral_thresholds=(0.50, 0.55, 0.60, 0.65, 0.70, 0.75),
        num_classes=c, bbox_loss_weight=2.0)  # default agg = "mean"
    assert abs(float(mm["loss_cls"]) - per_head / k) < 1e-5
    assert abs(float(total_m)
               - (per_head / k + 2.0 * float(mm["loss_bbox"]))) < 1e-5


def test_init_canvas_independent():
    """Trainer.init_state traces model.init on a small canvas (the full-size
    VGG init compile measured 100-250s through the axon tunnel). Param VALUES
    must not depend on the canvas: flax initializers see only shapes + RNG."""
    import jax.numpy as jnp

    from multipathnet_tpu.models.multipath import build_model

    cfg = preset("tiny").model
    model = build_model(cfg)
    rois = jnp.asarray([[[0, 0, 32, 32]]], jnp.float32)
    p64 = model.init(jax.random.key(0),
                     jnp.zeros((1, 64, 64, 3), jnp.float32), rois)
    p128 = model.init(jax.random.key(0),
                      jnp.zeros((1, 128, 128, 3), jnp.float32), rois)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p64, p128)

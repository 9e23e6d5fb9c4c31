"""Test env: force CPU backend with 8 virtual devices BEFORE jax import.

SURVEY.md §4: multi-device semantics are tested on a virtual CPU mesh
(xla_force_host_platform_device_count=8) since only one real TPU chip exists.
"""

import os

# NOTE: the axon PJRT plugin overrides the JAX_PLATFORMS env var on this image;
# the runtime config.update below is what actually pins tests to CPU (verified
# 2026-08-16: env var alone leaves default_backend=tpu and every op pays a
# tunnel round-trip).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA-CPU-compile-bound on this 1-core box; lowering the backend
# optimization level halves the wall clock (test_train 168s -> 84s,
# 2026-08-16). Level 1, not 0: level 0 materially changes CPU numerics —
# the 30-epoch proposal-net micro-training in test_sharpmask lands at
# recall 0.31 instead of 0.95 under level 0, while level 1 reproduces the
# default-level results on the whole suite. Production (TPU) never sees this.
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite is XLA-CPU-COMPILE-bound on this 1-core box (top durations are
# all first-jit costs). The persistent compilation cache turns repeat runs'
# compiles into deserializations — measured 13:33 (uncached) -> 8:59
# (warm, 2026-08-17); a fresh clone's first run still pays real compiles. Tests
# that intentionally measure compile behavior are unaffected in semantics
# (the cache keys on exact HLO + topology).
os.makedirs(os.path.expanduser("~/.cache/multipathnet_tpu/xla-cpu-tests"),
            exist_ok=True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/multipathnet_tpu/xla-cpu-tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def overfit_tiny(tmp_path_factory):
    """Synthetic 8-image set + tiny detector OVERFIT for 30 epochs — shared
    session-wide (the micro-training costs ~60 s on this 1-core box; e2e
    golden test and int8-AP-preservation both need the same trained state).
    Returns dict(cfg, loader, props, trainer, state, losses, before)."""
    import dataclasses

    from multipathnet_tpu.core.config import preset
    from multipathnet_tpu.core.mesh import make_mesh
    from multipathnet_tpu.data import synthetic
    from multipathnet_tpu.data.coco import CocoLoader
    from multipathnet_tpu.data.pipeline import DetectionPipeline
    from multipathnet_tpu.data.proposals import ProposalStore
    from multipathnet_tpu.eval.tester import Tester
    from multipathnet_tpu.train.loop import Trainer

    root = str(tmp_path_factory.mktemp("overfit_ds"))
    fx = synthetic.generate(root, num_images=8, image_size=64,
                            num_classes=4, proposals_per_image=24, seed=5)
    cfg = preset("tiny")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_classes=5))
    loader = CocoLoader(fx["annotations"], fx["images"])
    props = ProposalStore.load(fx["proposals"])
    trainer = Trainer(cfg, mesh=make_mesh(n_data=2))
    pipe = DetectionPipeline(loader, props, cfg.data, batch_size=2, seed=0)

    def build():
        state = trainer.init_state()
        before = Tester(trainer.model, state.params, cfg, loader, props,
                        batch_size=2).test()
        losses = []
        for ep in range(30):
            for batch in pipe.epoch(ep):
                state, m = trainer.step(state, batch)
                losses.append(float(m["loss"]))
        return dict(state=state, losses=losses, before=before)

    # Deterministic micro-training memoized on disk, keyed by the full
    # package source hash (tests/state_cache.py) — warm repeats skip the
    # ~60 s gradient loop; any source change retrains.
    from state_cache import cached_state

    trained = cached_state("overfit-tiny-8img-30ep-seed5", build)
    return dict(cfg=cfg, loader=loader, props=props, trainer=trainer,
                **trained)

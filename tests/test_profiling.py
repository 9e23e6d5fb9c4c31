"""Profiling/tracing utilities (SURVEY.md §5 tracing + sanitizer rows)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multipathnet_tpu.utils import profiling


def test_timed_returns_plausible_time():
    f = jax.jit(lambda x: (x * 2).sum())
    sec, out = profiling.timed(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert sec > 0
    assert float(out) == 64 * 64 * 2


def test_trace_writes_files(tmp_path):
    with profiling.trace(str(tmp_path)):
        jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
    n = sum(len(fs) for _, _, fs in os.walk(tmp_path))
    assert n > 0


def test_debug_nans_raises_and_restores():
    before = jax.config.jax_debug_nans
    with pytest.raises(FloatingPointError):
        with profiling.debug_nans():
            jax.block_until_ready(jax.jit(lambda a: a / 0.0)(jnp.zeros(4)))
    assert jax.config.jax_debug_nans == before


def test_integral_softmax_averaging_protocol():
    """Eval averages the K head softmaxes (MultiPath §3.3) — the probability
    mean, not the logit mean (they differ; this pins the protocol)."""
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((1, 4, 3, 5)), jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).mean(axis=2)  # detect.py formula
    want = np.mean(jax.nn.softmax(np.asarray(scores), axis=-1), axis=2)
    np.testing.assert_allclose(np.asarray(probs), want, atol=1e-6)
    logit_mean = jax.nn.softmax(scores.mean(axis=2), axis=-1)
    assert not np.allclose(np.asarray(probs), np.asarray(logit_mean),
                           atol=1e-3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_metrics_tensorboard_export(tmp_path):
    """Optional TB export writes event files readable by TF (SURVEY.md §5
    metrics row: 'optional TensorBoard via TF')."""
    import os

    tf = pytest.importorskip("tensorflow")

    from multipathnet_tpu.utils.metrics import MetricsLogger

    tb = str(tmp_path / "tb")
    m = MetricsLogger(str(tmp_path / "m.jsonl"), echo=False,
                      tensorboard_dir=tb)
    m.log(1, loss=2.5, lr=0.01)
    m.log(2, loss=2.0, lr=0.01)
    m.close()
    files = [f for f in os.listdir(tb) if "tfevents" in f]
    assert files, os.listdir(tb)
    # round-trip one scalar
    seen = {}
    for e in tf.compat.v1.train.summary_iterator(os.path.join(tb, files[0])):
        for v in e.summary.value:
            if v.tag == "loss":
                seen[e.step] = tf.make_ndarray(v.tensor).item()
    assert seen.get(1) == 2.5 and seen.get(2) == 2.0, seen

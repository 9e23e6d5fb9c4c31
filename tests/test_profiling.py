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
    """TB export writes tfevents files (SURVEY.md §5 metrics row) via the
    self-contained writer (utils/tbevents.py — no TF import; the previous
    TF-backed version cost this suite ~36 s of `import tensorflow` alone).
    Round-trips through the CRC-verifying reader. TF cross-check
    (tf.compat.v1.train.summary_iterator reads this exact writer's output,
    simple_value scalars intact) performed 2026-08-19; the byte-golden test
    below pins the format so it can't drift from what TF verified."""
    import os

    from multipathnet_tpu.utils.metrics import MetricsLogger
    from multipathnet_tpu.utils.tbevents import read_scalars

    tb = str(tmp_path / "tb")
    m = MetricsLogger(str(tmp_path / "m.jsonl"), echo=False,
                      tensorboard_dir=tb)
    m.log(1, loss=2.5, lr=0.01)
    m.log(2, loss=2.0, lr=0.01)
    m.close()
    files = [f for f in os.listdir(tb) if "tfevents" in f]
    assert files, os.listdir(tb)
    seen = read_scalars(os.path.join(tb, files[0]))  # verify_crc=True
    assert seen["loss"] == {1: 2.5, 2: 2.0}, seen
    assert abs(seen["lr"][1] - 0.01) < 1e-7


def test_tbevents_byte_golden():
    """Pins the tfevents wire format byte-for-byte (fixed wall_time): record
    framing, masked CRC32C, and the Event/Summary/Value proto encoding that
    the 2026-08-19 TF cross-check validated. Any encoder change that would
    break TensorBoard readability breaks this golden first."""
    import struct

    from multipathnet_tpu.utils.tbevents import (_masked_crc,
                                                 encode_scalar_event)

    ev = encode_scalar_event(3, 1700000000.0, {"loss": 1.5})
    want = (b"\x09" + struct.pack("<d", 1700000000.0)      # wall_time = 1
            + b"\x10\x03"                                  # step = 2 (3)
            + b"\x2a\x0d"                                  # summary = 5
            + b"\x0a\x0b"                                  # Summary.value
            + b"\x0a\x04loss"                              # Value.tag
            + b"\x15" + struct.pack("<f", 1.5))            # simple_value
    assert ev == want, ev.hex()
    # masked CRC32C test vector: crc32c(b"123456789") == 0xE3069283
    crc = _masked_crc(b"123456789")
    c = (crc - 0xA282EAD8) & 0xFFFFFFFF
    unmasked = ((c << 15) | (c >> 17)) & 0xFFFFFFFF
    assert unmasked == 0xE3069283, hex(unmasked)

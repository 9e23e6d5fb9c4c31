"""Tracing/profiling harness (SURVEY.md §5 "Tracing / profiling").

The reference had progress bars and wall-clock prints; here:
  - `timed(fn)`: steady-state timing that forces device completion via a
    scalar reduction (host transfers through the axon tunnel are ~20 MB/s —
    materializing outputs measures the tunnel, not the chip; docs/PERF.md).
  - `trace(path)`: jax.profiler context writing a TensorBoard-loadable trace.
  - `debug_nans()`: context enabling jax_debug_nans — the functional answer
    to the reference family's sanitizers (SURVEY.md §5 race-detection row).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def _force(out) -> float:
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    acc = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
    return float(acc)


def timed(fn, *args, iters: int = 10, warmup: int = 2):
    """Returns (seconds_per_call, result). fn must be jit-compiled.

    Blocks ONCE after `iters` back-to-back dispatches: the host<->device
    round-trip through the axon tunnel is ~25ms, so per-iteration syncing
    would swamp anything faster than that (observed 2026-08-16)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/tb'): step(...)`.
    Open with TensorBoard (installed via TF) or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)

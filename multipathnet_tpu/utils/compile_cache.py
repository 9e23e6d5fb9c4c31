"""Persistent XLA compilation cache (VERDICT r2 item 3: BENCH_r02's first
call was 754 s — the W2/resident/placement graphs trade steady-state speed
for a huge one-time compile, and without a persistent cache every process
re-paid it).

JAX's persistent cache keys on (HLO, compile options, backend version), so
warm processes deserialize the executable instead of re-invoking the (remote,
relay-staged) compiler. Enabled by every entry point that compiles real
graphs (bench.py, cli/train.py, cli/eval.py, cli/demo.py,
cli/export_proposals.py). The CPU test suite keeps its own SEPARATE cache
(tests/conftest.py, ~/.cache/multipathnet_tpu/xla-cpu-tests; 13:33 →
8:59 warm) so test executables never mix with the TPU entry-point cache.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/multipathnet_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the directory,
    or None if disabled via MPNET_COMPILE_CACHE=off.

    Directory override: MPNET_COMPILE_CACHE env var or `cache_dir` arg.
    """
    env = os.environ.get("MPNET_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    path = cache_dir or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time; the default 1 s
    # floor would still cover the offenders, but small graphs (resize,
    # preprocessing) add relay round-trips too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # knob renamed/absent on some versions
        pass
    return path

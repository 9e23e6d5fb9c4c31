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

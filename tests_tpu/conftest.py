"""Hardware test tier — runs the COMPILED (Mosaic) kernel paths on the real
TPU chip (VERDICT r2 item 2 / SURVEY.md §4 "test both paths in CI": the main
suite runs Pallas in interpret mode on CPU; a toolchain bump or BlockSpec
regression there would only surface in the driver's bench).

    python -m pytest tests_tpu/ -x -q        # requires the axon TPU

The whole directory SKIPS (not fails) when no TPU backend is available, so
`pytest tests/ tests_tpu/` is safe anywhere. Do NOT run concurrently with
the CPU suite: the 1-core host starves tunnel dispatch (docs/PERF.md).
The persistent compilation cache is enabled — a warm re-run takes ~2 min;
cold (new HLO) first runs pay real compiles.
"""

import numpy as np
import pytest

from multipathnet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="no TPU backend (axon plugin absent)")
    for item in items:
        skip_marker_added = item.add_marker(skip)  # noqa: F841


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20)

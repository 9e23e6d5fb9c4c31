"""Persistent cache for deterministic micro-trained test states.

The suite's dominant cost after the XLA compile cache is micro-training:
the session overfit fixture (30 epochs), the proposal-net overfit
(30 epochs), and the closed-loop test's two detector trainings (25 + 100
epochs) together burn ~3-4 minutes of the 1-core box per run, recomputing
bit-identical results (fixed seeds, deterministic XLA-CPU execution).

This memoizes those states on disk the same way jax's persistent
compilation cache memoizes executables, with the same integrity contract:
the key includes a hash of EVERY ``multipathnet_tpu/**/*.py`` source file
plus the jax version, so any change to the package (or a jax upgrade)
invalidates every entry and the training re-runs live. The asserts that
consume the state (loss decline, proposal quality, AP bars) always run
live against current eval/metric code — only the gradient-descent loop
that produces the state is memoized.

Opt out (force live retraining, e.g. for a clean verification run):

    MPN_TEST_STATE_CACHE=0 python -m pytest tests/ -q

A fresh clone's first run pays the full training cost either way.
"""

import glob
import hashlib
import os
import pickle

import jax
import numpy as np

_PKG = os.path.join(os.path.dirname(__file__), os.pardir, "multipathnet_tpu")
_DIR = os.path.expanduser("~/.cache/multipathnet_tpu/test-states")
_hash_memo = None


def _package_hash() -> str:
    global _hash_memo
    if _hash_memo is None:
        h = hashlib.sha256(jax.__version__.encode())
        for p in sorted(glob.glob(os.path.join(_PKG, "**", "*.py"),
                                  recursive=True)):
            h.update(os.path.relpath(p, _PKG).encode())
            with open(p, "rb") as f:
                h.update(f.read())
        _hash_memo = h.hexdigest()[:20]
    return _hash_memo


class _KeyLeaf:
    """Pickle stand-in for a typed PRNG-key array (np.asarray rejects the
    key dtype). Default threefry impl — the only one the package uses."""

    def __init__(self, data):
        self.data = data


def _to_numpy(tree):
    def conv(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            return _KeyLeaf(np.asarray(jax.random.key_data(x)))
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _rehydrate(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.random.wrap_key_data(jnp_asarray(x.data))
        if isinstance(x, _KeyLeaf) else x, tree)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def cached_state(token: str, builder):
    """Memoize ``builder()`` (a pytree of arrays / plain python) on disk.

    ``token`` names the fixture op point (config, epochs, seeds); the full
    package source hash is appended so the cache can never serve a state
    produced by different training code. Leaves come back as numpy arrays —
    jax consumes those transparently.
    """
    if os.environ.get("MPN_TEST_STATE_CACHE", "1") == "0":
        return builder()
    key = f"{token}-{_package_hash()}"
    path = os.path.join(_DIR, key + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return _rehydrate(pickle.load(f))
    out = _to_numpy(builder())
    os.makedirs(_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return _rehydrate(out)

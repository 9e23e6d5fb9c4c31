"""jit helpers for tests.

Unjitted flax ``init``/``apply`` on this 1-core CPU box dispatches
op-by-op (hundreds of per-primitive executions + cache lookups) and was
the hidden cost behind most of the suite's 10-30 s tests — e.g. the
4-backbone stop-gradient test fell 26 s -> 6.7 s just from wrapping its
``init``/``grad`` in jit (2026-08-19). Jitted graphs also hit the
persistent compilation cache across runs, and are MORE representative:
production only ever runs these models under jit.
"""

import functools

import jax


def japply(model, *args, method=None, **kw):
    """``model.apply(*args, method=..., **kw)`` under jit.

    A fresh jit wrapper per call (re-traces on repeat calls with the same
    graph) — fine for tests that call each graph a handful of times; the
    backend compile is cached in-process and persistently.
    """
    if method is None:
        return jax.jit(model.apply)(*args, **kw)
    return jax.jit(functools.partial(model.apply, method=method))(*args, **kw)


def jinit(model, *args, **kw):
    return jax.jit(model.init)(*args, **kw)

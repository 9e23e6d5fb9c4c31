"""Probe: window-DMA throughput bf16 vs int8 on the real chip.

Replicates the production window kernel's access pattern (strided
(10,16,C) window DMAs from a pyramid-shaped HBM buffer, double buffered,
one GEMM per view) and times it for flat dtype bf16 vs int8 (int8 windows
are converted to bf16 in VMEM before the GEMM).

RESULT (2026-08-18, v5e, docs/PERF.md "int8 window DMA probe"): int8 is
only 1.35x faster (bf16 12.93 ms / 405 GB/s, int8 9.57 ms), i.e. the
strided window DMA is descriptor/latency-bound, not byte-bound — the
int8-pyramid pool variant was parked on this measurement.

Timing gotcha this probe tripped over (kept as a worked example):
`block_until_ready()` is NOT an honest fence through the axon relay —
it "timed" this 13 ms kernel at 0.03 ms. Only a scalar pull to host
(float(jnp.sum(out)), as utils/profiling.timed does) fences the chip.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW, WINDOW_X = 10, 16


def _kernel(row0_ref, x0_ref, flat_ref, out_ref, win, sems, *, tile, cdt):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    c = flat_ref.shape[-1]
    k = WINDOW * WINDOW_X

    def dma(step, slot, t):
        v = step * tile + t
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(row0_ref[v], WINDOW),
                        pl.ds(pl.multiple_of(x0_ref[v], 8), WINDOW_X), :],
            win.at[slot, t],
            sems.at[slot, t],
        )

    def start_all(step, slot):
        for t in range(tile):
            dma(step, slot, t).start()

    @pl.when(i == 0)
    def _():
        start_all(0, 0)

    @pl.when(i + 1 < n_steps)
    def _():
        start_all(i + 1, (i + 1) % 2)

    slot = i % 2
    w2 = jnp.ones((49, k), cdt)
    for t in range(tile):
        dma(i, slot, t).wait()
        w = win[slot, t].reshape(k, c).astype(cdt)
        out_ref[t] = jax.lax.dot_general(
            w2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def run(flat, row0, x0, tile=8):
    n = row0.shape[0]
    c = flat.shape[-1]
    cdt = jnp.bfloat16
    grid = n // tile
    return pl.pallas_call(
        partial(_kernel, tile=tile, cdt=cdt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tile, 49, c), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, tile, WINDOW, WINDOW_X, c), flat.dtype),
                pltpu.SemaphoreType.DMA((2, tile)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n, 49, c), jnp.bfloat16),
    )(row0.astype(jnp.int32), x0.astype(jnp.int32), flat)


def bench(dtype, n_views=32000, rows=4096, wmax=160, c=512, iters=20):
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (rows, wmax, c), jnp.float32)
    if dtype == jnp.int8:
        flat = jnp.clip(flat * 40, -127, 127).astype(jnp.int8)
    else:
        flat = flat.astype(dtype)
    row0 = jax.random.randint(key, (n_views,), 0, rows - WINDOW)
    x0 = (jax.random.randint(key, (n_views,), 0, (wmax - WINDOW_X) // 8) * 8)
    def chained(flat, row0, x0, reps):
        # chain reps executions with a data dependency so nothing dedupes:
        # each rep perturbs one element of row0 with a value derived from
        # the previous output's first element (always 0 shift in practice).
        def body(carry, _):
            r0 = carry
            out = run(flat, r0, x0)
            shift = (out[0, 0, 0].astype(jnp.int32) * 0)
            return r0 + shift, out[0, 0, 0]
        r0, outs = jax.lax.scan(body, row0, None, length=reps)
        return outs

    reps = 10
    f = jax.jit(partial(chained, reps=reps))
    float(jnp.sum(f(flat, row0, x0)))  # warm + honest fence (scalar to host)
    dts = []
    for _ in range(iters // 2):
        t0 = time.perf_counter()
        float(jnp.sum(f(flat, row0, x0)))
        dts.append((time.perf_counter() - t0) / reps)
    dt = float(np.median(dts))
    bytes_moved = n_views * WINDOW * WINDOW_X * c * flat.dtype.itemsize
    print(f"{np.dtype(dtype).name:8s}: {dt*1e3:7.2f} ms  "
          f"{bytes_moved/dt/1e9:7.1f} GB/s  "
          f"({n_views/dt/1e6:.1f} Mviews/s)")
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    t_bf16 = bench(jnp.bfloat16)
    t_int8 = bench(jnp.int8)
    print(f"speedup int8/bf16: {t_bf16/t_int8:.2f}x")

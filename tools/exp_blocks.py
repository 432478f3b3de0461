"""TPU probes for the record-layout redesign:
1. gather rate vs row width/dtype (is jnp.take row-count- or byte-bound?)
2. Mosaic correctness of (CHUNK, 8) f32 and (CHUNK, 16) bf16 record blocks
   (round 1 found (CHUNK, 12) f32 blocks silently corrupt — verify 8/bf16).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def timeit(name, fn, *args):
    import jax
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    print(f"{name:50s} {best:8.2f} ms/iter", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    N = 1_000_000
    nidx = 4_200_000

    idx = jnp.asarray(rng.randint(0, N, nidx).astype(np.int32))

    def bench_take(name, table):
        def body(c):
            out = jnp.take(table, (idx + c) % N, axis=0)
            return out[0, :1].astype(jnp.int32)

        timeit(f"take {nidx/1e6:.1f}M rows {name}",
               lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c),
               jnp.zeros(1, jnp.int32))

    bench_take("(1M,16) f32", jnp.asarray(rng.rand(N, 16), jnp.float32))
    bench_take("(1M,8)  f32", jnp.asarray(rng.rand(N, 8), jnp.float32))
    bench_take("(1M,16) bf16", jnp.asarray(rng.rand(N, 16), jnp.bfloat16))
    bench_take("(1M,4)  f32", jnp.asarray(rng.rand(N, 4), jnp.float32))

    # ---- Mosaic narrow-block correctness --------------------------------
    CHUNK = 128

    def probe_block(cols, dtype, tag):
        cap = 16 * CHUNK
        recs = jnp.asarray(rng.rand(cap, cols) * 2 - 1, dtype)

        def kernel(rec_ref, out_ref):
            r = rec_ref[...].astype(jnp.float32)        # (CHUNK, cols)
            # mix columns so any lane/sublane misload shows up; per-row
            # values spread over lanes so misorders are visible too
            v = (r[:, 0:1] * 1.0 + r[:, 1:2] * 10.0
                 + r[:, cols - 1:cols] * 100.0)         # (CHUNK, 1)
            # row-position weights catch within-block row shuffles too
            wrow = 1.0 + 0.01 * jax.lax.broadcasted_iota(
                jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)
            out_ref[0] = jnp.sum(v * wrow) + jnp.zeros((1, CHUNK),
                                                       jnp.float32)

        out = pl.pallas_call(
            kernel,
            grid=(cap // CHUNK,),
            in_specs=[pl.BlockSpec((CHUNK, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cap // CHUNK, 1, CHUNK),
                                           jnp.float32),
        )(recs)
        r = np.asarray(recs, np.float32).reshape(cap // CHUNK, CHUNK, cols)
        wrow = 1.0 + 0.01 * np.arange(CHUNK)
        want = ((r[:, :, 0] * 1.0 + r[:, :, 1] * 10.0
                 + r[:, :, cols - 1] * 100.0) * wrow).sum(1)  # (G,)
        got = np.asarray(out[:, 0, 0])
        ok = np.allclose(got, want, rtol=2e-3, atol=1e-2)
        print(f"mosaic block ({CHUNK},{cols}) {tag}: "
              f"{'OK' if ok else 'WRONG'} maxerr="
              f"{np.abs(got - want).max():.2e}", flush=True)

    for cols, dt, tag in [(16, jnp.float32, "f32"),
                          (8, jnp.float32, "f32"),
                          (12, jnp.float32, "f32 (known bad r1)"),
                          (16, jnp.bfloat16, "bf16")]:
        try:
            probe_block(cols, dt, tag)
        except Exception as e:
            print(f"mosaic block ({CHUNK},{cols}) {tag}: RAISED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

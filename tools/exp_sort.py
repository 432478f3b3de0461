"""Sort-strategy microbenches for the binning stage (real TPU).

Current: lax.sort((int32 key, int32 splat), stable). Candidates:
- single-operand int64 key<<20|splat (keys unique -> stability free)
- unstable 2-operand
- smaller m (what if emission were class-split)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    M = 6_000_000
    keys31 = rng.randint(0, 1 << 31, M, dtype=np.int64)
    splat = np.arange(M, dtype=np.int64) % (1 << 20)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:45s} {best:7.2f} ms/iter", flush=True)

    k32 = jnp.asarray(keys31.astype(np.int32))
    s32 = jnp.asarray(splat.astype(np.int32))

    def two_op(stable):
        def body(c):
            k, s = lax.sort((k32 ^ c[0], s32), num_keys=1,
                            is_stable=stable)
            return (k[:1],)
        return lambda c: lax.fori_loop(0, ITERS,
                                       lambda i, cc: body(cc), c)

    timeit("2-op (i32,i32) stable", two_op(True), (jnp.zeros(1, jnp.int32),))
    timeit("2-op (i32,i32) unstable", two_op(False),
           (jnp.zeros(1, jnp.int32),))

    k64 = jnp.asarray(((keys31 << 20) | splat))

    def one_op64(c):
        def body(cc):
            k = lax.sort((k64 ^ cc[0],), num_keys=1, is_stable=False)[0]
            return (k[:1],)
        return lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c)

    timeit("1-op i64 (key<<20|splat)", one_op64, (jnp.zeros(1, jnp.int64),))

    # smaller m for reference
    for m2 in (4_500_000, 3_000_000):
        k2 = k32[:m2]
        s2 = s32[:m2]

        def two_small(c):
            def body(cc):
                k, s = lax.sort((k2 ^ cc[0], s2), num_keys=1,
                                is_stable=True)
                return (k[:1],)
            return lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c)

        timeit(f"2-op (i32,i32) stable m={m2 // 1000}k", two_small,
               (jnp.zeros(1, jnp.int32),))


if __name__ == "__main__":
    main()

"""Round-3 TPU probes (VERDICT tasks 2+3): the gather/sort/scatter design
space for the pack stage, the LOD tail proxy, and the radix-sort candidate.

1. jnp.take row rate vs row WIDTH (1..12 f32 cols) at pack scale — decides
   whether narrow/packed records can cut the exact-mode pack wall.
2. Pallas per-row DMA-batched gather at small scale — measures the per-DMA
   issue floor to settle the "multi-row DMA gather kernel" candidate
   (BENCHLOG known-bottleneck 1) with numbers.
3. lax.sort payload scaling — cost of riding ONE extra int32 aux payload
   through the binning sort (the tail-proxy design needs per-pair aux
   without a post-sort gather).
4. XLA scatter-add rates (tiny-bin histogram + full permutation) — the
   counting/radix-sort candidate (round-1 task 2) needs one of these to
   beat lax.sort.
5. cumsum rates at pair scale (segmented tail sums via prefix + boundary
   takes).
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
    try:
        jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"{name:52s} RAISED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    print(f"{name:52s} {best:8.2f} ms/iter", flush=True)
    return best


def loop(body):
    import jax.numpy as jnp
    from jax import lax
    return (lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c),
            jnp.zeros(1, jnp.int32))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # comma-separated section filter, e.g. RAYEATER_EXP=sort,dma
    only = os.environ.get("RAYEATER_EXP", "take,dma,sort,scatter,cumsum"
                          ).split(",")

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    N = 1_000_000
    M = 4_200_000                         # pack scale (pairs)

    idx = jnp.asarray(rng.randint(0, N, M).astype(np.int32))

    # -- 1. take row-rate vs width ---------------------------------------
    for w in (12, 8, 6, 4, 2, 1) if "take" in only else ():
        tab = jnp.asarray(rng.rand(N, w), jnp.float32)

        def body(c, tab=tab):
            out = jnp.take(tab, (idx + c) % N, axis=0)
            return out[0, :1].astype(jnp.int32)
        fn, c0 = loop(body)
        timeit(f"take {M/1e6:.1f}M rows ({w} f32 cols)", fn, c0)

    # 1b. flat 1-D element gather (w=1 squeezed)
    tab1 = jnp.asarray(rng.rand(N), jnp.float32)
    if "take" not in only:
        tab1 = None

    if tab1 is not None:
        def body(c):
            return jnp.take(tab1, (idx + c) % N)[:1].astype(jnp.int32)
        fn, c0 = loop(body)
        timeit(f"take {M/1e6:.1f}M elems (flat 1-D)", fn, c0)

    # -- 2. Pallas per-row DMA gather (small scale -> issue cost) --------
    W = 8
    GM = 32 * 1024                       # 128k rows: SMEM-sized idx
    idx2d = jnp.asarray(rng.randint(0, N, GM).astype(np.int32)
                        ).reshape(-1, 128)
    tabw = jnp.asarray(rng.rand(N, W), jnp.float32)

    def dma_kernel(idx_ref, tab_ref, out_ref, sems):
        for r in range(128):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[0, r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r]).start()
        for r in range(128):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[0, r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r]).wait()

    def dma_gather(i2d, tab):
        g = i2d.shape[0]
        return pl.pallas_call(
            dma_kernel,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, 128), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((128, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g * 128, W), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((128,))],
        )(i2d, tab)

    def body(c):
        out = dma_gather((idx2d + c[0]) % N, tabw)
        return out[0, :1].astype(jnp.int32)
    t = None
    if "dma" in only:
        fn, c0 = loop(body)
        t = timeit(f"pallas row-DMA gather {GM/1e3:.0f}k rows ({W} cols)",
                   fn, c0)
    if t is not None:
        print(f"    -> {t * 1e6 / GM:.1f} ns/row "
              f"({GM / t * 1e-3 / 1e6:.0f}M rows/s)", flush=True)

    def bodyx(c):
        out = jnp.take(tabw, (idx2d.reshape(-1) + c[0]) % N, axis=0)
        return out[0, :1].astype(jnp.int32)
    if "dma" in only:
        fn, c0 = loop(bodyx)
        timeit(f"XLA take same {GM/1e3:.0f}k rows ({W} cols)", fn, c0)

    # -- 2b. records-as-sort-payload candidate ----------------------------
    # the pack gather disappears if the sort carries the record columns;
    # measure a REALISTIC payload-sort: key + 10 f32 columns built by
    # jnp.tile from (N,) splat columns (the emission shape), at pair scale
    K = 4
    keysM = jnp.asarray(rng.randint(0, 1 << 31, N * K, dtype=np.int64)
                        .astype(np.int32))
    colsN = [jnp.asarray(rng.rand(N), jnp.float32) for _ in range(10)]

    for npay in (6, 10) if "sort" in only else ():
        def body(c, npay=npay):
            ops = (keysM ^ c[0],) + tuple(
                jnp.tile(col + c[0].astype(jnp.float32), K)
                for col in colsN[:npay])
            out = lax.sort(ops, num_keys=1, is_stable=False)
            return out[0][:1]
        fn, c0 = loop(body)
        timeit(f"payload-sort {N*K/1e6:.1f}M key + {npay} tiled f32",
               fn, c0)

    # -- 3. sort payload scaling -----------------------------------------
    keys = jnp.asarray(rng.randint(0, 1 << 31, M, dtype=np.int64)
                       .astype(np.int32))
    p1 = jnp.asarray(rng.randint(0, N, M).astype(np.int32))
    p2 = jnp.asarray(rng.randint(0, 1 << 31, M, dtype=np.int64)
                     .astype(np.int32))
    p3 = p2 ^ p1
    for nops, ops in (((1, (keys,)), (2, (keys, p1)),
                       (3, (keys, p1, p2)), (4, (keys, p1, p2, p3)))
                      if "sort" in only else ()):
        def body(c, ops=ops):
            out = lax.sort((ops[0] ^ c[0],) + ops[1:], num_keys=1,
                           is_stable=False)
            return out[0][:1]
        fn, c0 = loop(body)
        timeit(f"unstable sort {M/1e6:.1f}M x{nops} ops", fn, c0)

    # -- 4. scatter rates (radix/counting-sort candidate) ----------------
    bins = jnp.asarray(rng.randint(0, 512, M).astype(np.int32))
    vals = jnp.asarray(rng.rand(M), jnp.float32)

    if "scatter" in only:
        def body(c):
            h = jnp.zeros((512,), jnp.float32).at[bins ^ c[0]].add(vals)
            return h[:1].astype(jnp.int32)
        fn, c0 = loop(body)
        timeit(f"scatter-add {M/1e6:.1f}M -> 512 bins", fn, c0)

    perm = jnp.asarray(rng.permutation(M).astype(np.int32))

    if "scatter" in only:
        def body(c):
            out = jnp.zeros((M,), jnp.float32).at[perm ^ c[0]].set(vals)
            return out[:1].astype(jnp.int32)
        fn, c0 = loop(body)
        timeit(f"scatter-set {M/1e6:.1f}M -> {M/1e6:.1f}M (permute)", fn, c0)

    # -- 5. cumsum rates --------------------------------------------------
    x1 = vals
    x4 = jnp.asarray(rng.rand(4, M), jnp.float32)

    if "cumsum" in only:
        def body(c):
            return (jnp.cumsum(x1 + c[0].astype(jnp.float32))[:1]
                    .astype(jnp.int32))
        fn, c0 = loop(body)
        timeit(f"cumsum {M/1e6:.1f}M f32 (1 ch)", fn, c0)

    if "cumsum" in only:
        def body(c):
            return (jnp.cumsum(x4 + c[0].astype(jnp.float32), axis=1)[0, :1]
                    .astype(jnp.int32))
        fn, c0 = loop(body)
        timeit(f"cumsum {M/1e6:.1f}M f32 x4 ch (axis=1)", fn, c0)


if __name__ == "__main__":
    main()

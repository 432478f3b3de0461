"""Round-3 probe (VERDICT task 2): can the 4M-slot emission sort beat
the flat unstable ``lax.sort``?

The binning sort at the flagship config (1M splats, tw=32, K=4 fan) is
one unstable int32 sort of ~4.2M ``tile<<db | qdepth`` keys + payload.
BENCHLOG known-bottleneck 2 names a Pallas radix over the <=12-bit tile
ids as the unexplored candidate — but Mosaic on this toolchain cannot
gather/scatter in-kernel, so a classic radix permute must happen in XLA.
What IS testable:

1. baselines: flat unstable sort, 1 int32 payload (LOD path) and
   10 f32 payload columns (exact payload-sort path) at 4.2M.
2. segment scaling law: batched axis sorts (g, m/g) with payload — the
   ceiling for ANY partition-then-sort scheme.
3. partition building blocks: distinct-index scatter at 4.2M (applying
   a known permutation), searchsorted 1M-into-1M (the k-way merge rank),
   and the 34-segment rank-in-segment cumsum (tile-row partition).
4. stream-sorted merge: sort the K=4 emission streams as ONE batched
   (4, 1.05M) sort, compute global positions by cross-stream
   searchsorted rank sums, apply via scatter — end-to-end vs probe 1.
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

    NTILES = 2040                      # 1080p at (32,32) tiles
    DB = 19                            # 31 - 12 tile bits
    K = 4
    NS = 1_048_576                     # splats (pow2 for easy reshapes)
    M = K * NS                         # 4.19M slots

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:
            print(f"{name:56s} RAISED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return None
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:56s} {best:8.2f} ms/iter", flush=True)
        return best

    def loop(body):
        return (lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc),
                                        c), jnp.zeros(1, jnp.int32))

    # realistic key distribution: ~55% live pairs over all tiles, rest
    # sentinel (NTILES << DB) — matches the fan's miss rate
    live = rng.rand(M) < 0.55
    tiles = rng.randint(0, NTILES, M)
    qd = rng.randint(0, 1 << DB, M)
    keys_np = np.where(live, (tiles << DB) | qd, NTILES << DB).astype(
        np.int32)
    keys = jnp.asarray(keys_np)
    ids = jnp.arange(M, dtype=jnp.int32)

    # ---- 1. flat baselines ---------------------------------------------
    def body_flat(c):
        out = lax.sort((keys ^ (c[0] & 1), ids), num_keys=1,
                       is_stable=False)
        return out[1][:1]
    fn, c0 = loop(body_flat)
    t_flat = timeit(f"flat sort {M/1e6:.1f}M int32 + id payload", fn, c0)

    pay10 = [jnp.asarray(rng.rand(M), jnp.float32) for _ in range(10)]

    def body_flat10(c):
        out = lax.sort((keys ^ (c[0] & 1),) + tuple(pay10), num_keys=1,
                       is_stable=False)
        return out[1][:1].astype(jnp.int32)
    fn, c0 = loop(body_flat10)
    timeit(f"flat sort {M/1e6:.1f}M int32 + 10 f32 payload", fn, c0)

    def body_flatk(c):
        out = lax.sort((keys ^ (c[0] & 1),), num_keys=1, is_stable=False)
        return out[0][:1]
    fn, c0 = loop(body_flatk)
    timeit(f"flat sort {M/1e6:.1f}M int32 key-only", fn, c0)

    # ---- 2. segment scaling law ------------------------------------------
    for g in (4, 16, 64, 256):
        b = M // g
        kg = jnp.asarray(keys_np.reshape(g, b))
        pg = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32), (g, b))

        def body_seg(c, kg=kg, pg=pg):
            k, p = lax.sort((kg ^ (c[0] & 1), pg), num_keys=1,
                            is_stable=False, dimension=1)
            return k[:1, 0]
        fn, c0 = loop(body_seg)
        timeit(f"batched sort ({g} x {b//1024}k) + id payload", fn, c0)

    # 10-payload batched at the merge shape
    p10g = [jnp.asarray(rng.rand(K, NS), jnp.float32) for _ in range(10)]
    kg4 = jnp.asarray(keys_np.reshape(K, NS))

    def body_seg10(c):
        out = lax.sort((kg4 ^ (c[0] & 1),) + tuple(p10g), num_keys=1,
                       is_stable=False, dimension=1)
        return out[1][:1, 0].astype(jnp.int32)
    fn, c0 = loop(body_seg10)
    timeit(f"batched sort ({K} x {NS//1024}k) + 10 f32 payload", fn, c0)

    # ---- 3. partition building blocks ------------------------------------
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    vals = jnp.arange(M, dtype=jnp.int32)

    def body_scat(c):
        out = jnp.zeros(M, jnp.int32).at[(perm + c[0]) % M].set(
            vals, unique_indices=False)
        return out[:1]
    fn, c0 = loop(body_scat)
    t_scat = timeit(f"scatter {M/1e6:.1f}M int32 to permutation", fn, c0)

    # scatter of 10 f32 columns through the same permutation (exact mode)
    val10 = jnp.asarray(rng.rand(M, 10), jnp.float32)

    def body_scat10(c):
        out = jnp.zeros((M, 10), jnp.float32).at[(perm + c[0]) % M].set(
            val10)
        return out[:1, 0].astype(jnp.int32)
    fn, c0 = loop(body_scat10)
    timeit(f"scatter {M/1e6:.1f}M x 10 f32 rows to permutation", fn, c0)

    sorted_a = jnp.asarray(np.sort(keys_np[:NS]))
    q = jnp.asarray(keys_np[NS:2 * NS])

    def body_ss(c):
        r = jnp.searchsorted(sorted_a, q + (c[0] & 1))
        return r[:1].astype(jnp.int32)
    fn, c0 = loop(body_ss)
    t_ss = timeit(f"searchsorted {NS//1024}k into {NS//1024}k", fn, c0)

    # rank-in-segment over 34 tile-row segments (partition positions)
    seg = jnp.asarray((tiles * 34 // NTILES).astype(np.int32))

    def body_rank(c):
        oh = (seg[:, None] == jnp.arange(34, dtype=jnp.int32) + (c[0] & 1)
              ).astype(jnp.int32)                      # (M, 34)
        ranks = jnp.cumsum(oh, axis=0)                 # running counts
        own = jnp.take_along_axis(ranks, seg[:, None], axis=1)
        return own[:1, 0]
    fn, c0 = loop(body_rank)
    timeit("rank-in-segment cumsum (34 segs, one-hot)", fn, c0)

    # ---- 4. stream-sorted merge, end to end -------------------------------
    def merge_sort(keys2d, c):
        k = keys2d ^ (c[0] & 1)
        ks, ps = lax.sort(
            (k, jnp.broadcast_to(jnp.arange(NS, dtype=jnp.int32),
                                 (K, NS))),
            num_keys=1, is_stable=False, dimension=1)
        # global rank of element (t, i) = i + sum_{s != t} searchsorted(
        # ks[s], ks[t][i]) — side chosen by stream order so equal keys
        # across streams get distinct ranks (a stable k-way merge)
        pos_rows = []
        for t in range(K):
            r = jnp.arange(NS, dtype=jnp.int32)
            for s in range(K):
                if s == t:
                    continue
                side = "right" if s < t else "left"
                r = r + jnp.searchsorted(ks[s], ks[t], side=side).astype(
                    jnp.int32)
            pos_rows.append(r)
        pos = jnp.stack(pos_rows)                       # (K, NS)
        out_k = jnp.zeros(M, jnp.int32).at[pos.reshape(-1)].set(
            ks.reshape(-1))
        out_p = jnp.zeros(M, jnp.int32).at[pos.reshape(-1)].set(
            (ps + (jnp.arange(K, dtype=jnp.int32) * NS)[:, None])
            .reshape(-1))
        return out_k, out_p

    def body_merge(c):
        out_k, out_p = merge_sort(kg4, c)
        return out_k[:1]
    fn, c0 = loop(body_merge)
    t_m = timeit("stream-sorted 4-way merge END-TO-END", fn, c0)
    if t_m is not None and t_flat is not None:
        ok = np.array_equal(
            np.asarray(jax.jit(lambda c: merge_sort(kg4, c)[0])(
                jnp.zeros(1, jnp.int32))),
            np.sort(keys_np))
        print(f"    merge == flat sort: {ok}   "
              f"(flat {t_flat:.2f} ms vs merge {t_m:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()

"""Channel-compaction probe: what does routing a budgeted subset of
splats into a side channel (gs._bin_splats big/mid/corner channels)
actually cost on TPU?

The current compaction is cumsum + searchsorted(csum, slot+1) per
channel — but exp_radix measured XLA searchsorted at ~162 ms for 1M
queries in 1M rows, so a 200k-slot mid channel (bench inria defaults,
mid_cap = n//5) could be ~30 ms of pure routing: the suspected cause of
the round-4 inria mid-fan regression (23.7 -> 13.9 FPS at equal pool).

Candidate replacement: ONE unstable key-only sort of
where(mask, iota, INT_MAX) — the first nbig entries ARE the compacted
ids (order irrelevant: the fan keys re-sort by tile|depth anyway).

Timing fetches results (relay-blind hazard, BENCHLOG 2026-08-18).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re

    ctx = re.Context()
    print(f"device: {ctx.device}", flush=True)
    N = int(os.environ.get("N", 1_000_000))
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(N) < 0.19)          # ~190k mid splats
    side = jnp.asarray(rng.rand(N, 4).astype(np.float32))

    def timeit(name, fn):
        def run(s):
            def it(i, carry):
                return fn(carry + jnp.float32(i) * 1e-9)
            return lax.fori_loop(0, ITERS, it, s)
        f = jax.jit(run)
        float(np.asarray(f(np.float32(0.0))))
        best = 1e9
        for w in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(np.float32(1.0 + w))))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:52s} {best:8.3f} ms", flush=True)
        return best

    for cap in (200_000, 62_500):
        def f_ss(s, cap=cap):
            csum = jnp.cumsum(mask.astype(jnp.int32))
            slot = jnp.arange(cap, dtype=jnp.int32)
            idx = jnp.clip(jnp.searchsorted(csum, slot + 1, side="left"),
                           0, N - 1).astype(jnp.int32)
            bs = jnp.take(side, idx, axis=0)
            return s + bs[0, 0] * 1e-12 + idx[-1].astype(jnp.float32) * 1e-12

        def f_sort(s, cap=cap):
            iota = jnp.arange(N, dtype=jnp.int32)
            key = jnp.where(mask, iota, jnp.int32(2**31 - 1))
            (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
            idx = jnp.minimum(skey[:cap], N - 1)
            bs = jnp.take(side, idx, axis=0)
            return s + bs[0, 0] * 1e-12 + idx[-1].astype(jnp.float32) * 1e-12

        t_ss = timeit(f"cumsum+searchsorted cap={cap}", f_ss)
        t_so = timeit(f"key-only sort compaction cap={cap}", f_sort)
        print(f"  -> sort compaction is {t_ss / max(t_so, 1e-9):.1f}x",
              flush=True)

    # isolated pieces
    timeit("cumsum 1M alone", lambda s: s + jnp.cumsum(
        mask.astype(jnp.int32))[-1].astype(jnp.float32) * 1e-12)

    def f_ss_only(s):
        csum = jnp.cumsum(mask.astype(jnp.int32))
        slot = jnp.arange(200_000, dtype=jnp.int32)
        idx = jnp.searchsorted(csum, slot + 1, side="left")
        return s + idx[-1].astype(jnp.float32) * 1e-12
    timeit("searchsorted 200k-in-1M alone", f_ss_only)


if __name__ == "__main__":
    main()

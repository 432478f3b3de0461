"""Round-3 probe: per-step overhead of the composite kernel grid.

At tile_w=32 the step count quadruples (cap_steps = ntiles*(mpt/128+2),
ntiles=2040 at 1080p) and inactive/saturated tiles leave many grid steps
DEAD (sentinel tile or early-out skip). This measures the marginal cost
of a grid step in three states on the real TPU:

* dead      — step_tile = ntiles (sentinel): kernel body fully skipped
* saturated — live tile whose sat flag is set after the first chunk:
              the early-out path (one SMEM read per step)
* live      — every step composites a full 128-pair chunk

Cost model: frame_ms ~= a*nsteps_dead + b*nsteps_sat + c*nsteps_live.
Prints ms per 1000 steps of each kind plus the implied flagship budget.
"""

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
    from ray_eater_tpu.ops import gs

    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    TW = int(os.environ.get("RAYEATER_PROF_TILEW", 32))
    W, H = 1920, 1080
    ntx = (W + TW - 1) // TW
    nty = (H + gs.TILE_H - 1) // gs.TILE_H
    ntiles = ntx * nty
    CH = gs.CHUNK

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:48s} {best:8.3f} ms/iter", flush=True)
        return best

    def mk_steps(nsteps, mode):
        """Synthetic scalar-prefetch step tuple + records."""
        nblocks = nsteps
        rec = np.zeros((nblocks * CH, gs._ROWS), np.float32)
        # live splats: alpha ~0.5 at every pixel of the tile -> no
        # saturation before ~16 steps (op small), so every step runs
        rec[:, gs._MX] = 16.0
        rec[:, gs._MY] = 16.0
        rec[:, gs._CA] = 1e-6
        rec[:, gs._CC] = 1e-6
        # live: alpha ~0.002/pair -> T after 16 chunks ~0.016 > eps, no
        # early-out; sat: alpha ~1 -> the tile saturates on its first
        # chunk and every later step takes the early-out path
        rec[:, gs._OP] = 0.002 if mode == "live" else 0.999
        rec[:, gs._CR:gs._CB2 + 1] = 0.5
        sid = np.arange(nsteps, dtype=np.int32)
        if mode == "dead":
            tile = np.full(nsteps, ntiles, np.int32)
            first = np.zeros(nsteps, np.int32)
        else:
            # spread steps over tiles: steps_per_tile consecutive steps
            # per tile; first flags start each tile
            spt = max(nsteps // ntiles, 1)
            tile = np.minimum(sid // spt, ntiles - 1).astype(np.int32)
            first = (sid % spt == 0).astype(np.int32)
        lo = np.zeros(nsteps, np.int32)
        hi = np.full(nsteps, CH, np.int32)
        steps = tuple(jnp.asarray(x) for x in
                      (tile, first, sid % nblocks, lo, hi))
        return steps, jnp.asarray(rec)

    def run(steps, rec, t):
        # fori: iterations serialized through the records (cheap add)
        def body(i, r):
            out = gs._composite_call(r + i * 0.0, steps, nty, ntx,
                                     ctx.interpret, TW)
            return r + out[0][0, 0, 0] * 1e-20
        return lax.fori_loop(0, ITERS, body, rec)

    results = {}
    for mode in ("dead", "sat", "live"):
        for nsteps in (2048, 8192, 16384):
            steps, rec = mk_steps(nsteps, mode)
            ms = timeit(f"{mode}: nsteps={nsteps}", run, steps, rec,
                        np.float32(0))
            results[(mode, nsteps)] = ms
    for mode in ("dead", "sat", "live"):
        a = (results[(mode, 16384)] - results[(mode, 2048)]) / 14.336
        print(f"marginal cost {mode:5s}: {a * 1000:7.2f} us per 1000 "
              f"steps -> {a:6.3f} ms per 14336")


if __name__ == "__main__":
    main()

"""Round-3 probes for VERDICT task 4 (10k-tri 23.9 ms -> 60 FPS), built on
exp_shade.py's findings (one-hot fetch 2.65 ms/510 steps; region sampler
2.8-3.3 ms when spans fit a single window):

6. SUBTILE texture sampler: (16,16)-px subtiles, 16 per step (= one
   (32,128) raster tile), each with its own (C*32, 32) texel window
   selected by scalar-prefetched window ids from an overlap-window table
   (stride 16, so any span <= 17 texels fits — guaranteed at
   magnification). Bilinear weights ride the contractions.
7. SHADE accumulate kernel at the REAL step count (~2.9k steps, ~5.7
   blocks/tile): does out-block revisit residency amortize the per-step
   cost that made the 510-step probe 5.2 us/step?
8. the 370k-row pack-table gather that feeds probe 7.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.RandomState(0)
    NT = 510                                   # (32,128) tiles at 1080p
    SUB, NSUB, SPIX = 16, 16, 256              # 16x16-px subtiles
    WW, C = 32, 4                              # window extent / channels

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

    # ---- 6. subtile texture sampler ---------------------------------
    NWIN = 1089                                # (512/16+1)^2 windows
    wins = jnp.asarray(rng.rand(NWIN, C * WW, WW), jnp.float32)
    widx = jnp.asarray(rng.randint(0, NWIN, (NT, NSUB)).astype(np.int32))
    ty = jnp.asarray(rng.randint(0, WW - 1, (NT * NSUB, SPIX))
                     .astype(np.int32))
    tx = jnp.asarray(rng.randint(0, WW - 1, (NT * NSUB, SPIX))
                     .astype(np.int32))
    fy = jnp.asarray(rng.rand(NT * NSUB, SPIX), jnp.float32)
    fx = jnp.asarray(rng.rand(NT * NSUB, SPIX), jnp.float32)

    def k_sub(widx_ref, ty_ref, fy_ref, tx_ref, fx_ref, *rest):
        win_refs, o_ref = rest[:NSUB], rest[NSUB]
        rows = jax.lax.broadcasted_iota(jnp.int32, (WW, SPIX), 0)
        for s in range(NSUB):
            tys = ty_ref[s:s + 1, :]
            fys = fy_ref[s:s + 1, :]
            txs = tx_ref[s:s + 1, :]
            fxs = fx_ref[s:s + 1, :]
            wy = (jnp.where(rows == tys, 1.0 - fys, 0.0)
                  + jnp.where(rows == tys + 1, fys, 0.0))
            wx = (jnp.where(rows == txs, 1.0 - fxs, 0.0)
                  + jnp.where(rows == txs + 1, fxs, 0.0))
            b = jax.lax.dot_general(
                win_refs[s][0], wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (C*WW, SPIX)
            for c in range(C):
                o_ref[0, c, s * SPIX:(s + 1) * SPIX] = jnp.sum(
                    b[c * WW:(c + 1) * WW] * wy, axis=0)

    def sub_call(widx, ty, fy, tx, fx, wins):
        px = pl.BlockSpec((NSUB, SPIX), lambda i, w: (i, 0),
                          memory_space=pltpu.VMEM)
        win_specs = [
            pl.BlockSpec((1, C * WW, WW),
                         (lambda s: lambda i, w: (w[i, s], 0, 0))(s),
                         memory_space=pltpu.VMEM)
            for s in range(NSUB)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[px] * 4 + win_specs,
            out_specs=pl.BlockSpec((1, C, NSUB * SPIX),
                                   lambda i, w: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k_sub, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NT, C, NSUB * SPIX),
                                           jnp.float32),
        )(widx, ty, fy, tx, fx, *([wins] * NSUB))

    def body_sub(c):
        out = sub_call(widx, (ty + (c[0] & 1)) % (WW - 1), fy, tx, fx,
                       wins)
        return out[:1, 0, 0].astype(jnp.int32)
    fn, c0 = loop(body_sub)
    t = timeit(f"subtile sampler {NT} steps x {NSUB} windows", fn, c0)
    if t is not None:
        got = np.asarray(jax.jit(sub_call)(widx, ty, fy, tx, fx, wins))
        wn, tyn, txn = (np.asarray(a) for a in (wins, ty, tx))
        fyn, fxn, wix = (np.asarray(a) for a in (fy, fx, widx))
        ok = True
        for i in range(3):
            for s in range(0, NSUB, 5):
                for p in range(0, SPIX, 97):
                    w = wn[wix[i, s]]
                    y, x = tyn[i * NSUB + s, p], txn[i * NSUB + s, p]
                    gy, gx = fyn[i * NSUB + s, p], fxn[i * NSUB + s, p]
                    want = ((w[y, x] * (1 - gy) + w[y + 1, x] * gy)
                            * (1 - gx)
                            + (w[y, x + 1] * (1 - gy)
                               + w[y + 1, x + 1] * gy) * gx)
                    if not np.allclose(got[i, 0, s * SPIX + p], want,
                                       atol=2e-3):
                        print(f"    MISMATCH t{i} s{s} p{p}: "
                              f"{got[i, 0, s * SPIX + p]:.5f} vs "
                              f"{want:.5f}", flush=True)
                        ok = False
                        break
        print(f"    subtile sampler spot-check {'OK' if ok else 'FAIL'}",
              flush=True)

    # reference: the current packed bilinear gather at 2M px
    HP, WP = 1088, 1920
    packed = jnp.asarray(rng.randint(0, 2**31 - 1, (512 * 512,))
                         .astype(np.int32))[:, None] * jnp.ones(
                             (1, 4), jnp.int32)
    gidx2 = jnp.asarray(rng.randint(0, 512 * 512, HP * WP)
                        .astype(np.int32))

    def body_packed(c):
        q = jnp.take(packed, (gidx2 + c[0]) % (512 * 512), axis=0)
        ch = [((jax.lax.shift_right_logical(q[:, k], 8) & 255)
               .astype(jnp.float32)) for k in range(4)]
        top = ch[0] * 0.5 + ch[1] * 0.5
        bot = ch[2] * 0.5 + ch[3] * 0.5
        return (top * 0.5 + bot * 0.5)[:1].astype(jnp.int32)
    fn, c0 = loop(body_packed)
    timeit("packed quad gather 2.1M px (current path)", fn, c0)

    # ---- 7. shade accumulate at real step count ----------------------
    BLK_PER_TILE, F = 6, 24
    NSTEP = NT * BLK_PER_TILE                  # 3060 steps
    slots = jnp.asarray(                       # global winner slot / px
        rng.randint(0, NSTEP * 128, (NT * 32, 128)).astype(np.int32))
    tabs = jnp.asarray(rng.rand(NSTEP * 128, F), jnp.float32)
    step_tile = jnp.asarray(np.arange(NSTEP, dtype=np.int32)
                            // BLK_PER_TILE)
    step_blk = jnp.asarray(np.arange(NSTEP, dtype=np.int32))

    def k_acc(st_ref, sb_ref, slot_ref, tab_ref, o_ref):
        si = pl.program_id(0)

        @pl.when(si % BLK_PER_TILE == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref[:])
        sl = slot_ref[:].reshape(1, NSUB * SPIX) - sb_ref[si] * 128
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, NSUB * SPIX), 0)
        oh = (rows == sl).astype(jnp.float32)
        o_ref[:] += jax.lax.dot_general(
            tab_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]

    def acc_call(slots, tabs):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NSTEP,),
            in_specs=[
                pl.BlockSpec((32, 128), lambda i, st, sb: (st[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, F), lambda i, st, sb: (sb[i], 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, F, NSUB * SPIX),
                                   lambda i, st, sb: (st[i], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k_acc, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NT, F, NSUB * SPIX),
                                           jnp.float32),
        )(step_tile, step_blk, slots, tabs)

    def body_acc(c):
        out = acc_call(slots ^ (c[0] & 1), tabs)
        return out[0, :1, 0].astype(jnp.int32)
    fn, c0 = loop(body_acc)
    t = timeit(f"shade accumulate {NSTEP} steps (revisit x{BLK_PER_TILE})",
               fn, c0)
    if t is not None:
        got = np.asarray(jax.jit(acc_call)(slots, tabs))
        sl = np.asarray(slots)
        tn = np.asarray(tabs)
        ok = True
        for i in range(3):
            for p in range(0, NSUB * SPIX, 997):
                s = sl[i * 32 + p // 128, p % 128]
                blk = s // 128
                inside = (i * BLK_PER_TILE <= blk
                          < (i + 1) * BLK_PER_TILE)
                want = tn[s] if inside else np.zeros(F, np.float32)
                if not np.allclose(got[i, :, p], want, atol=1e-2):
                    print(f"    MISMATCH tile {i} px {p}", flush=True)
                    ok = False
                    break
        print(f"    shade accumulate spot-check {'OK' if ok else 'FAIL'}",
              flush=True)

    # ---- 8. the pack-table gather that feeds probe 7 ------------------
    tri_tab = jnp.asarray(rng.rand(10082, F), jnp.float32)
    gid = jnp.asarray(rng.randint(0, 10082, NSTEP * 128).astype(np.int32))

    def body_g(c):
        out = jnp.take(tri_tab, (gid + c[0]) % 10082, axis=0)
        return out[:1, 0].astype(jnp.int32)
    fn, c0 = loop(body_g)
    timeit(f"pack-table gather {NSTEP * 128 / 1e3:.0f}k rows ({F} cols)",
           fn, c0)


if __name__ == "__main__":
    main()

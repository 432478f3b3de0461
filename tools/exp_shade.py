"""Round-3 probe (VERDICT task 4): can the deferred-shading feature fetch
move INTO the binned raster kernel as a per-step one-hot MXU matmul?

The 10k-tri frame pays 6.6 ms fetching one (P, F) feature row per pixel
(XLA row gather, ~140-210M rows/s — BENCHLOG known-bottleneck 1). Inside
the kernel, the winner's PAIR SLOT is known per pixel; a (CHUNK, PIX)
one-hot against the step's (CHUNK, F) feature block is a tiny MXU matmul
— if Mosaic accepts the layout ops it needs:

1. (TILE_H, TILE_W) -> (1, PIX) reshape of the winner-slot plane
   (2D->2D minor-dim collapse — the guide only bans 1D->3D).
2. dot_general((CHUNK, F) x (CHUNK, PIX) contracting dim 0) -> (F, PIX).
3. rate: flat-plane kernel one-hot vs jnp.take at 2M-pixel scale.
"""

import os
import sys
import time
import functools

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
    TILE_H, TILE_W, PIX, CHUNK, F = 32, 128, 4096, 128, 24

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:
            print(f"{name:48s} RAISED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        best = 1e9
        # np.asarray fetch, not block_until_ready: through the relay,
        # block on a tiny output can return before execution completes
        # (tools/exp_payload.py observed 195k "FPS")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:48s} {best:8.2f} ms/iter", flush=True)
        return best

    rng = np.random.RandomState(0)

    # -- 1. legality: reshape (32,128)->(1,4096) inside a kernel ---------
    def k_reshape(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, PIX)

    def try_reshape(x):
        return pl.pallas_call(
            k_reshape,
            in_specs=[pl.BlockSpec((TILE_H, TILE_W),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, PIX), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, PIX), jnp.float32),
        )(x)

    x = jnp.asarray(rng.rand(TILE_H, TILE_W), jnp.float32)
    r = timeit("reshape (32,128)->(1,4096) in-kernel", try_reshape, x)
    if r is not None:
        want = np.asarray(x).reshape(1, PIX)
        got = np.asarray(jax.jit(try_reshape)(x))
        print("    reshape correct:", np.allclose(got, want), flush=True)

    # -- 2. one-hot matmul per step on flat planes -----------------------
    # slot plane fed as native (TILE_H, TILE_W) tile blocks (a (1, PIX)
    # block over an (NT, PIX) array is ILLEGAL: leading block dim 1 is
    # neither 8-divisible nor array-equal); reshape in-kernel (probe 1
    # proves the 2D->2D minor collapse legal). table (CHUNK, F).
    def k_onehot(slot_ref, tab_ref, o_ref):
        sl = slot_ref[:].reshape(1, PIX)                   # i32
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, PIX), 0)
        oh = (rows == sl).astype(jnp.float32)              # (CHUNK, PIX)
        o_ref[:] = jax.lax.dot_general(
            tab_ref[:], oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]      # (1, F, PIX)

    def onehot_call(slots, tab):
        nt = slots.shape[0] // TILE_H
        return pl.pallas_call(
            k_onehot,
            grid=(nt,),
            in_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((CHUNK, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, F, PIX), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, F, PIX), jnp.float32),
        )(slots, tab)

    NT = 510                                  # 1080p tile count
    slots = jnp.asarray(
        rng.randint(-1, CHUNK, (NT * TILE_H, TILE_W)).astype(np.int32))
    tab = jnp.asarray(rng.rand(NT * CHUNK, F), jnp.float32)

    def body_oh(c):
        # real carry dependence (& 1, not & 0): a loop-invariant body gets
        # hoisted and the loop times ONE iteration, not ITERS
        out = onehot_call(slots ^ (c[0] & 1), tab)
        return out[0, :1, 0].astype(jnp.int32)

    def loop(body):
        return (lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc),
                                        c), jnp.zeros(1, jnp.int32))
    fn, c0 = loop(body_oh)
    t = timeit(f"one-hot matmul {NT} steps x (128x{F})@PIX", fn, c0)
    if t is not None:
        # correctness vs numpy
        got = np.asarray(jax.jit(onehot_call)(slots, tab))
        sl = np.asarray(slots)
        want = np.zeros((NT, F, PIX), np.float32)
        for i in range(4):                    # spot-check 4 tiles
            for p in range(0, PIX, 997):
                s = sl[i * TILE_H + p // TILE_W, p % TILE_W]
                if 0 <= s < CHUNK:
                    want[i, :, p] = np.asarray(tab)[i * CHUNK + s]
                ok = np.allclose(got[i, :, p], want[i, :, p], atol=1e-5)
                if not ok:
                    print(f"    MISMATCH tile {i} px {p}", flush=True)
                    break
        print("    one-hot spot-check done", flush=True)

    # -- 3. XLA take reference at the same scale -------------------------
    gidx = jnp.asarray(rng.randint(0, NT * CHUNK, NT * PIX)
                       .astype(np.int32))

    def body_take(c):
        out = jnp.take(tab, (gidx + c[0]) % (NT * CHUNK), axis=0)
        return out[:1, 0].astype(jnp.int32)
    fn, c0 = loop(body_take)
    timeit(f"XLA take {NT * PIX / 1e6:.1f}M rows ({F} cols)", fn, c0)

    # -- 4. factorized per-tile texture fetch (VERDICT task 4, texture
    #       9.9 ms): per tile, texels come from a 64x64 region; fetch =
    #       one-hot ROW contraction (4096px x 64) @ (64, 64*C) then a
    #       per-pixel COLUMN select — all dense VPU/MXU math, no gather.
    R, C = 64, 4
    regions = jnp.asarray(rng.rand(NT, R, R * C), jnp.float32)
    t_y = jnp.asarray(rng.randint(0, R, (NT, PIX)).astype(np.int32))
    t_x = jnp.asarray(rng.randint(0, R, (NT, PIX)).astype(np.int32))

    def body_fact(c):
        ty = (t_y + (c[0] & 1)) % R
        oh = (ty[:, :, None] == jnp.arange(R, dtype=jnp.int32)
              ).astype(jnp.float32)                     # (NT, PIX, R)
        rowsel = jnp.einsum("tpr,trf->tpf", oh, regions)  # (NT,PIX,R*C)
        rs = rowsel.reshape(NT, PIX, R, C)
        ohx = (t_x[:, :, None] == jnp.arange(R, dtype=jnp.int32)
               ).astype(jnp.float32)                    # (NT, PIX, R)
        out = jnp.einsum("tprc,tpr->tpc", rs, ohx)      # (NT, PIX, C)
        return out[:1, 0, 0].astype(jnp.int32)
    fn, c0 = loop(body_fact)
    timeit(f"factorized region fetch {NT}x{PIX}px ({R}x{R} region, "
           f"{C} ch)", fn, c0)

    # same, but the row contraction via MXU-shaped matmul per tile and
    # the column select via a VPU dot (batched) — flattened tiles
    def body_fact2(c):
        ty = ((t_y + (c[0] & 1)) % R).reshape(NT * PIX)
        tx = t_x.reshape(NT * PIX)
        # gather instead: one take of NT*PIX rows from (NT*R, R*C) —
        # row-count reference for the region-local fetch
        flat = regions.reshape(NT * R, R * C)
        rows = jnp.take(flat, ty + (jnp.arange(NT * PIX) // PIX) * R,
                        axis=0)                         # (NT*PIX, R*C)
        rs = rows.reshape(NT * PIX, R, C)
        ohx = (tx[:, None] == jnp.arange(R, dtype=jnp.int32)
               ).astype(jnp.float32)
        out = jnp.einsum("prc,pr->pc", rs, ohx)
        return out[:1, 0].astype(jnp.int32)
    fn, c0 = loop(body_fact2)
    timeit("row-take + column one-hot (hybrid)", fn, c0)

    # -- 5. IN-KERNEL per-tile region sampler: bilinear weights ride the
    #       contractions. Per tile, a (C*R, R) channel-blocked texel
    #       region; wy/wx are built dense in-kernel from ty/fy planes with
    #       the 2-tap bilinear weights in place of the one-hot — the
    #       matmul does filter + fetch at once, zero gathers.
    #       out_c[p] = sum_y sum_x region[c*R+y, x] * wy[y,p] * wx[x,p]
    def make_region_kernel(R):
        def k_region(ty_ref, fy_ref, tx_ref, fx_ref, reg_ref, o_ref):
            ty = ty_ref[:].reshape(1, PIX)
            fy = fy_ref[:].reshape(1, PIX)
            tx = tx_ref[:].reshape(1, PIX)
            fx = fx_ref[:].reshape(1, PIX)
            ry = jax.lax.broadcasted_iota(jnp.int32, (R, PIX), 0)
            wy = (jnp.where(ry == ty, 1.0 - fy, 0.0)
                  + jnp.where(ry == ty + 1, fy, 0.0))       # (R, PIX)
            wx = (jnp.where(ry == tx, 1.0 - fx, 0.0)
                  + jnp.where(ry == tx + 1, fx, 0.0))       # (R, PIX)
            for c in range(C):
                sub = reg_ref[0, c * R:(c + 1) * R, :]      # (R_y, R_x)
                a = jax.lax.dot_general(
                    sub, wy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (R_x, PIX)
                o_ref[0, c, :] = jnp.sum(a * wx, axis=0)

        def call(ty, fy, tx, fx, regs):
            nt = ty.shape[0] // TILE_H
            px_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            return pl.pallas_call(
                k_region,
                grid=(nt,),
                in_specs=[px_spec] * 4 + [
                    pl.BlockSpec((1, C * R, R), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, C, PIX), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nt, C, PIX), jnp.float32),
            )(ty, fy, tx, fx, regs)
        return call

    for R2 in (32, 64):
        call = make_region_kernel(R2)
        ty2 = jnp.asarray(rng.randint(0, R2 - 1, (NT * TILE_H, TILE_W))
                          .astype(np.int32))
        tx2 = jnp.asarray(rng.randint(0, R2 - 1, (NT * TILE_H, TILE_W))
                          .astype(np.int32))
        fy2 = jnp.asarray(rng.rand(NT * TILE_H, TILE_W), jnp.float32)
        fx2 = jnp.asarray(rng.rand(NT * TILE_H, TILE_W), jnp.float32)
        regs = jnp.asarray(rng.rand(NT, C * R2, R2), jnp.float32)

        def body_reg(c, call=call, ty2=ty2, fy2=fy2, tx2=tx2, fx2=fx2,
                     regs=regs, R2=R2):
            out = call((ty2 + (c[0] & 1)) % (R2 - 1), fy2, tx2, fx2, regs)
            return out[:1, 0, 0].astype(jnp.int32)
        fn, c0 = loop(body_reg)
        t = timeit(f"in-kernel region sampler {NT} tiles R={R2} C={C}",
                   fn, c0)
        if t is not None:
            got = np.asarray(jax.jit(call)(ty2, fy2, tx2, fx2, regs))
            tyn, txn = np.asarray(ty2), np.asarray(tx2)
            fyn, fxn = np.asarray(fy2), np.asarray(fx2)
            rn = np.asarray(regs)
            ok = True
            for i in range(3):
                for p in range(0, PIX, 1499):
                    r0, c0_ = p // TILE_W, p % TILE_W
                    y, x = tyn[i * TILE_H + r0, c0_], txn[i * TILE_H + r0,
                                                          c0_]
                    gy, gx = fyn[i * TILE_H + r0, c0_], fxn[i * TILE_H
                                                            + r0, c0_]
                    want = ((rn[i, 0 * R2 + y, x] * (1 - gy)
                             + rn[i, 0 * R2 + y + 1, x] * gy) * (1 - gx)
                            + (rn[i, 0 * R2 + y, x + 1] * (1 - gy)
                               + rn[i, 0 * R2 + y + 1, x + 1] * gy) * gx)
                    if not np.allclose(got[i, 0, p], want, atol=1e-4):
                        print(f"    MISMATCH tile {i} px {p}: "
                              f"{got[i, 0, p]} vs {want}", flush=True)
                        ok = False
                        break
            print(f"    region sampler R={R2} spot-check "
                  f"{'OK' if ok else 'FAILED'}", flush=True)


if __name__ == "__main__":
    main()

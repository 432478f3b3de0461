"""Composite-kernel ablations on the real TPU at bench scale.

Times kernel variants on REAL binned data (the 1M-splat bench scene) to
attribute the composite stage's cost: full kernel, prefix-matmul removed,
transcendentals removed, rgb-matmul removed. Wrong math is fine — same
shapes/ops otherwise. fori_loop-of-10, one dispatch.
"""

from __future__ import annotations

import functools
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

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import random_cloud
    from ray_eater_tpu.ops import gs

    W, H = 1920, 1080
    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    cloud = random_cloud(1_000_000, seed=1, extent=1.0,
                         scale_range=(0.004, 0.02))
    view = rmath.look_at_zforward(rmath.vec(2.5, 0.8, 0.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
    ntx = (W + gs.TILE_W - 1) // gs.TILE_W
    nty = (H + gs.TILE_H - 1) // gs.TILE_H
    ntiles = ntx * nty
    cap = 4 * 1_000_000 + ntiles * gs.CHUNK

    MPT = int(os.environ.get("RAYEATER_EXP_MPT", 0)) or None

    @jax.jit
    def prep(ms, ss, qs, os_, cs):
        ps = gs.project_gaussians(ms, ss, qs, os_, cs, view, proj, W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap,
            max_per_tile=MPT)
        return gs._pack_records(recs, pidx), steps

    packed, steps = jax.block_until_ready(prep(
        cloud.means, cloud.scales, cloud.quats, cloud.opacities,
        cloud.colors))
    nsteps = steps[0].shape[0]
    print(f"nsteps={nsteps} live={int((np.asarray(steps[0])<ntiles).sum())}",
          flush=True)

    CHUNK, PIX, ROWS = gs.CHUNK, gs._PIX, gs._ROWS
    TILE_W, TILE_H = gs.TILE_W, gs.TILE_H
    (_MX, _MY, _CA, _CB, _CC, _OP, _CR, _CG, _CB2) = range(9)

    def make_kernel(mode):
        def body(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref, tile, base,
                 lo, hi):
            ty0 = (tile // ntx) * TILE_H
            tx0 = (tile % ntx) * TILE_W
            i = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
            px = (jax.lax.bitwise_and(i, TILE_W - 1) + tx0
                  ).astype(jnp.float32) + 0.5
            py = (jax.lax.shift_right_logical(i, 7) + ty0
                  ).astype(jnp.float32) + 0.5
            col = lambda c: rec_ref[:, c:c + 1]
            dx = px - col(_MX)
            dy = py - col(_MY)
            power = (-0.5 * (col(_CA) * dx * dx + col(_CC) * dy * dy)
                     - col(_CB) * dx * dy)
            if mode == "notrans":
                alpha = jnp.clip(col(_OP) * (1.0 + 0.1 * power), 0.0, 0.99)
            else:
                alpha = jnp.minimum(col(_OP) * jnp.exp(power), 0.99)
            rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + base
            live = (rows >= lo) & (rows < hi)
            alpha = jnp.where(live & (alpha >= 1 / 255), alpha, 0.0)
            if mode == "notrans":
                log_om = -alpha
            else:
                log_om = jnp.log(jnp.maximum(1.0 - alpha, 1e-6))
            if mode == "cumprod":
                # matmul-free exclusive transmittance prefix: multiplicative
                # doubling scan over the splat (sublane) axis via circular
                # rolls — no log/exp at all
                om = 1.0 - alpha                          # (C, P)
                ridx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, PIX), 0)
                p = om
                s = 1
                while s < CHUNK:
                    p = p * jnp.where(ridx >= s,
                                      pltpu.roll(p, shift=s, axis=0), 1.0)
                    s *= 2
                pre = jnp.where(ridx >= 1, pltpu.roll(p, shift=1, axis=0),
                                1.0)
                t_in = t_ref[0]
                w = alpha * pre * t_in
                rgb = jax.lax.dot_general(
                    rec_ref[:, _CR:_CB2 + 1], w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                r_ref[0] = r_ref[0] + rgb[0:1]
                g_ref[0] = g_ref[0] + rgb[1:2]
                b_ref[0] = b_ref[0] + rgb[2:3]
                t_new = t_in * p[CHUNK - 1:CHUNK]
                t_ref[0] = t_new
                sat_ref[0] = (jnp.max(t_new) < 1e-4).astype(jnp.int32)
                return
            if mode == "noprefix":
                prefix = log_om * 0.5
            else:
                ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
                cj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
                dt = jnp.bfloat16 if mode == "bf16" else jnp.float32
                ltri = (ri > cj).astype(dt)
                prefix = jax.lax.dot_general(
                    ltri, log_om.astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            t_in = t_ref[0]
            if mode == "notrans":
                w = alpha * (1.0 + prefix) * t_in
            else:
                w = alpha * jnp.exp(prefix) * t_in
            if mode == "norgb":
                rgb = w[:3]
            else:
                rgb = jax.lax.dot_general(
                    rec_ref[:, _CR:_CB2 + 1], w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            r_ref[0] = r_ref[0] + rgb[0:1]
            g_ref[0] = g_ref[0] + rgb[1:2]
            b_ref[0] = b_ref[0] + rgb[2:3]
            if mode == "notrans":
                t_new = t_in * (1.0 + jnp.sum(log_om, 0, keepdims=True))
            else:
                t_new = t_in * jnp.exp(jnp.sum(log_om, 0, keepdims=True))
            t_ref[0] = t_new
            sat_ref[0] = (jnp.max(t_new) < 1e-4).astype(jnp.int32)

        def kern(st_ref, sf_ref, sb_ref, sl_ref, sh_ref, rec_ref,
                 r_ref, g_ref, b_ref, t_ref, sat_ref):
            si = pl.program_id(0)
            tile = st_ref[si]

            @pl.when(tile < ntiles)
            def _():
                @pl.when(sf_ref[si] == 1)
                def _init():
                    r_ref[0] = jnp.zeros((1, PIX), jnp.float32)
                    g_ref[0] = jnp.zeros((1, PIX), jnp.float32)
                    b_ref[0] = jnp.zeros((1, PIX), jnp.float32)
                    t_ref[0] = jnp.ones((1, PIX), jnp.float32)
                    sat_ref[0] = 0

                @pl.when(sat_ref[0] == 0)
                def _run():
                    body(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref,
                         tile, sb_ref[si] * CHUNK, sl_ref[si], sh_ref[si])
        return kern

    def run_variant(mode):
        kern = make_kernel(mode)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((CHUNK, ROWS),
                                   lambda si, st, sf, sb, sl, sh:
                                   (sb[si], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(
                (1, 1, PIX),
                lambda si, st, sf, sb, sl, sh:
                (jnp.minimum(st[si], ntiles), 0, 0),
                memory_space=pltpu.VMEM)] * 4,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )
        out_shape = [jax.ShapeDtypeStruct((ntiles + 1, 1, PIX),
                                          jnp.float32)] * 4
        call = pl.pallas_call(kern, grid_spec=grid_spec,
                              out_shape=out_shape)

        @jax.jit
        def loop(recs, *st):
            def it(i, carry):
                r, g, b, t = call(*st, recs + carry * 0)
                return carry + r[0, 0, 0] * 1e-20 + jnp.float32(1e-9)
            return lax.fori_loop(0, ITERS, it, jnp.float32(0))

        jax.block_until_ready(loop(packed, *steps))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(packed, *steps))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"composite[{mode:9s}] {best:7.2f} ms/iter", flush=True)

    modes = os.environ.get("RAYEATER_EXP_MODES",
                           "full,noprefix,notrans,norgb,bf16").split(",")
    for mode in modes:
        run_variant(mode)


if __name__ == "__main__":
    main()

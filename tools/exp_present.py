"""Present-path throughput at 1080p (VERDICT round-3 task 7).

The reference's only egress is WSI present (swapchain.zig:253-263); ours
is the Swapchain device→host DMA ring plus the LiveViewer MJPEG / native
PNG encoders. This measures, on the real device:

  1. render-only FPS of a trivially cheap frame program (the dispatch
     floor: through the axon tunnel every per-frame dispatch pays a
     fixed ~28 ms RPC — BENCHLOG round 2 — so present-per-frame loops
     are tunnel-bound, not DMA-bound; this row quantifies that floor)
  2. sustained Swapchain present FPS (render + device sRGB encode +
     ring readback), ring depth 3 and 2 — i.e. what a sample's
     windowed present loop actually achieves
  3. the stage split: device encode dispatch, blocking device→host DMA
     of the encoded 1080p u8 frame (8.3 MB), host JPEG (PIL q85, the
     LiveViewer payload), host native PNG (rayeater_native zlib)
  4. LiveViewer end-to-end present (encode_jpeg + mailbox swap), no
     HTTP client attached

Record the results in BENCHLOG.md.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 1920, 1080
FRAMES = int(os.environ.get("RAYEATER_EXP_FRAMES", 60))


def main():
    import jax
    import jax.numpy as jnp

    import ray_eater_tpu as re
    from ray_eater_tpu.core.swapchain import encode_present
    from ray_eater_tpu.io.viewer import encode_jpeg
    from ray_eater_tpu.native import loader as native

    ctx = re.Context()
    print(f"device: {ctx.device}  {W}x{H} x{FRAMES} frames", flush=True)

    # cheap animated frame: one fused elementwise program writing the
    # full float32 framebuffer (a stand-in for "render finished, color
    # attachment lives in HBM")
    ys = jnp.linspace(0.0, 1.0, H)[:, None]
    xs = jnp.linspace(0.0, 1.0, W)[None, :]

    @jax.jit
    def frame(t):
        r = jnp.broadcast_to(0.5 + 0.5 * jnp.sin(6.28 * (xs + t)), (H, W))
        g = jnp.broadcast_to(0.5 + 0.5 * jnp.cos(6.28 * (ys - t)), (H, W))
        b = jnp.broadcast_to(t % 1.0, (H, W))
        a = jnp.ones((H, W), jnp.float32)
        return jnp.stack([r, g, b, a], -1)

    class FB:  # framebuffer shim: Swapchain only reads .color
        def __init__(self, color):
            self.color = color

    jax.block_until_ready(frame(np.float32(0.0)))

    # -- 1. render-only dispatch floor ---------------------------------
    t0 = time.perf_counter()
    for k in range(FRAMES):
        jax.block_until_ready(frame(np.float32(k / 60.0)))
    dt = time.perf_counter() - t0
    print(f"render-only (block each frame): {FRAMES / dt:6.1f} FPS "
          f"({dt / FRAMES * 1e3:.1f} ms/frame = the per-dispatch floor)",
          flush=True)

    # -- 2. sustained swapchain present --------------------------------
    for ring in (3, 2):
        sc = re.Swapchain(ctx, W, H, image_count=ring)
        # warm the encode jit
        sc.present(FB(frame(np.float32(0.0))))
        for _ in sc.drain():
            pass
        sc = re.Swapchain(ctx, W, H, image_count=ring)
        got = 0
        t0 = time.perf_counter()
        for k in range(FRAMES):
            out = sc.present(FB(frame(np.float32(k / 60.0))))
            got += out is not None
        for _ in sc.drain():
            got += 1
        dt = time.perf_counter() - t0
        assert got == FRAMES
        print(f"swapchain present ring={ring}:      {FRAMES / dt:6.1f} FPS "
              f"({dt / FRAMES * 1e3:.1f} ms/frame, async_ok="
              f"{sc._async_ok})", flush=True)

    # -- 2b. FUSED present: the frame program emits encoded u8 directly
    # (encode_present folded into the render jit), so each present costs
    # ONE dispatch + the ring DMA instead of two dispatches
    @jax.jit
    def frame_encoded(t):
        return encode_present(frame(t), W, H, True)

    jax.block_until_ready(frame_encoded(np.float32(0.0)))
    sc = re.Swapchain(ctx, W, H, image_count=3)
    got = 0
    t0 = time.perf_counter()
    for k in range(FRAMES):
        out = sc.present_encoded(frame_encoded(np.float32(k / 60.0)))
        got += out is not None
    for _ in sc.drain():
        got += 1
    dt = time.perf_counter() - t0
    assert got == FRAMES
    print(f"swapchain FUSED-encode present: {FRAMES / dt:6.1f} FPS "
          f"({dt / FRAMES * 1e3:.1f} ms/frame)", flush=True)

    # -- 3. stage split -------------------------------------------------
    enc = jax.jit(lambda c: encode_present(c, W, H, True))
    color = jax.block_until_ready(frame(np.float32(0.25)))
    jax.block_until_ready(enc(color))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(enc(color))
    print(f"device sRGB-encode dispatch:    "
          f"{(time.perf_counter() - t0) / 20 * 1e3:6.1f} ms", flush=True)

    encoded = jax.block_until_ready(enc(color))
    t0 = time.perf_counter()
    for _ in range(20):
        host = np.asarray(encoded)
    dma = (time.perf_counter() - t0) / 20
    print(f"device->host DMA 8.3MB u8:      {dma * 1e3:6.1f} ms "
          f"({encoded.nbytes / dma / 1e6:.0f} MB/s)", flush=True)

    t0 = time.perf_counter()
    for _ in range(20):
        jpg = encode_jpeg(host)
    print(f"host JPEG q85 (LiveViewer):     "
          f"{(time.perf_counter() - t0) / 20 * 1e3:6.1f} ms "
          f"({len(jpg) // 1024} KB)", flush=True)

    if native.available():
        t0 = time.perf_counter()
        for _ in range(5):
            png = native.png_encode(host)
        print(f"host native PNG encode:         "
              f"{(time.perf_counter() - t0) / 5 * 1e3:6.1f} ms "
              f"({len(png) // 1024} KB)", flush=True)

    # -- 4. LiveViewer end-to-end present (no clients) ------------------
    from ray_eater_tpu.io.viewer import LiveViewer
    lv = LiveViewer(port=0)
    try:
        sc = re.Swapchain(ctx, W, H, image_count=3)
        got = 0
        t0 = time.perf_counter()
        for k in range(FRAMES):
            out = sc.present(FB(frame(np.float32(k / 60.0))))
            if out is not None:
                lv.present(out)
                got += 1
        dt = time.perf_counter() - t0
        print(f"render+present+MJPEG e2e:       {FRAMES / dt:6.1f} FPS "
              f"({dt / FRAMES * 1e3:.1f} ms/frame, {got} encoded)",
              flush=True)
    finally:
        lv.stop()


if __name__ == "__main__":
    main()

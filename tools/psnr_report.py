"""Per-config PSNR vs the float64 oracles — CI artifact (VERDICT r1 #9).

Prints one line per config: the Pallas pipeline (interpret mode on CPU)
measured against the independent float64 reference implementations
(tests/golden_raster.py numpy rasterizer; the gs reference compositor).
Run by CI after the test suite; numbers land in the job log.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse < 1e-12 else 10 * np.log10(1.0 / mse)


def main():
    import golden_raster as gold

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import random_cloud
    from ray_eater_tpu.ops.gs import project_gaussians, render_gaussians
    from ray_eater_tpu.ops.raster import render_mesh
    from test_gs import reference_composite

    W, H = 256, 128

    # --- raster: two_planes vs float64 oracle ---------------------------
    mesh = re.two_planes()
    uni = {
        "model": rmath.rotate_y(rmath.identity(), rmath.radians(25.0)),
        "view": rmath.look_at(rmath.vec(2., 2., 2.), rmath.vec(0., 0., 0.)),
        "projection": rmath.perspective(rmath.radians(45.0), W / H,
                                        0.1, 30.0),
    }

    def frag(v, r):
        c = v["color"]
        return jnp.concatenate([c, jnp.ones((*c.shape[:-1], 1))], -1)

    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=frag)
    fb = re.create_framebuffer(W, H)
    out = render_mesh(pipe, mesh, uni, {}, fb, interpret=True)

    mvp = np.asarray(rmath.mul(rmath.mul(uni["projection"], uni["view"]),
                               uni["model"]), np.float64)
    pos = np.asarray(mesh.positions, np.float64)
    clip = np.concatenate([pos, np.ones((len(pos), 1))], -1) @ mvp.T
    depth, tri, bary, inv_w = gold.rasterize_reference(
        clip, np.asarray(mesh.indices), W, H)
    col = gold.interpolate(np.asarray(mesh.attributes["color"]),
                           np.asarray(mesh.indices), tri, bary, inv_w)
    m = tri >= 0
    want = np.where(m[..., None], col, 0.0)
    got = np.asarray(out.color)[:H, :W, :3]
    print(f"PSNR raster_two_planes_vs_float64_oracle: "
          f"{psnr(got, want):.1f} dB")

    # --- gs: random cloud vs float64 reference compositor ---------------
    cloud = random_cloud(200, seed=5, extent=0.8, scale_range=(0.02, 0.08))
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.0, -3.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)
    img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                      interpret=True))
    ps = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                           cloud.opacities, cloud.colors, view, proj, W, H)
    ref = reference_composite(ps, W, H, (0.0, 0.0, 0.0))
    print(f"PSNR gs_composite_vs_float64_oracle: {psnr(img, ref):.1f} dB")

    # --- gs LOD config (the bench default) vs exact ----------------------
    lod = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                      max_splats_per_tile=512,
                                      interpret=True))
    print(f"PSNR gs_lod512_vs_exact: {psnr(lod, img):.1f} dB")


if __name__ == "__main__":
    main()

"""Raster megakernel vs the independent numpy reference rasterizer.

The image-diff gate (BASELINE.md correctness gate): the Pallas kernel (run
in interpreter mode on CPU) and the float64 per-pixel reference must agree
everywhere except a tiny fraction of edge pixels (f32 vs f64 edge tests).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import ray_eater_tpu as re
from ray_eater_tpu import rmath
from ray_eater_tpu.core.pipeline import (CompareOp, CullMode, FrontFace,
                                         GraphicsPipeline, RasterState)
from ray_eater_tpu.ops.raster import render_mesh, _triangle_setup
import golden_raster as gold

W, H = 120, 80


def sample_uniforms(t=0.3):
    """The per-frame UBO of basic_planes.updateUniforms
    (basic_planes.zig:295-314)."""
    return {
        "model": rmath.rotate_y(rmath.identity(), rmath.radians(45.0) * t),
        "view": rmath.look_at(rmath.vec(2., 2., 2.), rmath.vec(0., 0., 0.)),
        "projection": rmath.perspective(rmath.radians(45.0), W / H, 0.1,
                                        30.0),
    }


def flat_color_fragment(varyings, resources):
    c = varyings["color"]
    return jnp.concatenate([c, jnp.ones((*c.shape[:-1], 1), jnp.float32)],
                           -1)


def mvp_clip(mesh, uniforms):
    mvp = np.asarray(rmath.mul(rmath.mul(uniforms["projection"],
                                         uniforms["view"]),
                               uniforms["model"]), np.float64)
    pos = np.asarray(mesh.positions, np.float64)
    hom = np.concatenate([pos, np.ones((len(pos), 1))], -1)
    return hom @ mvp.T


def golden_flat(mesh, uniforms, depth_test=True, cull="back"):
    clip = mvp_clip(mesh, uniforms)
    idx = np.asarray(mesh.indices)
    depth, tri, bary, inv_w = gold.rasterize_reference(
        clip, idx, W, H, cull=cull, depth_test=depth_test)
    col = gold.interpolate(np.asarray(mesh.attributes["color"]), idx, tri,
                           bary, inv_w)
    img = np.zeros((H, W, 4))
    m = tri >= 0
    img[..., :3] = np.where(m[..., None], col, 0.0)
    img[..., 3] = np.where(m, 1.0, 1.0)
    img[~m] = [0, 0, 0, 1]
    return img, depth, tri


def run_render(pipe, mesh, uniforms, resources=None):
    fb = re.create_framebuffer(W, H)
    out = render_mesh(pipe, mesh, uniforms, resources or {}, fb,
                      interpret=True)
    color = np.asarray(out.color)[:H, :W]
    depth = np.asarray(out.depth)[:H, :W]
    return color, depth


def assert_images_close(got, want, max_bad_frac=0.005, atol=1e-3):
    bad = np.abs(got - want).max(-1) > atol
    frac = bad.mean()
    assert frac <= max_bad_frac, f"{frac:.4%} pixels differ (> {atol})"


def test_two_planes_flat_matches_golden():
    mesh = re.two_planes()
    uni = sample_uniforms()
    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=flat_color_fragment)
    got_c, got_d = run_render(pipe, mesh, uni)
    want_img, want_d, want_tri = golden_flat(mesh, uni)
    assert (want_tri >= 0).mean() > 0.05, "scene should cover some pixels"
    assert_images_close(got_c, want_img)
    bad = np.abs(got_d - np.minimum(want_d, 1.0)).max()
    # depth buffer: inf where nothing drawn → clamp comparison to drawn px
    m = want_tri >= 0
    assert np.abs(got_d[m] - want_d[m]).max() < 1e-4


def test_textured_border_matches_golden():
    mesh = re.two_planes()
    uni = sample_uniforms(t=0.55)
    rng = np.random.RandomState(1)
    tex_u8 = (rng.rand(16, 24, 4) * 255).astype(np.uint8)
    tex = re.texture_from_array(tex_u8, srgb=False)
    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=re.shaders.textured_border_fragment)
    got_c, _ = run_render(pipe, mesh, uni, {"tex": tex})

    clip = mvp_clip(mesh, uni)
    idx = np.asarray(mesh.indices)
    depth, tri, bary, inv_w = gold.rasterize_reference(clip, idx, W, H)
    col = gold.interpolate(np.asarray(mesh.attributes["color"]), idx, tri,
                           bary, inv_w)
    uv = gold.interpolate(np.asarray(mesh.attributes["uv"]), idx, tri, bary,
                          inv_w)
    texel = gold.sample_bilinear(np.asarray(tex.data, np.float64), uv)
    lw = 0.05
    border = ((uv[..., 0] <= lw) | (uv[..., 0] > 1 - lw)
              | (uv[..., 1] <= lw) | (uv[..., 1] > 1 - lw))
    shaded = texel * np.concatenate([col, np.ones_like(col[..., :1])], -1)
    want = np.where(border[..., None], 1.0, shaded)
    m = tri >= 0
    want = np.where(m[..., None], want, [0, 0, 0, 1.0])
    assert_images_close(got_c, want)


def test_depth_test_closer_wins():
    # two fullscreen-ish quads at different depths, drawn far-last;
    # with LESS the near one must win
    pos = [[-1, -1, 0.2], [1, -1, 0.2], [1, 1, 0.2], [-1, 1, 0.2],
           [-1, -1, 0.8], [1, -1, 0.8], [1, 1, 0.8], [-1, 1, 0.8]]
    col = [[1, 0, 0]] * 4 + [[0, 1, 0]] * 4
    idx = [[0, 1, 2], [2, 3, 0], [4, 5, 6], [6, 7, 4]]
    mesh = re.mesh(pos, idx, color=col)
    pipe = GraphicsPipeline(vertex_fn=_ndc_vertex,
                            fragment_fn=flat_color_fragment)
    got_c, got_d = run_render(pipe, mesh, {})
    assert np.allclose(got_c[H // 2, W // 2, :3], [1, 0, 0], atol=1e-5)
    assert np.allclose(got_d[H // 2, W // 2], 0.2, atol=1e-5)


def test_no_depth_test_last_wins():
    pos = [[-1, -1, 0.2], [1, -1, 0.2], [1, 1, 0.2], [-1, 1, 0.2],
           [-1, -1, 0.8], [1, -1, 0.8], [1, 1, 0.8], [-1, 1, 0.8]]
    col = [[1, 0, 0]] * 4 + [[0, 1, 0]] * 4
    idx = [[0, 1, 2], [2, 3, 0], [4, 5, 6], [6, 7, 4]]
    mesh = re.mesh(pos, idx, color=col)
    pipe = GraphicsPipeline(
        vertex_fn=_ndc_vertex, fragment_fn=flat_color_fragment,
        state=RasterState(depth_test=False, depth_write=False))
    got_c, _ = run_render(pipe, mesh, {})
    # the far (green) quad is drawn last → wins without depth test
    assert np.allclose(got_c[H // 2, W // 2, :3], [0, 1, 0], atol=1e-5)


def test_depth_write_without_depth_test():
    # regression: with last-wins modes the kernel's depth buffer holds sort
    # keys; fb.depth must still receive the interpolated NDC depth
    pos = [[-1, -1, 0.5], [1, -1, 0.5], [1, 1, 0.5], [-1, 1, 0.5]]
    mesh = re.mesh(pos, [[0, 1, 2], [2, 3, 0]], color=[[1, 1, 1]] * 4)
    for state in (RasterState(depth_test=False, depth_write=True),
                  RasterState(depth_compare=re.CompareOp.ALWAYS,
                              depth_write=True)):
        pipe = GraphicsPipeline(vertex_fn=_ndc_vertex,
                                fragment_fn=flat_color_fragment,
                                state=state)
        _, got_d = run_render(pipe, mesh, {})
        assert np.allclose(got_d[H // 2, W // 2], 0.5, atol=1e-5), state


def test_backface_cull():
    # counter-clockwise (in y-down screen space) triangle is a back face
    pos = [[-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.5, 0.5]]
    cw = [[0, 1, 2]]    # top-left → top-right → bottom: clockwise y-down
    ccw = [[0, 2, 1]]
    col = [[1, 1, 1]] * 3
    pipe = GraphicsPipeline(vertex_fn=_ndc_vertex,
                            fragment_fn=flat_color_fragment)
    c1, _ = run_render(pipe, re.mesh(pos, cw, color=col), {})
    c2, _ = run_render(pipe, re.mesh(pos, ccw, color=col), {})
    assert c1[H // 2, W // 2, 0] == 1.0     # front face drawn
    assert c2[H // 2, W // 2, 0] == 0.0     # back face culled
    # cull NONE draws both
    pipe_nc = GraphicsPipeline(
        vertex_fn=_ndc_vertex, fragment_fn=flat_color_fragment,
        state=RasterState(cull_mode=CullMode.NONE))
    c3, _ = run_render(pipe_nc, re.mesh(pos, ccw, color=col), {})
    assert c3[H // 2, W // 2, 0] == 1.0


def test_behind_camera_culled():
    # triangle with a vertex at w<=0 must be culled whole (no clipping yet)
    uni = sample_uniforms()
    pos = [[0, 0, 0], [1, 0, 0], [0, 20, 0]]   # vertex far behind camera
    mesh = re.mesh(pos, [[0, 1, 2]], color=[[1, 1, 1]] * 3)
    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=flat_color_fragment)
    mesh = re.Mesh(positions=mesh.positions,
                   attributes={"color": mesh.attributes["color"],
                               "uv": jnp.zeros((3, 2))},
                   indices=mesh.indices)
    got_c, _ = run_render(pipe, mesh, uni)
    assert np.isfinite(got_c).all()


def _ndc_vertex(positions, attrs, uniforms):
    ones = jnp.ones((positions.shape[0], 1), jnp.float32)
    clip = jnp.concatenate([positions, ones], -1)
    return clip, dict(attrs)

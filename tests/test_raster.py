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


def test_depth_test_without_write_later_passing_wins():
    # Vulkan semantics for depth_test=on/depth_write=off: every fragment
    # tests against the UNCHANGED incoming buffer; among passing fragments
    # the last in draw order wins. Near (red) drawn first, far (green)
    # drawn second: both pass vs the cleared buffer, green must win.
    pos = [[-1, -1, 0.2], [1, -1, 0.2], [1, 1, 0.2], [-1, 1, 0.2],
           [-1, -1, 0.8], [1, -1, 0.8], [1, 1, 0.8], [-1, 1, 0.8]]
    col = [[1, 0, 0]] * 4 + [[0, 1, 0]] * 4
    idx = [[0, 1, 2], [2, 3, 0], [4, 5, 6], [6, 7, 4]]
    mesh = re.mesh(pos, idx, color=col)
    pipe = GraphicsPipeline(
        vertex_fn=_ndc_vertex, fragment_fn=flat_color_fragment,
        state=RasterState(depth_test=True, depth_write=False))
    fb = re.create_framebuffer(W, H)
    out = render_mesh(pipe, mesh, {}, {}, fb, interpret=True)
    got_c = np.asarray(out.color)[:H, :W]
    got_d = np.asarray(out.depth)[:H, :W]
    assert np.allclose(got_c[H // 2, W // 2, :3], [0, 1, 0], atol=1e-5)
    # write off: depth buffer unchanged (cleared value)
    assert np.allclose(got_d[H // 2, W // 2], np.asarray(fb.depth)[0, 0],
                       atol=0)
    # and fragments behind the incoming buffer still fail the test
    fb2 = re.create_framebuffer(W, H)
    fb2 = re.Framebuffer(color=fb2.color,
                         depth=jnp.full_like(fb2.depth, 0.5),
                         width=fb2.width, height=fb2.height)
    out2 = render_mesh(pipe, mesh, {}, {}, fb2, interpret=True)
    got2 = np.asarray(out2.color)[:H, :W]
    # far quad (0.8) fails vs 0.5; near quad (0.2) passes → red
    assert np.allclose(got2[H // 2, W // 2, :3], [1, 0, 0], atol=1e-5)


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
    # triangle straddling the camera plane: near-plane clipping must keep
    # the visible part finite and well-defined
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


def _clip_vertex(positions, attrs, uniforms):
    """Vertex fn whose inputs are already clip-space (x,y,z,w)."""
    return positions, {"color": attrs["color"]}


def _near_params(d, x_ndc, y_ndc, near=0.1, far=10.0):
    """Clip coords of a point at view depth d with desired NDC x,y."""
    a = far / (far - near)
    b = -far * near / (far - near)
    return [x_ndc * d, y_ndc * d, a * d + b, d]


def test_near_plane_clipping_matches_golden():
    # Triangles straddling the near plane (one vertex behind the camera,
    # one inside, etc.) vs an independent float64 Sutherland–Hodgman
    # clipper + reference rasterizer. Exercises both split cases
    # (1-inside and 2-inside) and attribute interpolation across the clip.
    pos = np.array([
        _near_params(2.0, -0.8, -0.8),     # inside
        _near_params(0.05, 3.0, 0.0),      # in front of near plane
        _near_params(2.0, -0.8, 0.8),      # inside (2-inside case, tri 0)
        _near_params(-0.5, 0.0, -6.0),     # behind the camera
        _near_params(1.0, 0.7, -0.6),      # inside (1-inside case, tri 1)
        _near_params(0.02, 0.5, 4.0),      # in front of near plane
    ], np.float32)
    col = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                    [1, 1, 0], [0, 1, 1], [1, 0, 1]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    mesh = re.Mesh(positions=jnp.asarray(pos),
                   attributes={"color": jnp.asarray(col)},
                   indices=jnp.asarray(idx))
    pipe = GraphicsPipeline(vertex_fn=_clip_vertex,
                            fragment_fn=flat_color_fragment,
                            state=RasterState(cull_mode=CullMode.NONE))
    got_c, got_d = run_render(pipe, mesh, {})

    cclip, cvals, cidx = gold.clip_triangles_near(pos, idx, col)
    assert len(cclip) >= 3          # both split cases produced geometry
    depth, tri, bary, inv_w = gold.rasterize_reference(
        cclip.reshape(-1, 4), cidx, W, H, cull="none")
    colr = gold.interpolate(cvals.reshape(-1, 3), cidx, tri, bary, inv_w)
    m = tri >= 0
    want = np.zeros((H, W, 4))
    want[..., :3] = np.where(m[..., None], colr, 0.0)
    want[..., 3] = 1.0
    assert m.any() and (~m).any()   # clipped geometry partially visible
    assert_images_close(got_c, want, max_bad_frac=0.01)
    # depth agrees where covered
    dd = np.abs(np.where(m, depth, 1.0) - got_d)
    assert np.quantile(dd, 0.99) < 1e-3


def _ndc_vertex(positions, attrs, uniforms):
    ones = jnp.ones((positions.shape[0], 1), jnp.float32)
    clip = jnp.concatenate([positions, ones], -1)
    return clip, dict(attrs)


def _grid_scene(g=12):
    """g x g quad grid (2*g*g triangles) with per-vertex color + uv."""
    from ray_eater_tpu.models.mesh import mesh as make_mesh
    rng = np.random.RandomState(9)
    xs, ys = np.meshgrid(np.linspace(-0.9, 0.9, g + 1),
                         np.linspace(-0.9, 0.9, g + 1))
    pos = np.stack([xs, ys, 0.1 * rng.rand(g + 1, g + 1)], -1
                   ).reshape(-1, 3)
    col = rng.rand((g + 1) * (g + 1), 3)
    uv = np.stack([xs, ys], -1).reshape(-1, 2) * 0.5 + 0.5
    quads = []
    for j in range(g):
        for i in range(g):
            a = j * (g + 1) + i
            quads += [[a, a + 1, a + g + 2], [a + g + 2, a + g + 1, a]]
    m = make_mesh(pos, quads, color=col, uv=uv)
    uni = sample_uniforms()
    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=flat_color_fragment)
    return m, uni, pipe


def test_large_scene_gather_fetch_matches_onehot():
    # >256 triangles routes attribute fetch through the flat-index row
    # gather instead of the one-hot matmul — both fetch paths must agree
    # (raster.py _shade; VERDICT round 1 item 7)
    from ray_eater_tpu.ops import raster as raster_ops
    m, uni, pipe = _grid_scene()
    assert m.num_triangles > raster_ops._ONEHOT_MAX_TRIS
    got_c, got_d = run_render(pipe, m, uni)            # gather path

    orig = raster_ops._ONEHOT_MAX_TRIS
    raster_ops._ONEHOT_MAX_TRIS = 10_000
    try:
        want_c, want_d = run_render(pipe, m, uni)      # one-hot path
    finally:
        raster_ops._ONEHOT_MAX_TRIS = orig
    np.testing.assert_allclose(got_c, want_c, atol=2e-5)
    m2 = np.isfinite(want_d)
    np.testing.assert_allclose(got_d[m2], want_d[m2], atol=1e-5)


def test_shade_fetch_kernel_matches_gather():
    # binned scenes fetch winner features via the payload-sorted pack +
    # per-step one-hot MXU kernel (_shade_fetch_kernel); it must agree
    # with the per-pixel row-gather path it replaces (raster.py _shade)
    from ray_eater_tpu.ops import raster as raster_ops
    m, uni, pipe = _grid_scene()
    assert 2 * m.num_triangles > raster_ops._BIN_MIN_TRIS
    assert raster_ops._SHADE_FETCH
    got_c, got_d = run_render(pipe, m, uni)            # kernel fetch

    raster_ops._SHADE_FETCH = False
    try:
        want_c, want_d = run_render(pipe, m, uni)      # row gather
    finally:
        raster_ops._SHADE_FETCH = True
    np.testing.assert_allclose(got_c, want_c, atol=2e-5)
    mk = np.isfinite(want_d)
    np.testing.assert_allclose(got_d[mk], want_d[mk], atol=1e-5)


def test_render_at_tile_divisible_height():
    # a framebuffer whose height is already a TILE_H multiple takes the
    # no-repad branch of _raster_call (regression: the dense path
    # returned a tuple there and `tuple + [None]` raised)
    from ray_eater_tpu.ops.raster import TILE_H, TILE_W
    mesh = re.two_planes()
    uni = sample_uniforms()
    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=flat_color_fragment)
    fb = re.create_framebuffer(TILE_W, 2 * TILE_H)
    out = render_mesh(pipe, mesh, uni, {}, fb, interpret=True)
    assert out.color.shape == (2 * TILE_H, TILE_W, 4)
    assert np.isfinite(np.asarray(out.color)).all()


def test_binned_raster_matches_dense():
    # >512 post-clip triangles route through GS-style tile binning; the
    # binned kernel must reproduce the dense fold exactly (same fold
    # order: pair keys carry the setup column in their low bits)
    from ray_eater_tpu.ops import raster as raster_ops
    m, uni, pipe = _grid_scene()
    assert 2 * m.num_triangles > raster_ops._BIN_MIN_TRIS
    got_c, got_d = run_render(pipe, m, uni)            # binned path

    orig = raster_ops._BIN_MIN_TRIS
    raster_ops._BIN_MIN_TRIS = 10 ** 9
    try:
        want_c, want_d = run_render(pipe, m, uni)      # dense path
    finally:
        raster_ops._BIN_MIN_TRIS = orig
    np.testing.assert_allclose(got_c, want_c, atol=2e-5)
    mk = np.isfinite(want_d)
    np.testing.assert_allclose(got_d[mk], want_d[mk], atol=1e-5)

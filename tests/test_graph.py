"""Render graph: validation, scheduling, and a fused multi-pass frame."""

import numpy as np
import jax.numpy as jnp
import pytest

import ray_eater_tpu as re
from ray_eater_tpu.graph.render_graph import (GraphValidationError,
                                              RenderGraph)
from ray_eater_tpu.ops.splat import splat_particles


def test_schedule_orders_by_dependency():
    g = RenderGraph().external("x")
    # declared out of order: consumer first
    g.add_pass("b", lambda i: {"z": i["y"] + 1}, reads=("y",), writes=("z",))
    g.add_pass("a", lambda i: {"y": i["x"] * 2}, reads=("x",), writes=("y",))
    prog = g.output("z").bake(jit=False)
    assert prog.pass_names == ["a", "b"]
    assert prog(x=jnp.float32(3.0))["z"] == 7.0


def test_waw_keeps_submission_order():
    g = RenderGraph().external("fb")
    g.add_pass("first", lambda i: {"fb": i["fb"] + 1}, reads=("fb",),
               writes=("fb",))
    g.add_pass("second", lambda i: {"fb": i["fb"] * 10}, reads=("fb",),
               writes=("fb",))
    out = g.output("fb").bake(jit=False)(fb=jnp.float32(1.0))
    assert out["fb"] == 20.0   # (1+1)*10, not 1*10+1


def test_cycle_rejected():
    g = RenderGraph()
    g.add_pass("a", lambda i: {"y": i["z"]}, reads=("z",), writes=("y",))
    g.add_pass("b", lambda i: {"z": i["y"]}, reads=("y",), writes=("z",))
    with pytest.raises(GraphValidationError, match="cycle"):
        g.bake()


def test_undefined_read_rejected():
    g = RenderGraph()
    g.add_pass("p", lambda i: {"y": i["ghost"]}, reads=("ghost",),
               writes=("y",))
    with pytest.raises(GraphValidationError, match="undefined resource"):
        g.bake()


def test_duplicate_pass_rejected():
    g = RenderGraph().external("x")
    g.add_pass("p", lambda i: {"y": 0}, reads=("x",), writes=("y",))
    with pytest.raises(GraphValidationError, match="duplicate"):
        g.add_pass("p", lambda i: {"z": 0}, reads=("x",), writes=("z",))


def test_bad_pass_output_detected():
    g = RenderGraph().external("x")
    g.add_pass("p", lambda i: {"wrong": 1}, reads=("x",), writes=("y",))
    prog = g.output("y").bake(jit=False)
    with pytest.raises(GraphValidationError, match="must return dict"):
        prog(x=1)


def test_missing_external_detected():
    g = RenderGraph().external("x")
    g.add_pass("p", lambda i: {"y": i["x"]}, reads=("x",), writes=("y",))
    prog = g.bake(jit=False)
    with pytest.raises(GraphValidationError, match="missing external"):
        prog()


def test_compute_then_draw_frame():
    """compute_drawing as a 2-pass graph: splat → quad sample (jitted)."""
    W, H = 256, 64
    pos = np.array([[40, 20], [200, 50]], np.float32)

    def compute_pass(i):
        img = jnp.zeros((H, W, 4), jnp.float32).at[..., 3].set(1.0)
        return {"render_target": splat_particles(
            img, i["particles"], (1.0, 1.0, 0.0), 8, interpret=True)}

    def draw_pass(i):
        tex = re.Texture(data=i["render_target"],
                         sampler=re.Sampler(
                             address_mode=re.AddressMode.CLAMP_TO_EDGE))
        pipe = re.GraphicsPipeline(
            vertex_fn=re.shaders.passthrough_vertex,
            fragment_fn=re.shaders.quad_sample_fragment,
            state=re.RasterState(depth_test=False, depth_write=False))
        fb = re.render_mesh(pipe, re.fullscreen_quad(), {},
                            {"compute_image": tex}, i["fb"], interpret=True)
        return {"fb": fb}

    g = (RenderGraph("compute_drawing")
         .external("particles", "fb")
         .add_pass("compute", compute_pass, reads=("particles",),
                   writes=("render_target",))
         .add_pass("quad", draw_pass, reads=("render_target", "fb"),
                   writes=("fb",))
         .output("fb"))
    prog = g.bake(jit=True)
    assert prog.pass_names == ["compute", "quad"]
    fb = prog(particles=jnp.asarray(pos),
              fb=re.create_framebuffer(W, H))["fb"]
    img = np.asarray(fb.color)[:H, :W]
    assert np.allclose(img[20, 40, :3], [1, 1, 0], atol=1e-2)   # splat
    assert np.allclose(img[5, 5, :3], [0, 0, 0], atol=1e-2)     # background


def test_donated_framebuffer():
    # donation: the previous frame's fb buffer is reused in place
    g = (RenderGraph("donate").external("fb", "u")
         .add_pass("p", lambda i: {"fb": i["fb"] * 0.5 + i["u"]},
                   reads=("fb", "u"), writes=("fb",))
         .output("fb"))
    prog = g.bake(donate=("fb",))
    assert prog.donated == ["fb"]
    fb = jnp.ones((64, 128), jnp.float32)
    out = prog(fb=fb, u=jnp.float32(1.0))["fb"]
    assert float(out[0, 0]) == 1.5
    # donated input is consumed — reuse must raise
    with pytest.raises(RuntimeError):
        _ = float(fb[0, 0]) + 0  # deleted buffer access
    # non-external donation rejected at bake
    g2 = (RenderGraph("bad").external("x")
          .add_pass("p", lambda i: {"y": i["x"]}, reads=("x",),
                    writes=("y",)))
    with pytest.raises(GraphValidationError, match="donate"):
        g2.bake(donate=("ghost",))


def test_baked_frame_serialization(tmp_path):
    # bake → serialize → reload without retracing (SURVEY §5.4 artifact)
    from ray_eater_tpu.graph.render_graph import load_baked
    g = (RenderGraph("ser").external("x")
         .add_pass("p", lambda i: {"y": i["x"] * 3.0}, reads=("x",),
                   writes=("y",))
         .output("y"))
    prog = g.bake()
    path = str(tmp_path / "frame.bin")
    prog.save_baked(path, x=jnp.zeros((8,), jnp.float32))
    loaded = load_baked(path)
    out = loaded(x=jnp.full((8,), 2.0, jnp.float32))
    assert float(out["y"][0]) == 6.0


def test_depth_prepass_plus_lit_pass():
    """BASELINE config 3 shape: depth prepass then color pass re-using the
    prepass depth (equal-depth fragments shade, occluded ones don't)."""
    W, H = 128, 32
    near = re.mesh([[-1, -1, 0.3], [1, -1, 0.3], [1, 1, 0.3], [-1, 1, 0.3]],
                   [[0, 1, 2], [2, 3, 0]], color=[[1, 0, 0]] * 4)
    far = re.mesh([[-1, -1, 0.7], [1, -1, 0.7], [1, 1, 0.7], [-1, 1, 0.7]],
                  [[0, 1, 2], [2, 3, 0]], color=[[0, 1, 0]] * 4)

    def ndc_vertex(p, a, u):
        ones = jnp.ones((p.shape[0], 1), jnp.float32)
        return jnp.concatenate([p, ones], -1), dict(a)

    def flat_frag(v, r):
        c = v["color"]
        return jnp.concatenate(
            [c, jnp.ones((*c.shape[:-1], 1), jnp.float32)], -1)

    depth_only = re.GraphicsPipeline(
        vertex_fn=ndc_vertex,
        fragment_fn=lambda v, r: jnp.zeros((*v["color"].shape[:-1], 4),
                                           jnp.float32))
    # lit pass after a prepass needs LESS_EQUAL: fragments arrive at
    # exactly the prepass depth
    lit = re.GraphicsPipeline(
        vertex_fn=ndc_vertex, fragment_fn=flat_frag,
        state=re.RasterState(depth_compare=re.CompareOp.LESS_EQUAL))

    def prepass(i):
        fb = i["fb"]
        # draw far then near: prepass depth must end at 0.3 in the overlap
        fb = re.render_mesh(depth_only, far, {}, {}, fb, interpret=True)
        fb = re.render_mesh(depth_only, near, {}, {}, fb, interpret=True)
        return {"fb": fb}

    def litpass(i):
        fb = i["fb"]
        fb = re.render_mesh(lit, far, {}, {}, fb, interpret=True)
        fb = re.render_mesh(lit, near, {}, {}, fb, interpret=True)
        return {"fb": fb}

    g = (RenderGraph("prepass_lit").external("fb")
         .add_pass("depth_prepass", prepass, reads=("fb",), writes=("fb",))
         .add_pass("lit", litpass, reads=("fb",), writes=("fb",))
         .output("fb"))
    fb = g.bake(jit=True)(fb=re.create_framebuffer(W, H))["fb"]
    img = np.asarray(fb.color)[:H, :W]
    depth = np.asarray(fb.depth)[:H, :W]
    assert np.allclose(img[H // 2, W // 2, :3], [1, 0, 0], atol=1e-5)
    assert np.allclose(depth[H // 2, W // 2], 0.3, atol=1e-5)

"""OBJ loader + render of a loaded mesh."""

import numpy as np
import jax.numpy as jnp

import ray_eater_tpu as re
from ray_eater_tpu.io.obj import load_obj

CUBE_OBJ = """# unit quad + tri, mixed face forms
v -1.0 -1.0 0.5
v  1.0 -1.0 0.5
v  1.0  1.0 0.5
v -1.0  1.0 0.5 1.0 0.0 0.0
vt 0.0 0.0
vt 1.0 0.0
vt 1.0 1.0
vt 0.0 1.0
f 1/1 2/2 3/3 4/4
f 1//  3// 2//
"""


def test_load_obj_quad(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(CUBE_OBJ)
    m = load_obj(str(p))
    # quad fan-triangulates to 2 tris + 1 explicit tri
    assert m.num_triangles == 3
    assert m.positions.shape == (9, 3)
    np.testing.assert_allclose(np.asarray(m.attributes["uv"][0]), [0, 0])
    np.testing.assert_allclose(np.asarray(m.attributes["uv"][2]), [1, 1])
    # vertex-color extension picked up on v4 (corner 3 of the fan)
    np.testing.assert_allclose(np.asarray(m.attributes["color"][5]),
                               [1, 0, 0])
    # faces without vt get zero uv
    np.testing.assert_allclose(np.asarray(m.attributes["uv"][6]), [0, 0])


def test_render_loaded_obj(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(CUBE_OBJ)
    m = load_obj(str(p))

    def ndc_vertex(pos, attrs, uni):
        ones = jnp.ones((pos.shape[0], 1), jnp.float32)
        return jnp.concatenate([pos, ones], -1), dict(attrs)

    def frag(v, r):
        c = v["color"]
        return jnp.concatenate(
            [c, jnp.ones((*c.shape[:-1], 1), jnp.float32)], -1)

    pipe = re.GraphicsPipeline(vertex_fn=ndc_vertex, fragment_fn=frag,
                               state=re.RasterState(
                                   cull_mode=re.CullMode.NONE))
    fb = re.render_mesh(pipe, m, {}, {}, re.create_framebuffer(128, 64),
                        interpret=True)
    img = np.asarray(fb.color)[:64, :128]
    assert img[32, 64, :3].sum() > 0   # quad covers the center

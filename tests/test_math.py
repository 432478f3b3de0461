"""rmath golden tests.

Fixture strategy (SURVEY.md §4): the reference's own math fixtures
(test/test_math.zig) were never wired into its build (build.zig:181-185 is a
stub), and its perspective/lookAt fixtures (test_math.zig:103-125) are stale
— they disagree with the implementation that actually renders
(math.zig:295-326). We therefore gate against *implementation-semantics*
goldens derived by hand/numpy here, and additionally verify the reference's
still-valid fixtures (multiplication, ordering, translation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_eater_tpu import rmath


def A(x):
    return np.asarray(x)


def test_mul_golden():
    # reference fixture (test_math.zig:32-57) — independently re-verified
    # with numpy below
    m1 = rmath.mat4([[1, 2, 3, 4], [3, 2, 1, 1], [1, 2, 3, 2], [2, 3, 7, 3]])
    m2 = rmath.mat4([[4, 5, 6, 7], [6, 5, 4, 3], [4, 6, 5, 9], [2, 8, 5, 3]])
    want = np.asarray(m1, np.float64) @ np.asarray(m2, np.float64)
    got = rmath.mul(m1, m2)
    np.testing.assert_allclose(A(got), want, rtol=1e-6)
    np.testing.assert_allclose(
        A(got),
        [[36, 65, 49, 52], [30, 39, 36, 39], [32, 49, 39, 46],
         [60, 91, 74, 95]], rtol=1e-6)


def test_column_major_order():
    # memory-order invariant (test_math.zig:59-78): columns contiguous
    m = rmath.mat4([[1, 2, 3, 4]] * 4)
    flat = A(rmath.to_column_major(m))
    np.testing.assert_array_equal(flat, [1] * 4 + [2] * 4 + [3] * 4 + [4] * 4)
    np.testing.assert_array_equal(A(rmath.from_column_major(flat)), A(m))


def test_translate_golden():
    # reference fixture (test_math.zig:80-90)
    got = rmath.translate(rmath.identity(), rmath.vec(10.0, 20.0, 30.0))
    want = [[1, 0, 0, 10], [0, 1, 0, 20], [0, 0, 1, 30], [0, 0, 0, 1]]
    np.testing.assert_allclose(A(got), want)


def test_translate_bottom_row_quirk():
    # translate reads the *bottom row* (math.zig:287-293) — verify the quirk
    # is reproduced exactly
    m = rmath.mat4([[1, 0, 0, 5], [0, 1, 0, 6], [0, 0, 1, 7], [2, 3, 4, 1]])
    got = A(rmath.translate(m, rmath.vec(10.0, 20.0, 30.0)))
    # result[r,3] = m[3,r] + by[r]  (NOT m[r,3] + by[r])
    np.testing.assert_allclose(got[:, 3], [12, 23, 34, 1])
    np.testing.assert_allclose(got[:, :3], A(m)[:, :3])


def test_rotate_z():
    r = float(rmath.radians(45.0))
    c = s = np.sqrt(2) / 2
    got = A(rmath.rotate_z(rmath.identity(), r))
    want = [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotate_x_reference_layout():
    # the reference's X-rotation block is [[c, s], [-s, c]] (math.zig:234-242)
    r = 0.7
    c, s = np.cos(r), np.sin(r)
    got = A(rmath.rotate_x(rmath.identity(), r))
    want = [[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotate_y():
    r = 0.3
    c, s = np.cos(r), np.sin(r)
    got = A(rmath.rotate_y(rmath.identity(), r))
    want = [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_rotate_is_post_multiply():
    m = rmath.mat4([[1, 2, 3, 4], [5, 6, 7, 8], [9, 1, 2, 3], [4, 5, 6, 7]])
    r = 0.5
    rz = rmath.rotate_z(rmath.identity(), r)
    np.testing.assert_allclose(A(rmath.rotate_z(m, r)), A(rmath.mul(m, rz)),
                               rtol=1e-5)


def test_perspective_impl_semantics():
    # perspective(radians(75), 600/900, 0.1, 30) per math.zig:316-326:
    # vp = 1/tan(37.5deg); as = vp/aspect; [2][2]=f/(f-n); [2][3]=-nf/(f-n);
    # [3][2]=+1.  (The reference's own stale fixture, test_math.zig:103-113,
    # has flipped signs and was never executed.)
    got = A(rmath.perspective(rmath.radians(75.0), 600 / 900, 0.1, 30.0))
    vp = 1.0 / np.tan(np.radians(75.0) / 2)
    want = np.zeros((4, 4))
    want[0, 0] = vp / (600 / 900)
    want[1, 1] = -vp
    want[2, 2] = 30.0 / 29.9
    want[2, 3] = -(0.1 * 30.0) / 29.9
    want[3, 2] = 1.0
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert abs(got[0, 0] - 1.95484) < 1e-4
    assert abs(got[1, 1] + 1.30323) < 1e-4


def test_look_at_impl_semantics():
    # look_at((2,2,2), 0, (0,-1,0)) per math.zig:295-314, derived by hand:
    # z = -(1,1,1)/sqrt3; x = norm(cross(z, up)) = (-r2, 0, r2);
    # y = cross(x, z) = (r6, -2 r6, r6)/... ; t = (0, 0, +2*sqrt3)
    got = A(rmath.look_at(rmath.vec(2., 2., 2.), rmath.vec(0., 0., 0.)))
    r2 = np.sqrt(2) / 2
    r3 = 1 / np.sqrt(3)
    r6 = 1 / np.sqrt(6)
    want = np.array([
        [-r2, 0, r2, 0],
        [r6, -2 * r6, r6, 0],
        [r3, r3, r3, 2 * np.sqrt(3)],
        [0, 0, 0, 1],
    ])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # invariant that makes rendering work: points in front of the camera
    # land at positive z_view (matching perspective's w=+z row)
    center_view = got @ np.array([0, 0, 0, 1.0])
    assert center_view[2] > 0
    np.testing.assert_allclose(center_view[2], 2 * np.sqrt(3), rtol=1e-6)


def test_vec_ops():
    a, b = rmath.vec(1., 2., 3.), rmath.vec(4., 5., 6.)
    np.testing.assert_allclose(A(rmath.cross(a, b)), [-3, 6, -3])
    np.testing.assert_allclose(float(rmath.dot(a, b)), 32)
    np.testing.assert_allclose(float(rmath.mag(rmath.vec(3., 4., 0.))), 5)
    np.testing.assert_allclose(A(rmath.norm(rmath.vec(0., 0., 2.))),
                               [0, 0, 1])
    np.testing.assert_allclose(float(rmath.radians(180.0)), np.pi, rtol=1e-6)


def test_transform_points_matches_matvec():
    m = A(rmath.perspective(1.0, 1.5, 0.1, 30.0), )
    pts = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    got = A(rmath.transform_points(m, pts))
    hom = np.concatenate([pts, np.ones((5, 1), np.float32)], -1)
    want = hom @ m.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_traceable_under_jit():
    @jax.jit
    def frame_uniforms(t):
        model = rmath.rotate_y(rmath.identity(), rmath.radians(45.0) * t)
        view = rmath.look_at(rmath.vec(2., 2., 2.), rmath.vec(0., 0., 0.))
        proj = rmath.perspective(rmath.radians(45.0), 1.5, 0.1, 30.0)
        return rmath.mul(rmath.mul(proj, view), model)

    m1 = frame_uniforms(jnp.float32(0.25))
    m2 = frame_uniforms(jnp.float32(0.50))
    assert m1.shape == (4, 4) and not np.allclose(A(m1), A(m2))

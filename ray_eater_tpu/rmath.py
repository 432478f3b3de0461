"""rmath — linear algebra with the reference engine's exact conventions.

This module reimplements the semantics of the reference math library
(``/root/reference/src/math.zig``) as pure JAX functions. Matrices here are
logical row-major ``(4, 4)`` arrays — ``M[r, c]`` is row ``r``, column ``c`` —
which multiply column vectors on the right (``clip = P @ V @ M @ [x,y,z,1]``,
matching shaders/shader.vert:16). The reference stores matrices column-major
in memory (math.zig:148-155); use :func:`to_column_major` when byte layout
matters (e.g. golden-file interchange).

Conventions preserved exactly (all cited against the reference):

* ``GLOBAL_UP = (0, -1, 0)`` — math.zig:8.
* ``rotate_x``: rotation block ``[[c, s], [-s, c]]`` in rows/cols 1..2 —
  the *transpose* of the textbook X rotation (math.zig:234-242). Kept as-is.
* ``rotate_y`` / ``rotate_z``: textbook layouts (math.zig:222-232, 245-251).
  All three are post-multiplies: ``rotate_*(M, r) == M @ R`` (math.zig:230).
* ``translate(M, by)``: writes ``result[r, 3] = M[3, r] + by[r]`` — note it
  *reads the bottom row*, not the translation column (math.zig:287-293 via
  setRegion math.zig:253-285). For matrices whose bottom row is (0,0,0,1)
  — every matrix the reference ever translates — this equals setting the
  translation column. The quirk is reproduced for bit-parity.
* ``look_at``: rows = right / up / -forward with translation
  ``(-x.eye, -y.eye, -z.eye)`` (math.zig:295-314). Combined with
  ``perspective``'s ``w = +z_view`` row this yields a view space where
  visible geometry has positive ``z_view``.
* ``perspective``: Vulkan-style — Y flipped (``-vp``), depth mapped to
  ``[0, 1]``, ``w_clip = +z_view`` (math.zig:316-326).

Note: the reference's *test fixtures* for perspective/lookAt
(test/test_math.zig:103-125) disagree with its implementation — its test
harness was never wired into the build (build.zig:181-185), so the stale
fixtures went unnoticed. The samples render with the implementation, so this
module matches the implementation; see tests/test_math.py for derivations.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

#: World up vector used by all reference samples (math.zig:8).
GLOBAL_UP = (0.0, -1.0, 0.0)


# ---------------------------------------------------------------------------
# Vector helpers (math.zig:92-136)
# ---------------------------------------------------------------------------

def vec(*vals) -> Array:
    """Build a float32 vector from scalars (math.zig:83-90)."""
    if len(vals) == 1 and not jnp.isscalar(vals[0]):
        vals = tuple(vals[0])
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])


def mag(v: Array) -> Array:
    """Euclidean length (math.zig:96-98)."""
    v = jnp.asarray(v, jnp.float32)
    return jnp.sqrt(jnp.sum(v * v))


def norm(v: Array) -> Array:
    """v / |v| (math.zig:92-94)."""
    v = jnp.asarray(v, jnp.float32)
    return v / mag(v)


def cross(a: Array, b: Array) -> Array:
    """3D cross product (math.zig:100-106)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def dot(a: Array, b: Array) -> Array:
    """3D dot product (math.zig:108-110)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.sum(a * b)


def smult(v: Array, s) -> Array:
    """Scalar multiply (math.zig:112-119)."""
    return jnp.asarray(v, jnp.float32) * jnp.float32(s)


def sdiv(v: Array, s) -> Array:
    """Scalar divide (math.zig:121-128)."""
    return jnp.asarray(v, jnp.float32) / jnp.float32(s)


def sub(a: Array, b: Array) -> Array:
    """Vector subtract (math.zig:130-132)."""
    return jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)


def radians(deg) -> Array:
    """Degrees → radians (math.zig:134-136)."""
    return jnp.asarray(deg, jnp.float32) * jnp.float32(jnp.pi / 180.0)


# ---------------------------------------------------------------------------
# Mat4 (math.zig:148-359). Logical row-major (4,4) float32 arrays.
# ---------------------------------------------------------------------------

def mat4(rows) -> Array:
    """Row-major constructor — reference ``Mat4.create`` (math.zig:179-190)."""
    return jnp.asarray(rows, jnp.float32).reshape(4, 4)


def mat4_cm(cols) -> Array:
    """Column-major constructor — ``Mat4.createCM`` (math.zig:192-194)."""
    return mat4(cols).T


def identity() -> Array:
    """4x4 identity (math.zig:196-203)."""
    return jnp.eye(4, dtype=jnp.float32)


def of(val) -> Array:
    """Constant-filled matrix (math.zig:205-220)."""
    return jnp.full((4, 4), val, jnp.float32)


def mul(a: Array, b: Array) -> Array:
    """Matrix product ``a @ b`` (math.zig:340-359)."""
    return jnp.matmul(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                      preferred_element_type=jnp.float32)


def transpose(m: Array) -> Array:
    """Transpose (math.zig:328-338)."""
    return jnp.asarray(m, jnp.float32).T


def _rot_z(c, s) -> Array:
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z, z]),
        jnp.stack([s, c, z, z]),
        jnp.stack([z, z, o, z]),
        jnp.stack([z, z, z, o]),
    ])


def rotate_z(m: Array, rads) -> Array:
    """Post-multiply by Z rotation (math.zig:222-232)."""
    r = jnp.asarray(rads, jnp.float32)
    return mul(m, _rot_z(jnp.cos(r), jnp.sin(r)))


def rotate_x(m: Array, rads) -> Array:
    """Post-multiply by the reference's X-rotation layout (math.zig:234-243).

    Note the block is ``[[c, s], [-s, c]]`` — transposed relative to the
    textbook form; preserved deliberately for bit-parity.
    """
    r = jnp.asarray(rads, jnp.float32)
    c, s = jnp.cos(r), jnp.sin(r)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([
        jnp.stack([o, z, z, z]),
        jnp.stack([z, c, s, z]),
        jnp.stack([z, -s, c, z]),
        jnp.stack([z, z, z, o]),
    ])
    return mul(m, rot)


def rotate_y(m: Array, rads) -> Array:
    """Post-multiply by Y rotation (math.zig:245-251)."""
    r = jnp.asarray(rads, jnp.float32)
    c, s = jnp.cos(r), jnp.sin(r)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack([
        jnp.stack([c, z, s, z]),
        jnp.stack([z, o, z, z]),
        jnp.stack([-s, z, c, z]),
        jnp.stack([z, z, z, o]),
    ])
    return mul(m, rot)


def translate(m: Array, by: Array) -> Array:
    """Reference ``Mat4.translate`` semantics (math.zig:287-293).

    Sets ``result[r, 3] = m[3, r] + by[r]`` for r in 0..2 — i.e. it reads the
    *bottom row* rather than the current translation column (a reference
    quirk, benign for bottom-row ``(0,0,0,1)`` matrices, reproduced exactly).
    """
    m = jnp.asarray(m, jnp.float32)
    by = jnp.asarray(by, jnp.float32)
    new_col = jnp.concatenate([m[3, :3] + by[:3], m[3:4, 3]])
    return m.at[:, 3].set(new_col)


def look_at(eye: Array, center: Array, world_up: Array = None) -> Array:
    """View matrix with the reference's exact convention (math.zig:295-314).

    Rows of the 3x3 block are (right, up, -forward); translation column is
    ``(-right.eye, -up.eye, -forward.eye)`` — note the last entry uses
    ``-forward.eye`` (not ``+``), so visible geometry lands at positive
    ``z_view``, matching :func:`perspective`'s ``w_clip = +z_view`` row.
    """
    if world_up is None:
        world_up = jnp.asarray(GLOBAL_UP, jnp.float32)
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    world_up = jnp.asarray(world_up, jnp.float32)

    z = norm(sub(center, eye))       # forward
    x = norm(cross(z, world_up))     # right
    y = norm(cross(x, z))            # up

    rot3 = jnp.stack([x, y, -z])                          # (3, 3)
    t = jnp.stack([-dot(x, eye), -dot(y, eye), -dot(z, eye)])  # (3,)
    top = jnp.concatenate([rot3, t[:, None]], axis=1)     # (3, 4)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def look_at_zforward(eye: Array, center: Array,
                     world_up: Array = None) -> Array:
    """*Correct* right-handed view matrix: rows (right, up, +forward) with
    translation ``-R @ eye`` — camera-forward maps to **+z_view = distance
    in front**, so with :func:`perspective` (``w_clip = +z_view``) depth
    increases with distance and LESS keeps the nearest fragment.

    Rationale: the reference's ``lookAt`` (reproduced bit-exactly as
    :func:`look_at`) is a *mirrored* transform — its depth row evaluates to
    ``const − distance``, so its renderer resolves overlaps far-over-near (a
    latent bug preserved there for image parity). New content — notably the
    3DGS pipeline, which needs true view depth for sorting and culling —
    should use this function.
    """
    if world_up is None:
        world_up = jnp.asarray(GLOBAL_UP, jnp.float32)
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    world_up = jnp.asarray(world_up, jnp.float32)

    z = norm(sub(center, eye))       # forward
    x = norm(cross(z, world_up))     # right
    y = norm(cross(x, z))            # up

    rot3 = jnp.stack([x, y, z])
    t = -rot3 @ eye
    top = jnp.concatenate([rot3, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def perspective(fov, aspect, near, far) -> Array:
    """Vulkan-style projection, exact reference layout (math.zig:316-326).

    ``vp = 1/tan(fov/2)``; Y negated; depth in [0,1]; ``w_clip = +z_view``.
    """
    fov = jnp.asarray(fov, jnp.float32)
    aspect = jnp.float32(aspect)
    near = jnp.float32(near)
    far = jnp.float32(far)
    vp = 1.0 / jnp.tan(fov / 2.0)
    as_ = vp / aspect
    z = jnp.zeros_like(vp)
    o = jnp.ones_like(vp)
    return jnp.stack([
        jnp.stack([as_, z, z, z]),
        jnp.stack([z, -vp, z, z]),
        jnp.stack([z, z, o * (far / (far - near)), o * (-(near * far) / (far - near))]),
        jnp.stack([z, z, o, z]),
    ])


def to_column_major(m: Array) -> Array:
    """Flatten to the reference's in-memory order (math.zig:148-155):
    16 floats, column-contiguous."""
    return jnp.asarray(m, jnp.float32).T.reshape(-1)


def from_column_major(flat: Array) -> Array:
    """Inverse of :func:`to_column_major`."""
    return jnp.asarray(flat, jnp.float32).reshape(4, 4).T


def transform_points(m: Array, pts: Array) -> Array:
    """Apply a 4x4 matrix to ``(N, 3)`` points → ``(N, 4)`` clip coords.

    The batched form of ``proj * view * model * vec4(p, 1)``
    (shaders/shader.vert:16) — one MXU matmul for the whole vertex buffer.
    """
    pts = jnp.asarray(pts, jnp.float32)
    ones = jnp.ones((*pts.shape[:-1], 1), jnp.float32)
    hom = jnp.concatenate([pts, ones], axis=-1)          # (N, 4)
    return jnp.matmul(hom, jnp.asarray(m, jnp.float32).T,
                      preferred_element_type=jnp.float32)

"""Splat compute kernel vs an independent numpy scatter reference."""

import numpy as np
import jax.numpy as jnp

from ray_eater_tpu.ops.splat import splat_mask, splat_particles


def reference_mask(positions, h, w, radius):
    """Direct numpy port of compute_slime.glsl:28-51 box semantics."""
    mask = np.zeros((h, w), np.float32)
    for x, y in positions:
        xi, yi = int(x), int(y)
        xb0, xb1 = max(0, xi - radius), min(w, xi + radius)
        yb0, yb1 = max(0, yi - radius), min(h, yi + radius)
        mask[yb0:yb1, xb0:xb1] = 1.0
    return mask


def test_splat_mask_matches_reference():
    rng = np.random.RandomState(3)
    h, w = 96, 200
    pos = np.stack([rng.rand(50) * w, rng.rand(50) * h], -1
                   ).astype(np.float32)
    got = np.asarray(splat_mask(jnp.asarray(pos), h, w, radius=7,
                                interpret=True))[:h, :w]
    want = reference_mask(pos, h, w, 7)
    np.testing.assert_array_equal(got, want)


def test_splat_clamps_at_borders():
    # particles at the corners: boxes must clamp, not wrap
    h, w = 64, 128
    pos = np.array([[0, 0], [w - 1, h - 1], [-5, -5], [w + 30, h + 30]],
                   np.float32)
    got = np.asarray(splat_mask(jnp.asarray(pos), h, w, radius=10,
                                interpret=True))[:h, :w]
    want = reference_mask(pos, h, w, 10)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 1.0 and got[h - 1, w - 1] == 1.0


def test_splat_particles_color_write():
    h, w = 32, 128
    img = jnp.zeros((h, w, 4), jnp.float32)
    pos = np.array([[64, 16]], np.float32)
    out = np.asarray(splat_particles(img, jnp.asarray(pos), (1.0, 1.0, 0.0),
                                     radius=4, interpret=True))
    np.testing.assert_allclose(out[16, 64], [1, 1, 0, 1])
    np.testing.assert_allclose(out[0, 0], [0, 0, 0, 0])
    # half-open box: [p-rad, p+rad)
    assert out[16, 64 - 4, 0] == 1.0 and out[16, 64 + 4, 0] == 0.0
    assert out[16 - 4, 64, 0] == 1.0 and out[16 + 4, 64, 0] == 0.0

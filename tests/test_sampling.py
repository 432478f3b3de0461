"""Texture sampling: packed quad-texel fast path ≡ 4-gather path ≡ numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

import ray_eater_tpu as re
from ray_eater_tpu.core.resources import (AddressMode, Filter, Sampler,
                                          Texture, texture_from_array)
from ray_eater_tpu.ops.sampling import sample
import golden_raster as gold


@pytest.mark.parametrize("mode", list(AddressMode))
def test_packed_matches_unpacked_and_numpy(mode):
    rng = np.random.RandomState(0)
    tex_u8 = (rng.rand(13, 37, 4) * 255).astype(np.uint8)
    sampler = Sampler(filter=Filter.LINEAR, address_mode=mode)
    packed = texture_from_array(tex_u8, sampler, srgb=False, pack=True)
    unpacked = texture_from_array(tex_u8, sampler, srgb=False, pack=False)
    assert packed.packed is not None and unpacked.packed is None

    uv = (rng.rand(50, 2) * 3 - 1).astype(np.float32)   # incl. out of range
    a = np.asarray(sample(packed, jnp.asarray(uv)))
    b = np.asarray(sample(unpacked, jnp.asarray(uv)))
    # continuous-space wrapping computes fx with different f32 rounding
    np.testing.assert_allclose(a, b, atol=1e-5)

    want = gold.sample_bilinear(np.asarray(unpacked.data, np.float64), uv,
                                mode=mode.value)
    np.testing.assert_allclose(a, want, atol=1e-5)


def test_nearest_has_no_packed_table():
    tex_u8 = np.zeros((8, 8, 4), np.uint8)
    t = texture_from_array(tex_u8, Sampler(filter=Filter.NEAREST),
                           srgb=False)
    assert t.packed is None


def test_packed_srgb_matches_unpacked():
    # sRGB textures store RGBA8 in the packed table and decode AFTER the
    # gather — must equal sampling the pre-decoded float data plane
    rng = np.random.RandomState(7)
    tex_u8 = (rng.rand(17, 23, 4) * 255).astype(np.uint8)
    sampler = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT)
    packed = texture_from_array(tex_u8, sampler, srgb=True, pack=True)
    unpacked = texture_from_array(tex_u8, sampler, srgb=True, pack=False)
    assert packed.packed is not None and packed.packed_srgb
    uv = (rng.rand(64, 2) * 3 - 1).astype(np.float32)
    a = np.asarray(sample(packed, jnp.asarray(uv)))
    b = np.asarray(sample(unpacked, jnp.asarray(uv)))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_mipmap_magnification_matches_base_level():
    # magnified sampling (uv derivatives << 1 texel/px) must stay on mip
    # level 0 == the non-mip packed path
    rng = np.random.RandomState(3)
    tex_u8 = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    tmip = texture_from_array(tex_u8, smip, srgb=False)
    tbase = texture_from_array(
        tex_u8, Sampler(filter=Filter.LINEAR,
                        address_mode=AddressMode.REPEAT), srgb=False)
    assert tmip.mip_table is not None and len(tmip.mip_dims) == 6
    ys, xs = np.mgrid[0:64, 0:64]
    uv = np.stack([xs, ys], -1).astype(np.float32) / 256.0  # 4x magnified
    a = np.asarray(sample(tmip, jnp.asarray(uv)))
    b = np.asarray(sample(tbase, jnp.asarray(uv)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mipmap_minification_averages():
    # heavy minification must read coarse levels: a checkerboard sampled
    # at ~16 texels/pixel converges to its mean instead of aliasing
    y, x = np.mgrid[0:64, 0:64]
    checker = ((x // 4 + y // 4) % 2).astype(np.uint8) * 255
    tex_u8 = np.stack([checker] * 3 + [np.full_like(checker, 255)], -1)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    tmip = texture_from_array(tex_u8, smip, srgb=False)
    ys, xs = np.mgrid[0:16, 0:16]
    # 64 texels per pixel; the 0.013 offset keeps base-level samples off
    # texel midpoints (where bilinear would average to 0.5 by accident)
    uv = np.stack([xs, ys], -1).astype(np.float32) + 0.013
    got = np.asarray(sample(tmip, jnp.asarray(uv)))[..., 0]
    assert np.abs(got - 0.5).max() < 0.05, "coarse level should average"
    # and the single-level path aliases (sanity that the test means something)
    tbase = texture_from_array(
        tex_u8, Sampler(filter=Filter.LINEAR,
                        address_mode=AddressMode.REPEAT), srgb=False)
    base = np.asarray(sample(tbase, jnp.asarray(uv)))[..., 0]
    assert np.abs(base - 0.5).max() > 0.4

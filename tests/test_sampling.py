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


def _uv_perspective(H=64, W=96):
    """Image-shaped uv with a magnified near edge and minified far edge —
    exercises several mip levels in one plane."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = 0.25 + 2.5 * (ys / H)              # fake perspective rows
    u = (xs / W - 0.5) * depth + 0.5
    v = (ys / H - 0.5) * depth + 0.5
    return np.stack([u, v], -1).astype(np.float32)


@pytest.mark.parametrize("mode", list(AddressMode))
def test_subtile_sampler_tracks_gather_mip_path(mode):
    # the zero-gather subtile window sampler (sampling._sample_subtile)
    # quantizes LOD per 16x16 subtile instead of per pixel — it must stay
    # CLOSE to the per-pixel gather path everywhere (same u8 mip texels,
    # same filter math), not bit-equal
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(5)
    tex_u8 = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=mode, mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    assert t.win_table is not None and len(t.win_dims) == len(t.mip_dims)
    uv = jnp.asarray(_uv_perspective())
    got = np.asarray(sp._sample_subtile(t, uv))
    want = np.asarray(sp._sample_mip(t, uv))
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # white noise is the worst case: the only divergence is the narrow
    # lod band where a 16-px subtile's level-0 footprint exceeds one
    # 32-texel window (the sampler clamps one level coarser there; it is
    # EXACT everywhere else — measured zero error on 3 of 4 subtile rows)
    assert psnr > 26.0, f"subtile sampler diverges: {psnr:.1f} dB"


def test_subtile_sampler_close_on_smooth_texture():
    # natural (smooth) content: the fit-band coarse-clamp is ~invisible
    import ray_eater_tpu.ops.sampling as sp
    yy, xx = np.mgrid[0:64, 0:64]
    tex_u8 = np.stack(
        [(np.sin(xx / 6) * 0.5 + 0.5) * 255,
         (np.cos(yy / 9) * 0.5 + 0.5) * 255,
         ((xx + yy) / 126) * 255,
         np.full_like(xx, 255)], -1).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    uv = jnp.asarray(_uv_perspective())
    got = np.asarray(sp._sample_subtile(t, uv))
    want = np.asarray(sp._sample_mip(t, uv))
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 38.0, f"subtile sampler diverges: {psnr:.1f} dB"


@pytest.mark.parametrize("mode", [AddressMode.CLAMP_TO_EDGE,
                                  AddressMode.MIRRORED_REPEAT])
def test_subtile_sampler_non_pow2_clamped_modes(mode):
    # clamp-extended windows work at ANY texture size (ceil window grid;
    # the real asset this matters for is the 1600x948 reference texture);
    # REPEAT stays gather-only for non-pow2 (wrap period mismatch)
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(11)
    tex_u8 = (rng.rand(52, 44, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=mode, mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    assert t.win_table is not None
    trep = texture_from_array(
        tex_u8, Sampler(filter=Filter.LINEAR,
                        address_mode=AddressMode.REPEAT, mipmap=True),
        srgb=False)
    assert trep.win_table is None
    uv = jnp.asarray(_uv_perspective())
    got = np.asarray(sp._sample_subtile(t, uv))
    want = np.asarray(sp._sample_mip(t, uv))
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 26.0, f"subtile sampler diverges: {psnr:.1f} dB"


def test_subtile_sampler_exact_at_magnification():
    # under pure magnification every subtile sits at level 0 with zero
    # trilinear fraction in BOTH paths -> identical samples
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(6)
    tex_u8 = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    ys, xs = np.mgrid[0:48, 0:80]
    uv = np.stack([xs, ys], -1).astype(np.float32) / 256.0 - 0.07
    got = np.asarray(sp._sample_subtile(t, jnp.asarray(uv)))
    want = np.asarray(sp._sample_mip(t, jnp.asarray(uv)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_subtile_sampler_coverage_mask_fixes_silhouettes():
    # deferred G-buffers carry garbage uv on uncovered pixels (they hold
    # triangle 0's plane, discontinuous at the silhouette). Unmasked, a
    # silhouette crossing a 16x16 subtile blows up its footprint and the
    # whole subtile falls to a coarse mip — the dominant term of the
    # exp_raster4 C-vs-D 39.9 dB delta. With valid=coverage the covered
    # pixels must track the per-pixel gather path closely.
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(9)
    tex_u8 = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    uv = _uv_perspective().copy()
    H, W = uv.shape[:2]
    ys, xs = np.mgrid[0:H, 0:W]
    # diagonal silhouette: covered below the line; background uv is a
    # wildly different plane (another triangle's extension)
    cov = (ys.astype(np.float32) * 0.7 + 11.0) > xs
    uv[~cov] = uv[~cov] * 37.0 + 5.3
    uv = jnp.asarray(uv)
    want = np.asarray(sp._sample_mip(t, uv))
    got_m = np.asarray(sp._sample_subtile(t, uv, valid=jnp.asarray(cov)))
    got_u = np.asarray(sp._sample_subtile(t, uv))

    def psnr_cov(a):
        mse = float(np.mean((a[cov] - want[cov]) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    pm, pu = psnr_cov(got_m), psnr_cov(got_u)
    assert pm > 26.0, f"masked subtile diverges on covered px: {pm:.1f} dB"
    assert pm > pu + 6.0, (
        f"mask should clearly beat unmasked at silhouettes: {pm:.1f} vs "
        f"{pu:.1f} dB")


def test_subtile_sampler_mask_noop_when_fully_covered():
    # a full-coverage mask must not change the output at all
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(10)
    tex_u8 = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
    smip = Sampler(filter=Filter.LINEAR, address_mode=AddressMode.REPEAT,
                   mipmap=True)
    t = texture_from_array(tex_u8, smip, srgb=False)
    uv = jnp.asarray(_uv_perspective())
    a = np.asarray(sp._sample_subtile(t, uv))
    b = np.asarray(sp._sample_subtile(
        t, uv, valid=jnp.ones(uv.shape[:2], bool)))
    np.testing.assert_allclose(a, b, atol=3e-6)


def test_subtile_binding_fallback_closes_lod_gap():
    # BINDING subtiles (window footprint-fit cap forces a coarser level
    # than the per-pixel LOD wants) re-sample through the gather path
    # under the subtile_fallback budget — with a generous budget the
    # subtile sampler must converge to the per-pixel gather path far
    # beyond what the capped path reaches
    import dataclasses

    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(5)
    tex_u8 = (rng.rand(64, 64, 4) * 255).astype(np.uint8)

    def run(fb):
        smip = Sampler(filter=Filter.LINEAR,
                       address_mode=AddressMode.REPEAT, mipmap=True,
                       subtile_fallback=fb)
        t = texture_from_array(tex_u8, smip, srgb=False)
        uv = jnp.asarray(_uv_perspective())
        got = np.asarray(sp._sample_subtile(t, uv))
        want = np.asarray(sp._sample_mip(t, uv))
        mse = float(np.mean((got - want) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    p_off = run(0.0)
    p_full = run(1.0)
    assert p_full > p_off + 10.0, (p_off, p_full)
    # with the whole frame budgeted the two paths agree to float noise
    # (identical taps on identical u8 mip texels)
    assert p_full > 60.0, p_full
    # the default 1/8 budget already covers this scene's binding set
    p_def = run(0.125)
    assert p_def > p_off + 10.0, (p_off, p_def)


def test_subtile_fallback_budget_overflow_degrades_gracefully():
    # a tiny budget must never be WORSE than fallback-off (overflowing
    # subtiles keep their kernel rows; the budget takes worst-first)
    import ray_eater_tpu.ops.sampling as sp
    rng = np.random.RandomState(7)
    tex_u8 = (rng.rand(64, 64, 4) * 255).astype(np.uint8)
    uv = jnp.asarray(_uv_perspective())

    def run(fb):
        smip = Sampler(filter=Filter.LINEAR,
                       address_mode=AddressMode.REPEAT, mipmap=True,
                       subtile_fallback=fb)
        t = texture_from_array(tex_u8, smip, srgb=False)
        got = np.asarray(sp._sample_subtile(t, uv))
        want = np.asarray(sp._sample_mip(t, uv))
        mse = float(np.mean((got - want) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    assert run(0.01) >= run(0.0) - 0.1

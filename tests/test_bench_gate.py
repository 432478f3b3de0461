"""bench.py PSNR-gate knob plumbing (VERDICT round-4 weak item 5).

The gate's exact reference must share EVERY knob with the measured
config except the LOD knobs — a knob present on the measured side but
missing from the reference silently weakens the gate (the
corner-channel lesson, BENCHLOG 2026-08-17). Both sides now derive from
one resolve_knobs/render_kwargs pair; these tests pin the split.
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SCENES = ("fog", "shell", "inria", "trained")


def test_gate_reference_differs_only_in_lod_knobs():
    for scene in SCENES:
        knobs = bench.resolve_knobs(scene, 1_000_000, env={})
        m = bench.render_kwargs(knobs, exact=False, interpret=True)
        e = bench.render_kwargs(knobs, exact=True, interpret=True)
        # keys: exact == measured minus exactly the LOD-only knobs
        assert set(m) - set(e) == set(bench.LOD_ONLY_KNOBS), scene
        assert set(e) <= set(m), scene
        for k in e:
            if k == "pairs_cap_factor":
                # the reference always uses exact worst-case buffers
                assert e[k] is None, scene
            else:
                assert e[k] == m[k], (scene, k)


def test_render_kwargs_are_valid_render_gaussians_params():
    from ray_eater_tpu.ops.gs import render_gaussians
    params = set(inspect.signature(render_gaussians).parameters)
    for scene in SCENES:
        knobs = bench.resolve_knobs(scene, 1_000_000, env={})
        for exact in (False, True):
            kw = bench.render_kwargs(knobs, exact, interpret=True)
            unknown = set(kw) - params
            assert not unknown, (scene, exact, unknown)


def test_env_overrides_flow_through():
    n = 1_000_000
    k = bench.resolve_knobs("fog", n, env={"RAYEATER_BENCH_MPT": "0"})
    assert k["max_splats_per_tile"] is None
    k = bench.resolve_knobs("fog", n, env={"RAYEATER_BENCH_CERTIFIED": "1"})
    assert k["certified"] and k["max_splats_per_tile"] == 384
    k = bench.resolve_knobs("inria", n, env={})
    assert k["tile_w"] == 64 and k["corner_cap"] == n // 8
    assert not k["temporal"]
    k = bench.resolve_knobs("fog", n, env={})
    assert k["tile_w"] == 32 and k["temporal"]


def test_per_scene_defaults_carry_budget_channels_to_both_sides():
    # the whole-splat budget channels must be IDENTICAL on both sides of
    # the PSNR diff (their overflow is alarmed, not gated)
    knobs = bench.resolve_knobs("inria", 1_000_000, env={})
    m = bench.render_kwargs(knobs, exact=False, interpret=True)
    e = bench.render_kwargs(knobs, exact=True, interpret=True)
    for key in ("big_splat_cap", "mid_splat_cap", "mid_lo_splat_cap",
                "corner_cap", "tile_w", "payload_sort"):
        assert m[key] == e[key]
        assert m[key] is not None

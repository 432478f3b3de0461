"""Profiler, validation mode, and misc utils."""

import numpy as np
import jax.numpy as jnp
import pytest

import ray_eater_tpu as re
from ray_eater_tpu.utils.profiler import FrameStats, StageTimer, annotate
from ray_eater_tpu.utils.validation import (ValidationError, check_finite,
                                            check_framebuffer, checked_pass)


def test_frame_stats():
    fs = FrameStats()
    for _ in range(5):
        fs.tick()
    s = fs.summary()
    assert s["frames"] == 5 and s["fps"] > 0


def test_stage_timer_report():
    st = StageTimer()
    with st.stage("a") as out:
        out.append(jnp.ones((8, 8)) * 2)
    with st.stage("b"):
        pass
    rep = st.report()
    assert "a" in rep and "b" in rep and "ms/call" in rep


def test_annotate_span_runs():
    with annotate("test_pass"):
        x = jnp.ones((4,)) + 1
    assert float(x[0]) == 2.0


def test_check_finite_raises_on_nan():
    check_finite("ok", jnp.ones((3,)))
    with pytest.raises(ValidationError, match="NaN"):
        check_finite("bad", jnp.array([1.0, jnp.nan]))


def test_check_framebuffer():
    fb = re.create_framebuffer(64, 32)
    check_framebuffer(fb, width=64, height=32)
    with pytest.raises(ValidationError, match="width"):
        check_framebuffer(fb, width=128)
    bad = re.Framebuffer(color=fb.color, depth=fb.depth[:-1],
                         width=64, height=32)
    with pytest.raises(ValidationError, match="mismatch"):
        check_framebuffer(bad)


def test_checked_pass_wraps():
    good = checked_pass("p", lambda i: {"y": i["x"] + 1})
    assert float(good({"x": jnp.float32(1.0)})["y"]) == 2.0
    bad = checked_pass("p", lambda i: {"y": i["x"] * jnp.nan})
    with pytest.raises(ValidationError):
        bad({"x": jnp.float32(1.0)})

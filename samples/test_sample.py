"""test_sample — hello-world smoke sample (samples/test_sample.zig:4-6).

Boots a Context, reports the device, renders one cleared frame, exits 0.
The minimal "does the engine come up" check.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import ray_eater_tpu as re


def main():
    ctx = re.Context()
    fb = re.create_framebuffer(64, 64, clear_color=(0.2, 0.4, 0.6, 1.0))
    ctx.wait_idle(fb.color)
    px = np.asarray(fb.color)[0, 0]
    assert np.allclose(px, [0.2, 0.4, 0.6, 1.0], atol=1e-6), px
    print(f"Hello from ray_eater_tpu on {ctx.device} "
          f"(platform={ctx.device.platform}, interpret={ctx.interpret})")


if __name__ == "__main__":
    main()

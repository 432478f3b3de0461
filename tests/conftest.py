"""Test harness: force the CPU backend with an 8-device virtual mesh.

Must run before jax initializes. Real-TPU behavior is exercised by bench.py
and the driver's dryrun; tests validate semantics (Pallas kernels run in
interpreter mode on CPU — Context auto-selects that, context.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

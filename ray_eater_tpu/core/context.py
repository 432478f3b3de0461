"""Context — the application's one handle to the engine.

TPU-native replacement for the reference's ``Context`` (context.zig:101-219),
which owned VkInstance + VkDevice + VkSurface + three queues. Here there is
no loader/dispatch machinery: ``jax.devices()`` replaces device enumeration
(base.zig:446-472), command-buffer submission becomes calling a jit-compiled
pass program (command_buffer.zig + queue.zig:41 → XLA dispatch), and the
comptime DI env (env.zig) collapses into plain attributes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from ..utils.logging import scoped

_log_device = scoped("device")
_log_instance = scoped("instance")


@dataclasses.dataclass
class ContextConfig:
    """Engine-level knobs (analog of Context.Config, context.zig:92-97)."""

    #: Preferred jax platform ("tpu", "cpu", ...); None = first available.
    platform: str | None = None
    #: Validate render graphs at bake time (the validation-layer analog,
    #: context.zig:145-147 — done statically here instead of at runtime).
    validation: bool = True
    #: Run Pallas kernels in interpreter mode (needed on CPU backends).
    interpret: bool | None = None
    #: Persistent XLA compilation cache directory (SURVEY.md §5.4: the
    #: checkpoint/resume analog — frame programs compile in minutes at 1M
    #: splats; the cache makes subsequent launches instant). None disables;
    #: default from $RAYEATER_COMPILE_CACHE or ~/.cache/rayeater_xla.
    compile_cache_dir: str | None = "auto"


class Context:
    """Device handle + renderer config + compilation cache.

    The reference picks the first discrete GPU (base.zig:446-472); we pick
    the first device of the preferred platform. ``submit`` is the analog of
    ``Context.submitCommands`` (context.zig:192-210): it executes a compiled
    pass program — ordering between programs is carried by data dependencies,
    so the reference's queue routing (and its .Compute→present bug,
    context.zig:200) has no equivalent here.
    """

    def __init__(self, config: ContextConfig | None = None):
        # copy: resolution of interpret/cache below must not leak into the
        # caller's config object (it may be reused for another Context)
        self.config = dataclasses.replace(config) if config else ContextConfig()
        devices = (jax.devices(self.config.platform)
                   if self.config.platform else jax.devices())
        if not devices:
            raise RuntimeError("no jax devices available")
        self.device = devices[0]
        self.devices = devices
        _log_device.info("selected device: %s (of %d)", self.device,
                         len(devices))
        # Pallas interpret mode: required when not running on a real TPU.
        if self.config.interpret is None:
            self.config.interpret = self.device.platform != "tpu"
        # persistent compilation cache (huge frame programs; see config)
        cache = self.config.compile_cache_dir
        if cache == "auto":
            import os
            cache = os.environ.get(
                "RAYEATER_COMPILE_CACHE",
                os.path.expanduser("~/.cache/rayeater_xla"))
        if cache:
            try:
                import os
                os.makedirs(cache, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 5.0)
                _log_instance.info("compilation cache: %s", cache)
            except Exception as e:   # cache is an optimization, never fatal
                _log_instance.warning("compilation cache disabled: %s", e)
        #: jit cache: name -> compiled callable (the XLA-compilation-cache
        #: analog of SURVEY.md §5.4's suggested bake cache).
        self._programs: dict[Any, Callable] = {}

    @property
    def interpret(self) -> bool:
        return bool(self.config.interpret)

    def compile(self, key: Any, build: Callable[[], Callable]) -> Callable:
        """Memoize a jitted pass program under ``key``."""
        prog = self._programs.get(key)
        if prog is None:
            prog = build()
            self._programs[key] = prog
        return prog

    def submit(self, program: Callable, *args, retries: int = 1, **kwargs):
        """Execute a pass program (context.zig:192 analog). Async by nature:
        XLA dispatch returns immediately; call ``block_until_ready`` on the
        result for a fence (sync.zig:24-54 analog).

        Transient device/transport failures (the device-lost case the
        reference never handled, SURVEY.md §5.3) are retried once with a
        log line; persistent failures propagate."""
        import jax.errors
        for attempt in range(retries + 1):
            try:
                return program(*args, **kwargs)
            except (jax.errors.JaxRuntimeError, OSError) as e:
                if attempt >= retries:
                    raise
                _log_device.warning(
                    "submit failed (%s: %s) — retrying (%d/%d)",
                    type(e).__name__, str(e)[:200], attempt + 1, retries)

    def wait_idle(self, *arrays) -> None:
        """DeviceHandler.waitIdle analog (base.zig:644)."""
        for a in arrays:
            jax.block_until_ready(a)

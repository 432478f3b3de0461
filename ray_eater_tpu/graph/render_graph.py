"""Render graph — declarative pass DAG baked into one fused XLA program.

The reference left this as a design-comment stub (src/graph/render_graph.zig:
6-36): a declarative DAG of passes whose edges are resource + sync
dependencies, "baked" in a backend-independent resolution phase. This module
builds it for real, and the TPU execution model makes it *stronger* than the
command-buffer version the stub envisioned: after validation and toposort,
the whole frame is traced into a single jitted XLA program, so inter-pass
synchronization (the reference's semaphores/barriers/subpass dependencies,
sync.zig, renderpass.zig:79-97) vanishes into data dependencies and XLA
fuses across pass boundaries.

Model:
* a **resource** is a named slot holding any array/pytree (framebuffers,
  textures, particle buffers — the stub's "resources keyed by hashed string
  IDs", render_graph.zig:10-17);
* a **pass** is a pure function ``fn(inputs: dict) -> outputs: dict``
  declaring which slots it reads and writes (pass kinds — render vs compute,
  render_graph.zig:19-24 — need no distinction here: both are jittable fns);
* ``bake()`` validates (acyclicity per render_graph.zig:13, no undefined
  reads, no write conflicts — the static analog of the Vulkan validation
  layer, SURVEY.md §5.2) and returns a compiled :class:`FrameProgram`.

Hazard ordering: within the declared DAG, read-after-write follows edges;
write-after-write / write-after-read on the same slot are ordered by pass
insertion order (the "submission order" analog).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax

from ..utils.logging import scoped

_log = scoped("graph")


class GraphValidationError(RuntimeError):
    """Raised at bake time for malformed graphs (the validation-layer
    analog: fail at bake, not mid-frame)."""


@dataclasses.dataclass(frozen=True)
class Pass:
    name: str
    fn: Callable[[dict], dict]
    reads: tuple[str, ...]
    writes: tuple[str, ...]


class RenderGraph:
    """Builder: declare resources + passes, then :meth:`bake`."""

    def __init__(self, name: str = "frame"):
        self.name = name
        self._passes: list[Pass] = []
        self._external: set[str] = set()
        self._outputs: list[str] = []

    def external(self, *names: str) -> "RenderGraph":
        """Declare slots provided by the caller each frame (framebuffers,
        uniforms, scene data)."""
        self._external.update(names)
        return self

    def add_pass(self, name: str, fn: Callable, reads: Sequence[str] = (),
                 writes: Sequence[str] = ()) -> "RenderGraph":
        if any(p.name == name for p in self._passes):
            raise GraphValidationError(f"duplicate pass name: {name!r}")
        if not writes:
            raise GraphValidationError(f"pass {name!r} writes nothing")
        self._passes.append(Pass(name, fn, tuple(reads), tuple(writes)))
        return self

    def output(self, *names: str) -> "RenderGraph":
        """Declare which slots the frame program returns."""
        self._outputs.extend(names)
        return self

    # -- resolution phase ---------------------------------------------------

    def _schedule(self) -> list[Pass]:
        """Validate + toposort (stable w.r.t. insertion order)."""
        passes = self._passes
        if not passes:
            raise GraphValidationError("graph has no passes")

        # undefined reads: every read must be external or written by someone
        written = {w for p in passes for w in p.writes}
        for p in passes:
            for r in p.reads:
                if r not in written and r not in self._external:
                    raise GraphValidationError(
                        f"pass {p.name!r} reads undefined resource {r!r} "
                        f"(declare it external() or write it in a pass)")
        for o in self._outputs:
            if o not in written and o not in self._external:
                raise GraphValidationError(f"output {o!r} never produced")

        # build edges with resource versioning. Declaration order acts as
        # submission order for multi-writer resources: a reader binds to the
        # latest *earlier* writer (or the external initial value); WAW/WAR
        # hazards are ordered by insertion. A read declared before any write
        # of a non-external, single-writer resource binds *forward* to that
        # writer, so pure producer/consumer chains may be declared in any
        # order; with multiple writers that binding would be ambiguous and
        # is rejected.
        n = len(passes)
        writers: dict[str, list[int]] = {}
        for i, p in enumerate(passes):
            for w in p.writes:
                writers.setdefault(w, []).append(i)

        edges: set[tuple[int, int]] = set()
        last_writer: dict[str, int] = {}
        readers_since_write: dict[str, list[int]] = {}
        for i, p in enumerate(passes):
            for r in p.reads:
                if r in last_writer:
                    edges.add((last_writer[r], i))
                elif r in self._external:
                    pass                    # initial value from the caller
                elif len(writers.get(r, ())) == 1:
                    # forward binding: reads the (single) writer's output
                    # version — no WAR hazard possible, skip the tracking
                    edges.add((writers[r][0], i))
                    continue
                else:
                    raise GraphValidationError(
                        f"pass {p.name!r} reads {r!r} before any of its "
                        f"{len(writers[r])} writers — declaration order is "
                        f"ambiguous; declare a writer first")
                readers_since_write.setdefault(r, []).append(i)
            for w in p.writes:
                if w in last_writer:
                    edges.add((last_writer[w], i))          # WAW
                for j in readers_since_write.get(w, ()):
                    if j != i:
                        edges.add((j, i))                   # WAR
                last_writer[w] = i
                readers_since_write[w] = []

        # toposort (Kahn, insertion-order tiebreak); forward binding can
        # create genuine cycles — the stub's acyclicity requirement
        # (render_graph.zig:13) is enforced here.
        indeg = [0] * n
        adj: dict[int, list[int]] = {i: [] for i in range(n)}
        for a, b in edges:
            adj[a].append(b)
            indeg[b] += 1
        order, ready = [], [i for i in range(n) if indeg[i] == 0]
        while ready:
            i = min(ready)   # stable
            ready.remove(i)
            order.append(i)
            for j in adj[i]:
                indeg[j] -= 1
                if indeg[j] == 0:
                    ready.append(j)
        if len(order) != n:
            cyc = [passes[i].name for i in range(n) if i not in order]
            raise GraphValidationError(f"pass DAG has a cycle among {cyc}")
        return [passes[i] for i in order]

    def bake(self, jit: bool = True, donate: Sequence[str] = ()) -> "FrameProgram":
        """Resolution phase: validate, schedule, and compile the frame.

        ``donate``: external slot names whose device buffers XLA may reuse
        in place (the framebuffer-ring pattern — donate the previous
        frame's fb; the caller must not touch those arrays afterwards).
        """
        schedule = self._schedule()
        outputs = list(self._outputs) or sorted(
            {w for p in schedule for w in p.writes})
        externals = sorted(self._external)
        donate_set = set(donate)
        unknown = donate_set - set(externals)
        if unknown:
            raise GraphValidationError(f"donate of non-external {unknown}")
        _log.info("graph %s baked: %s -> %s", self.name,
                  [p.name for p in schedule], outputs)

        def run(donated: dict, kept: dict) -> dict:
            env = {**donated, **kept}
            for p in schedule:
                ins = {r: env[r] for r in p.reads}
                outs = p.fn(ins)
                if not isinstance(outs, dict) or set(outs) != set(p.writes):
                    raise GraphValidationError(
                        f"pass {p.name!r} must return dict with keys "
                        f"{sorted(p.writes)}, got "
                        f"{sorted(outs) if isinstance(outs, dict) else type(outs)}")
                env.update(outs)
            return {o: env[o] for o in outputs}

        fn = jax.jit(run, donate_argnums=(0,)) if jit else run
        prog = FrameProgram(self.name, fn, externals, outputs, schedule,
                            sorted(donate_set))
        prog._run = run
        return prog


@dataclasses.dataclass
class FrameProgram:
    """A baked frame: call with the external slots, get the output slots.
    The compiled analog of recording+submitting command buffers — one XLA
    dispatch per frame."""
    name: str
    _fn: Callable
    externals: list[str]
    outputs: list[str]
    schedule: list[Pass]
    donated: list[str] = dataclasses.field(default_factory=list)

    def __call__(self, **env) -> dict:
        missing = [e for e in self.externals if e not in env]
        if missing:
            raise GraphValidationError(
                f"frame {self.name!r} missing external slots {missing}")
        donated = {k: env[k] for k in self.donated}
        kept = {k: v for k, v in env.items() if k not in self.donated}
        return self._fn(donated, kept)

    @property
    def pass_names(self) -> list[str]:
        return [p.name for p in self.schedule]

    def save_baked(self, path: str, **example_env) -> None:
        """Serialize the baked frame program (StableHLO via jax.export) so
        later launches skip tracing + compilation entirely — the
        render-graph-bake artifact SURVEY.md §5.4 suggested the reference
        needed. ``example_env`` must carry arrays of the shapes/dtypes the
        frame will be called with."""
        import jax
        from jax import export as jexport

        missing = [e for e in self.externals if e not in example_env]
        if missing:
            raise GraphValidationError(f"save_baked missing {missing}")
        # export without donation (serialized programs own no input buffers)
        run = getattr(self, "_run", None) or (
            lambda donated, kept: self._fn(donated, kept))
        jitted = jax.jit(lambda env: run({}, env))
        exported = jexport.export(jitted)({
            k: example_env[k] for k in self.externals})
        with open(path, "wb") as f:
            f.write(exported.serialize())
        _log.info("baked frame %s -> %s", self.name, path)


def load_baked(path: str):
    """Load a frame program serialized by :meth:`FrameProgram.save_baked`.
    Returns a callable taking the same env dict."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(**env):
        return exported.call(env)

    return call

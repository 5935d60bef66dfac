"""Graph→XLA compilation engine.

This is the TPU-native replacement for the reference's recursive pull
interpreter (reference: src/pygmu2/processing_element.py:95-151, where every
``render`` is a Python virtual call per PE per block). Here the whole PE DAG
rooted at a node traces ONCE into a single jitted XLA program per
``(root, block_duration)``:

    fn(block_start, states) -> (block, new_states)

* Pure PEs become stateless functions of absolute sample index.
* Stateful PEs thread a state pytree through the program. Each state entry
  carries a ``next`` cursor (the absolute index one past the previous
  request); on a non-contiguous request the state is reset to its init value
  — matching the reference contract that impure PEs handle non-contiguous
  starts themselves (reference: tests/test_processing_element.py:125-131,
  convolve_pe.py:254-256).
* Extent-driven zero-fill (reference contract 1) is applied centrally by
  ``TraceContext.pull`` from host-side Extent objects — as static pruning
  when the request window is static, as an on-device mask otherwise.
* Within one block, repeated pulls of the same node at the same static
  offset are memoized at trace time (the reference needed CachePE for this;
  here sharing is free and CachePE is a no-op marker).

Rendering a long timeline uses ``render_scan``: a ``lax.scan`` over blocks
with the state pytree as carry — one device launch for an entire piece.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, TYPE_CHECKING

import numpy as np

from pygmu2_tpu.core import prec  # noqa: F401  (enables x64 before jax use)
import jax
import jax.numpy as jnp

from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.logger import get_logger

if TYPE_CHECKING:
    from pygmu2_tpu.core.processing_element import ProcessingElement

_log = get_logger(__name__)

# ``next`` cursor value meaning "state has never been used" — any request
# start compares unequal, so the first render after a reset re-inits.
FRESH = np.int64(-(2**62))

_uid_counter = itertools.count()


def next_uid() -> int:
    """Monotonic id assigned to every PE at construction (stable state keys)."""
    return next(_uid_counter)


class _Frame:
    """One entry of the trace stack: which PE is rendering what window."""

    __slots__ = ("pe", "start", "rel", "duration")

    def __init__(self, pe, start, rel, duration):
        self.pe = pe
        self.start = start  # absolute start: Python int (static) or traced scalar
        self.rel = rel  # static offset from block start, or None if dynamic
        self.duration = duration  # static Python int


class TraceContext:
    """Handed to ``ProcessingElement._trace`` while the graph is being traced.

    Provides input pulls, scalar-or-PE parameter evaluation, absolute time
    indices, and the state protocol.
    """

    def __init__(
        self,
        program: "Program",
        block_start,
        states: dict | None,
        bindings: dict | None = None,
    ):
        self._program = program
        self._block_start = block_start
        self._states_in = states  # None on the very first (init) trace
        self._states_out: dict[str, Any] = {}
        self._memo: dict[tuple, Any] = {}
        self._stack: list[_Frame] = []
        self._bindings = bindings  # name -> traced value (ParamPE)

    # ---- frame info -----------------------------------------------------

    @property
    def duration(self) -> int:
        """Static sample count of the current frame."""
        return self._stack[-1].duration

    @property
    def start(self):
        """Absolute start index of the current frame (int or traced scalar)."""
        return self._stack[-1].start

    @property
    def sample_rate(self) -> int:
        return self._program.sample_rate

    def times(self, dtype=prec.INDEX):
        """Absolute sample indices of the current frame, shape (duration,)."""
        frame = self._stack[-1]
        idx = jnp.arange(frame.duration, dtype=prec.INDEX)
        t = jnp.asarray(frame.start, dtype=prec.INDEX) + idx
        if dtype != prec.INDEX:
            t = t.astype(dtype)
        return t

    # ---- pulling inputs -------------------------------------------------

    def pull(self, pe: "ProcessingElement", shift: int = 0, duration: int | None = None):
        """Render ``pe`` for ``[frame.start + shift, + duration)``.

        ``shift`` must be a static Python int; use :meth:`pull_abs` for a
        data-dependent start. Returns a float32 array ``(duration, C)``.
        """
        frame = self._stack[-1]
        if duration is None:
            duration = frame.duration
        rel = None if frame.rel is None else frame.rel + shift
        if isinstance(frame.start, (int, np.integer)):
            start = int(frame.start) + shift
        else:
            start = frame.start + shift
        return self._render_node(pe, start, rel, duration)

    def pull_abs(self, pe: "ProcessingElement", start, duration: int):
        """Render ``pe`` at a dynamic (traced) absolute start index."""
        return self._render_node(pe, start, None, duration)

    def _render_node(self, pe, start, rel, duration: int):
        if duration <= 0:
            return jnp.zeros((0, pe.channel_count() or 1), dtype=prec.AUDIO)

        ext = pe.extent()
        static_start = isinstance(start, (int, np.integer))

        if rel is not None:
            key = (id(pe), rel, duration)
        elif static_start:
            # Absolute pulls at a host-static index (loop bodies, held edge
            # values) are also memoizable within the trace.
            key = (id(pe), ("abs", int(start)), duration)
        else:
            key = None
        if key is not None and key in self._memo:
            return self._memo[key]

        out = None
        # Edge-filling PEs (HOLD modes, ringing tails) emit meaningful
        # samples outside their extent — never prune or shortcut them.
        fills = pe._fills_own_edges()
        if ext.is_empty() and not fills:
            out = self._zeros_like_node(pe, duration)
        elif (
            static_start
            and not fills
            and not ext.intersects(Extent(int(start), int(start) + duration))
        ):
            # Whole request outside the extent: prune at trace time.
            out = self._zeros_like_node(pe, duration)

        if out is None:
            self._stack.append(_Frame(pe, start, rel, duration))
            try:
                out = pe._trace(self)
            finally:
                self._stack.pop()
            out = jnp.asarray(out)
            if out.ndim == 1:
                out = out[:, None]
            if out.shape[0] != duration:
                raise RuntimeError(
                    f"{type(pe).__name__}._trace returned {out.shape[0]} samples, "
                    f"expected {duration}"
                )
            if out.dtype != prec.AUDIO:
                out = out.astype(prec.AUDIO)
            out = self._mask_extent(pe, ext, start, duration, out)

        if key is not None:
            self._memo[key] = out
        return out

    def _zeros_like_node(self, pe, duration: int):
        channels = pe.channel_count()
        if channels is None:
            counts = [inp.channel_count() for inp in pe.inputs()]
            counts = [c for c in counts if c is not None]
            channels = pe.resolve_channel_count(counts) if counts else 1
        return jnp.zeros((duration, int(channels)), dtype=prec.AUDIO)

    def _mask_extent(self, pe, ext: Extent, start, duration: int, out):
        """Zero samples outside ``ext`` (render contract 1) unless the PE
        fills its own edges (ExtendMode HOLD variants)."""
        if pe._fills_own_edges():
            return out
        if ext.start is None and ext.end is None:
            return out
        if isinstance(start, (int, np.integer)) and ext.spans(int(start), duration):
            return out
        t = jnp.asarray(start, dtype=prec.INDEX) + jnp.arange(duration, dtype=prec.INDEX)
        mask = jnp.ones((duration,), dtype=bool)
        if ext.start is not None:
            mask = mask & (t >= ext.start)
        if ext.end is not None:
            mask = mask & (t < ext.end)
        return jnp.where(mask[:, None], out, jnp.zeros((), dtype=out.dtype))

    # ---- scalar-or-PE parameters ---------------------------------------

    def param(
        self,
        value,
        channel: int = 0,
        multichannel: bool = False,
        channels: int | None = None,
        dtype=prec.AUDIO,
    ):
        """Evaluate a scalar-or-PE parameter over the current frame.

        Mirrors the reference's ``_scalar_or_pe_values`` convention
        (reference: processing_element.py:296-363): returns ``(duration,)``
        (channel 0 of a multichannel PE by default), or ``(duration, C)``
        when ``multichannel`` is True.
        """
        from pygmu2_tpu.core.processing_element import ProcessingElement

        duration = self.duration
        if isinstance(value, ProcessingElement):
            data = self.pull(value)
            if multichannel:
                return data.astype(dtype)
            if channel < 0 or channel >= data.shape[1]:
                raise ValueError(
                    f"channel {channel} out of range for param with "
                    f"{data.shape[1]} channels"
                )
            return data[:, channel].astype(dtype)
        scalar = jnp.asarray(float(value), dtype=dtype)
        if multichannel:
            return jnp.full((duration, channels or 1), scalar, dtype=dtype)
        return jnp.full((duration,), scalar, dtype=dtype)

    def param_is_pe(self, value) -> bool:
        from pygmu2_tpu.core.processing_element import ProcessingElement

        return isinstance(value, ProcessingElement)

    # ---- runtime-bindable parameters (ParamPE) ---------------------------

    def binding(self, name: str, default):
        """The bound value for ``name``: a traced scalar (or ``(C,)``
        vector) when the render was given ``bindings={name: value}``,
        else ``default``. Because bindings enter the program as jit
        ARGUMENTS (not trace-time constants), changing a bound value
        never recompiles — and the program is differentiable and
        vmap-able with respect to it."""
        if self._bindings is not None and name in self._bindings:
            return jnp.asarray(self._bindings[name], dtype=prec.AUDIO)
        return jnp.asarray(float(default), dtype=prec.AUDIO)

    # ---- state protocol -------------------------------------------------

    def state(self, pe, init, reset_on_gap: bool = True):
        """Fetch ``pe``'s carried state for the current frame.

        ``init`` is a pytree (or zero-arg callable returning one) giving the
        reset value; its leaf shapes/dtypes define the state layout and must
        be stable across frames. Returns ``(state, fresh)`` where ``fresh``
        is a traced bool scalar — True when the state was (re)initialized
        because this is the first request or a non-contiguous one.

        Call :meth:`set_state` with the updated pytree before returning.
        """
        key = f"pe{pe._uid}"
        init_val = init() if callable(init) else init
        init_val = jax.tree_util.tree_map(jnp.asarray, init_val)
        frame = self._stack[-1]
        start = jnp.asarray(frame.start, dtype=prec.INDEX)

        if self._states_in is None or key not in self._states_in:
            self._program._register_state_node(pe)
            return init_val, jnp.asarray(True)

        stored = self._states_in[key]
        if not reset_on_gap:
            return stored["user"], stored["next"] == FRESH
        contig = stored["next"] == start
        user = jax.tree_util.tree_map(
            lambda cur, ini: jnp.where(contig, cur, jnp.asarray(ini, dtype=cur.dtype)),
            stored["user"],
            init_val,
        )
        return user, ~contig

    def set_state(self, pe, new_state) -> None:
        """Store ``pe``'s state for the next block."""
        frame = None
        for fr in reversed(self._stack):
            if fr.pe is pe:
                frame = fr
                break
        if frame is None:
            frame = self._stack[-1]
        nxt = jnp.asarray(frame.start, dtype=prec.INDEX) + frame.duration
        self._states_out[f"pe{pe._uid}"] = {
            "user": jax.tree_util.tree_map(jnp.asarray, new_state),
            "next": nxt,
        }

    def _collect_states(self) -> dict:
        # Carry through untouched states so the pytree structure is stable
        # even when a subgraph was pruned this block.
        out = dict(self._states_out)
        if self._states_in:
            for key, val in self._states_in.items():
                out.setdefault(key, val)
        return out


class Program:
    """A compiled render program for one (root, block_duration) pair."""

    def __init__(self, root: "ProcessingElement", duration: int):
        self.root = root
        self.duration = int(duration)
        self.sample_rate = root.sample_rate
        self._state_nodes: list = []
        self._walked = _walk(root)
        # Host prelude: let PEs materialize host-side caches (e.g.
        # TralfamPE's one-time spectral scramble) OUTSIDE the trace —
        # a nested pe.render() inside _trace would inline into the
        # outer jit as tracers.
        for pe in _walk(root):
            prep = getattr(pe, "_prepare_host", None)
            if prep is not None:
                prep()
        self._fn_first = jax.jit(self._run_first)
        self._fn_step = jax.jit(self._run_step)
        self._scan_fn = None
        self._scan_fn_bound = None

    # ---- traced bodies --------------------------------------------------

    def _run_first(self, block_start, bindings=None):
        ctx = TraceContext(self, block_start, None, bindings)
        out = ctx._render_node(self.root, block_start, 0, self.duration)
        return out, ctx._collect_states()

    def _run_step(self, block_start, states, bindings=None):
        ctx = TraceContext(self, block_start, states, bindings)
        out = ctx._render_node(self.root, block_start, 0, self.duration)
        return out, ctx._collect_states()

    def _register_state_node(self, pe) -> None:
        if pe not in self._state_nodes:
            self._state_nodes.append(pe)

    # ---- host-side driver ----------------------------------------------

    def run(self, start: int):
        """Render one block at ``start``, threading instance-held state.

        Live-control writes win: a thread-safe state write that lands
        while the block is in flight (``ControlPE.set_value``,
        ``TimeWarpPE.seek`` — they bump the PE's ``_eng_version``) is
        NOT clobbered by the post-render scatter; only the engine's
        timeline bookkeeping (``next``) is taken from the render, so the
        externally-written payload applies to the next contiguous block.
        """
        pes = self._walked
        versions = [getattr(pe, "_eng_version", 0) for pe in pes]
        states = _gather_states(self.root)
        if states is None:
            out, new_states = self._fn_first(jnp.asarray(start, dtype=prec.INDEX))
        else:
            out, new_states = self._fn_step(
                jnp.asarray(start, dtype=prec.INDEX), states
            )
        for pe, ver in zip(pes, versions):
            key = f"pe{pe._uid}"
            if key not in new_states:
                continue
            if getattr(pe, "_eng_version", 0) != ver:
                # External write landed during this render (possibly
                # during the FIRST block's compile, whose traced init
                # already baked the old value): take the PE's live
                # payload, and only the timeline bookkeeping from the
                # render.
                live = getattr(pe, "_eng_live_state", None)
                cur = getattr(pe, "_eng_state", None)
                user = live() if live is not None else (
                    cur["user"] if cur is not None else new_states[key]["user"]
                )
                pe._eng_state = {"user": user, "next": new_states[key]["next"]}
            else:
                pe._eng_state = new_states[key]
        self._fire_block_hooks()
        return out

    def _fire_block_hooks(self) -> None:
        """Deliver state-carried tap payloads to host-side sinks.

        PEs with side effects (WavWriterPE) publish each rendered block
        through their state pytree and define ``_eng_on_block``; the
        driver hands the payload over AFTER the block lands on host. An
        ordered ``io_callback`` inside the traced program would be the
        torch translation — it deadlocks on remote-attached devices
        (axon), where the device cannot call back into this process
        mid-program. State-carried taps ride the same D2H transfer the
        render already pays.
        """
        for pe in self._walked:
            hook = getattr(pe, "_eng_on_block", None)
            st = getattr(pe, "_eng_state", None)
            if hook is not None and st is not None:
                hook(st["user"])

    def run_static(self, start: int):
        """Render one block with a *static* start (max trace-time pruning).

        Retraces per distinct start — use for one-shot offline renders of
        graphs with many scheduled items (SequencePE) where static pruning
        matters; otherwise prefer :meth:`run`.
        """
        states = _gather_states(self.root)
        if states is None:
            out, new_states = self._run_first(int(start))
        else:
            out, new_states = self._run_step(int(start), states)
        _scatter_states(self.root, new_states)
        self._fire_block_hooks()
        return out


def _walk(root) -> list:
    """All nodes reachable from root (root included), depth-first, each once."""
    seen: dict[int, Any] = {}
    order = []

    def visit(pe):
        if id(pe) in seen:
            return
        seen[id(pe)] = pe
        for inp in pe.inputs():
            visit(inp)
        order.append(pe)

    visit(root)
    return order


def _gather_states(root) -> dict | None:
    """Collect instance-held states for the graph; None if none initialized."""
    states = {}
    for pe in _walk(root):
        st = getattr(pe, "_eng_state", None)
        if st is not None:
            states[f"pe{pe._uid}"] = st
    return states or None


def _scatter_states(root, states: dict) -> None:
    for pe in _walk(root):
        key = f"pe{pe._uid}"
        if key in states:
            pe._eng_state = states[key]


def reset_graph_states(root) -> None:
    """Drop all carried state in the graph (forces re-init on next render)."""
    for pe in _walk(root):
        pe._eng_state = None


def get_program(root, duration: int) -> Program:
    """Program cache, keyed per root instance and block duration."""
    cache = root.__dict__.setdefault("_programs", {})
    prog = cache.get(duration)
    if prog is None:
        prog = Program(root, duration)
        cache[duration] = prog
    return prog


def render_scan(root, start: int, total: int, block: int, bindings=None):
    """Render ``[start, start+total)`` as a ``lax.scan`` over fixed blocks.

    Returns a device array ``(total, C)``. One compile, one device launch
    for the whole timeline — the offline/benchmark fast path.

    ``bindings`` maps :class:`~pygmu2_tpu.models.basic.ParamPE` names to
    runtime values; they enter the program as jit arguments, so sweeping
    a bound value re-runs the SAME compiled program (no retrace).
    """
    if total <= 0:
        return jnp.zeros((0, root.channel_count() or 1), dtype=prec.AUDIO)
    block = int(min(block, total))
    n_blocks = -(-total // block)
    prog = get_program(root, block)

    states = _gather_states(root)
    first_start = jnp.asarray(start, dtype=prec.INDEX)
    if states is None:
        out0, states = prog._fn_first(first_start, bindings)
    else:
        out0, states = prog._fn_step(first_start, states, bindings)

    # Side-effect taps (WavWriterPE): their per-block payloads ride the
    # state pytree (see Program._fire_block_hooks); the scan emits them
    # as extra ys so every block — not just the last carry — reaches the
    # host sink, in block order. Graphs without writers pay nothing.
    writers = [pe for pe in prog._walked if hasattr(pe, "_eng_on_block")]
    tap_keys = [f"pe{pe._uid}" for pe in writers]
    tap0 = {k: states[k]["user"] for k in tap_keys if k in states}

    tap_rest = None
    if n_blocks > 1:
        starts = start + block * jnp.arange(1, n_blocks, dtype=prec.INDEX)

        if bindings is None:
            if prog._scan_fn is None:

                def step(carry, s):
                    out, new_carry = prog._run_step(s, carry)
                    taps = {k: new_carry[k]["user"] for k in tap_keys}
                    return new_carry, (out, taps)

                prog._scan_fn = jax.jit(lambda st, xs: jax.lax.scan(step, st, xs))
            states, (rest, tap_rest) = prog._scan_fn(states, starts)
        else:
            if prog._scan_fn_bound is None:

                def step_bound(b, carry, s):
                    out, new_carry = prog._run_step(s, carry, b)
                    taps = {k: new_carry[k]["user"] for k in tap_keys}
                    return new_carry, (out, taps)

                prog._scan_fn_bound = jax.jit(
                    lambda st, xs, b: jax.lax.scan(
                        lambda c, s: step_bound(b, c, s), st, xs
                    )
                )
            states, (rest, tap_rest) = prog._scan_fn_bound(
                states, starts, bindings
            )
        out = jnp.concatenate(
            [out0[None], rest], axis=0
        ).reshape(n_blocks * block, -1)[:total]
    else:
        out = out0[:total]
    _scatter_states(root, states)
    for pe in writers:
        key = f"pe{pe._uid}"
        if key not in tap0:
            continue
        hook = pe._eng_on_block
        hook(tap0[key])
        if tap_rest is not None:
            stacked = tap_rest[key]
            for i in range(stacked.shape[0]):
                hook(stacked[i])
    return out


def render_functional(root, start: int, total: int, block: int, bindings=None):
    """Purely-functional render: fresh state, no instance state read or
    written — safe to call under ``jax.grad`` / ``jax.vmap`` / ``jax.jit``
    (``render_scan`` scatters carried state onto the PE instances, which
    would leak tracers inside a transform).

    With ``bindings`` this is the differentiable-synthesis entry point:

        loss = lambda b: jnp.mean((render_functional(g, 0, N, B, b) - t) ** 2)
        grads = jax.grad(loss)({"cutoff": 800.0})

    Gradients flow through every scan/closed-form path AND the Mosaic
    kernel paths: each sequential Pallas kernel (TPU
    ladder/comb/KS/ADSR/reverse-echo/envelope/linrec fast paths)
    carries a custom_vjp whose backward replays its ``lax.scan``
    reference (ops/diffable.py), so this is differentiable on every
    backend (tests/test_kernel_gradients.py).
    """
    if total <= 0:
        return jnp.zeros((0, root.channel_count() or 1), dtype=prec.AUDIO)
    block = int(min(block, total))
    n_blocks = -(-total // block)
    prog = get_program(root, block)

    out0, states = prog._fn_first(jnp.asarray(start, dtype=prec.INDEX), bindings)
    if n_blocks == 1:
        return out0[:total]
    starts = start + block * jnp.arange(1, n_blocks, dtype=prec.INDEX)
    if prog._scan_fn_bound is None:
        # Must emit the same (out, taps) ys structure render_scan's
        # cached variant does — the jitted fn is shared. Functional
        # renders DISCARD tap payloads (side effects have no place
        # under grad/vmap).
        tap_keys = [
            f"pe{pe._uid}"
            for pe in prog._walked
            if hasattr(pe, "_eng_on_block")
        ]

        def step_bound(b, carry, s):
            out, new_carry = prog._run_step(s, carry, b)
            taps = {k: new_carry[k]["user"] for k in tap_keys}
            return new_carry, (out, taps)

        prog._scan_fn_bound = jax.jit(
            lambda st, xs, b: jax.lax.scan(
                lambda c, s: step_bound(b, c, s), st, xs
            )
        )
    _, (rest, _taps) = prog._scan_fn_bound(states, starts, bindings)
    return jnp.concatenate([out0[None], rest], axis=0).reshape(
        n_blocks * block, -1
    )[:total]


# ---- checkpoint / resume -------------------------------------------------
#
# Every impure PE's carried state lives in the explicit state pytree the
# programs thread between blocks (the TPU analog of the reference's
# per-instance attributes: biquad zi, ConvolvePE._tail, TimeWarpPE._pos,
# SinePE._accumulated_phase — SURVEY §5 "Checkpoint / resume"). Snapshots
# are keyed structurally (walk order + class name), so they restore onto
# a *rebuilt* graph of the same shape, not just the same objects.


def _structural_keys(root) -> dict:
    return {
        f"pe{pe._uid}": f"{i}:{type(pe).__name__}"
        for i, pe in enumerate(_walk(root))
    }


def checkpoint_state(root) -> dict:
    """Snapshot the graph's carried render state as host numpy arrays.

    The result is a plain (pickle-able) dict; pass it to
    ``restore_state`` on an equivalently-shaped graph to resume
    rendering mid-timeline.
    """
    import numpy as np

    states = _gather_states(root) or {}
    remap = _structural_keys(root)
    return {
        remap[k]: jax.tree_util.tree_map(np.asarray, v)
        for k, v in states.items()
    }


def restore_state(root, snapshot: dict) -> None:
    """Restore a ``checkpoint_state`` snapshot onto ``root``'s graph.

    The graph must have the same structure (same PE classes in the same
    walk order) as the one the snapshot was taken from.
    """
    reset_graph_states(root)
    if not snapshot:
        return
    inv = {s: u for u, s in _structural_keys(root).items()}
    unknown = set(snapshot) - set(inv)
    if unknown:
        raise ValueError(
            f"snapshot does not match this graph's structure: {sorted(unknown)}"
        )
    _scatter_states(
        root,
        {inv[k]: jax.tree_util.tree_map(jnp.asarray, v) for k, v in snapshot.items()},
    )

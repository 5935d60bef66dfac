"""Trigger-driven restart and random selection.

TPU-native rebuilds of:
- TriggerRestartPE (reference: src/pygmu2/trigger_restart_pe.py:18-98) —
  on each positive trigger, restart the source from its own t=0.
- RandomSelectPE   (reference: src/pygmu2/random_select_pe.py:22-172) —
  on each positive trigger, pick a weighted-random input and play it from
  its start.

TPU design: the reference calls ``src.reset_state()`` mid-render and
re-renders segments — data-dependent control flow that cannot live inside
one compiled program. Here the source's full *finite* extent is rendered
once per block (a static pull) and the restart becomes a gather at
``local_time = t − t_last_event``, with the last-event time tracked by a
parallel cummax latch. Selection randomness is a counter-based hash of
the event time (reproducible by seed, block-invariant). Sources must have
finite extent (wrap infinite sources in CropPE) — the static-shape analog
of the reference's unbounded replay.
"""

from __future__ import annotations

import enum

import numpy as np

import jax
import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.ops.noise import white_uniform
from pygmu2_tpu.ops.table import paired_table_lookup

_NO_EVENT = np.int64(-(2**62))


def _clip_pick(clip, pos):
    """Exact ``clip[pos]`` for (L, C) clips and (T,) int32 positions.

    Routed through the one-hot MXU lookup (ops/table.py): XLA's TPU
    lowering of an elementwise gather is a ~7 ns/element scalar loop,
    and for large in-program computed clips the remote compiler has
    been observed to SIGSEGV on the gather+source combination
    (ResetPE over a 1 s BlitSaw span, round 5)."""
    return jnp.stack(paired_table_lookup(clip, pos), axis=-1)


def _finite_len(pe: ProcessingElement, what: str) -> tuple[int, int]:
    ext = pe.extent()
    if ext.start is None or ext.end is None:
        raise ValueError(
            f"{what} requires a source with finite extent (got {ext}); "
            "wrap it in CropPE."
        )
    return ext.start, ext.end - ext.start


def _event_latch(ctx, self_pe, trig, t):
    """Absolute time of the latest positive trigger at/before each sample
    (carried across blocks); _NO_EVENT where none has occurred yet."""
    t0_carry, _ = ctx.state(self_pe, init=jnp.asarray(_NO_EVENT, prec.INDEX))
    events = jnp.where(trig > 0, t, _NO_EVENT)
    t0 = jax.lax.cummax(jnp.maximum(events, t0_carry))
    ctx.set_state(self_pe, t0[-1])
    return t0


class TriggerRestartPE(ProcessingElement):
    """Restart the source from local t=0 on every positive trigger."""

    def __init__(self, trigger, src: ProcessingElement):
        self._trigger = trigger
        self._src = src

    def inputs(self) -> list[ProcessingElement]:
        return [self._trigger, self._src]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._src.channel_count()

    def resolve_channel_count(self, input_channel_counts: list[int]) -> int:
        if len(input_channel_counts) != 2:
            raise ValueError("TriggerRestartPE expects exactly two inputs")
        return input_channel_counts[1]

    def _compute_extent(self) -> Extent:
        return self._trigger.extent()

    def _trace(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0]
        t = ctx.times()
        src_start, src_len = _finite_len(self._src, "TriggerRestartPE")
        clip = ctx.pull_abs(self._src, src_start, src_len)  # (L, C)

        t0 = _event_latch(ctx, self, trig, t)
        local = t - t0
        valid = (t0 != _NO_EVENT) & (local >= 0) & (local < src_len)
        pos = jnp.clip(local, 0, src_len - 1).astype(jnp.int32)
        return jnp.where(valid[:, None], _clip_pick(clip, pos), 0.0)

    def __repr__(self) -> str:
        return (
            f"TriggerRestartPE(trigger={type(self._trigger).__name__}, "
            f"src={type(self._src).__name__})"
        )


class RandomSelectPE(ProcessingElement):
    """Weighted-random input selection on each positive trigger."""

    def __init__(self, trigger, inputs, weights=None, seed: int | None = None):
        if not inputs:
            raise ValueError("RandomSelectPE requires at least one input")
        if weights is not None and len(weights) != len(inputs):
            raise ValueError("weights must have the same length as inputs")
        self._trigger = trigger
        self._sources = list(inputs)
        self._weights = list(weights) if weights is not None else None
        self._seed = seed

    def inputs(self) -> list[ProcessingElement]:
        return [self._trigger] + self._sources

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._sources[0].channel_count()

    def resolve_channel_count(self, input_channel_counts: list[int]) -> int:
        if len(input_channel_counts) < 2:
            raise ValueError("RandomSelectPE has no audio inputs")
        audio = input_channel_counts[1:]
        first = audio[0]
        for i, cc in enumerate(audio[1:], start=2):
            if cc != first:
                raise ValueError(
                    f"RandomSelectPE channel mismatch: input 1 has {first}, "
                    f"input {i} has {cc}"
                )
        return first

    def _compute_extent(self) -> Extent:
        return self._trigger.extent()

    def _trace(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0]
        t = ctx.times()

        clips = []
        max_len = 0
        for src in self._sources:
            s0, length = _finite_len(src, "RandomSelectPE")
            clips.append((s0, length))
            max_len = max(max_len, length)
        stacked = []
        for src, (s0, length) in zip(self._sources, clips):
            clip = ctx.pull_abs(src, s0, length)
            if length < max_len:
                clip = jnp.concatenate(
                    [clip, jnp.zeros((max_len - length, clip.shape[1]), clip.dtype)],
                    axis=0,
                )
            stacked.append(clip)
        bank = jnp.stack(stacked)  # (K, max_len, C)
        lens = jnp.asarray([length for _, length in clips], prec.INDEX)

        t0 = _event_latch(ctx, self, trig, t)

        # Weighted choice keyed by the event time (stable per event).
        w = np.asarray(
            self._weights
            if self._weights is not None
            else [1.0] * len(self._sources),
            dtype=np.float64,
        )
        cum = jnp.asarray(np.cumsum(w / w.sum()), jnp.float32)
        u = (white_uniform(t0, seed=(self._seed or 0) ^ 0x5EED) + 1.0) * 0.5
        k = jnp.clip(
            jnp.searchsorted(cum, u, side="right"), 0, len(self._sources) - 1
        ).astype(jnp.int32)

        local = t - t0
        # lens[k] would be a (T,)-long scalar-loop gather on TPU; K is
        # tiny, so select by an exact one-hot contraction instead.
        len_k = jnp.sum(
            jax.nn.one_hot(k, len(self._sources), dtype=jnp.int32)
            * lens.astype(jnp.int32)[None, :],
            axis=-1,
        )
        valid = (t0 != _NO_EVENT) & (local >= 0) & (local < len_k)
        pos = jnp.clip(local, 0, max_len - 1).astype(jnp.int32)
        # flatten (K, max_len, C) -> (K*max_len, C): one fused lookup
        flat = bank.reshape(-1, bank.shape[-1])
        out = _clip_pick(flat, k * max_len + pos)  # (T, C)
        return jnp.where(valid[:, None], out, 0.0)

    def __repr__(self) -> str:
        return (
            f"RandomSelectPE(trigger={type(self._trigger).__name__}, "
            f"n_inputs={len(self._sources)})"
        )


class TriggerMode(enum.Enum):
    """TriggerPE playback policy (see :class:`TriggerPE`)."""

    ONE_SHOT = "one_shot"
    GATED = "gated"


class TriggerPE(ProcessingElement):
    """Gate-edge-driven clip player: a rising edge of ``gate`` starts the
    finite ``source`` from its local t=0.

    Modes:
        ONE_SHOT — once started, the clip plays to its end regardless of
            the gate; rising edges DURING playback are ignored (classic
            drum-pad semantics). A new edge after the clip ends restarts.
        GATED — output follows the gate: a rising edge (re)starts the
            clip, and the output CUTS to silence whenever the gate is
            low (classic gate-to-sample semantics).

    The reference ships this PE only as a disabled draft (its
    tests/test_trigger_pe.py importorskips ``pygmu2.trigger_pe``); this
    is the live TPU-native equivalent. Edge detection carries the
    previous gate sample across blocks, so chunked rendering is exact at
    any block size. ONE_SHOT's accept-only-when-idle rule is sequential
    per ACCEPTED event, not per sample — its src_len refractory period
    bounds accepted events at ceil(T/src_len)+1 per block, so it runs as
    that many parallel next-edge jumps (reverse cummin + fori_loop);
    GATED is fully parallel (cummax latch, like TriggerRestartPE).
    """

    def __init__(self, gate, source: ProcessingElement,
                 mode: TriggerMode = TriggerMode.ONE_SHOT):
        self._gate = gate
        self._source = source
        self._mode = mode

    @property
    def gate(self):
        return self._gate

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def mode(self) -> TriggerMode:
        return self._mode

    def inputs(self) -> list[ProcessingElement]:
        return [self._gate, self._source]

    def is_pure(self) -> bool:
        return False

    def state_decays(self) -> bool:
        return False  # the latched start time never converges on its own

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def resolve_channel_count(self, input_channel_counts: list[int]) -> int:
        if len(input_channel_counts) != 2:
            raise ValueError("TriggerPE expects exactly two inputs")
        return input_channel_counts[1]

    def _compute_extent(self) -> Extent:
        return self._gate.extent()

    def _trace(self, ctx):
        gate = ctx.pull(self._gate)[:, 0]
        t = ctx.times()
        src_start, src_len = _finite_len(self._source, "TriggerPE")
        clip = ctx.pull_abs(self._source, src_start, src_len)  # (L, C)

        init = (
            jnp.asarray(0.0, prec.AUDIO),        # previous gate sample
            jnp.asarray(_NO_EVENT, prec.INDEX),  # latched start time
        )
        (prev_g, t0_carry), _ = ctx.state(self, init=init)
        prev = jnp.concatenate([prev_g[None], gate[:-1]])
        edge = (gate > 0) & (prev <= 0)

        if self._mode == TriggerMode.GATED:
            # parallel latch: every rising edge restarts
            events = jnp.where(edge, t, _NO_EVENT)
            t0 = jax.lax.cummax(jnp.maximum(events, t0_carry))
        else:
            # ONE_SHOT: accept an edge only when idle (previous clip
            # done). The accept rule has a refractory period of src_len
            # samples, so at most ceil(T/src_len)+1 edges are accepted
            # per block — resolve the acceptance CHAIN with that many
            # next-edge jumps instead of a per-sample scan:
            #   nxt[i] = first edge position at/after sample i
            #            (a reverse cummin — parallel);
            #   p ← nxt[first idle sample]; accept p; jump p + src_len.
            T = int(t.shape[0])
            k_jumps = T // max(src_len, 1) + 1
            idx32 = jnp.arange(T, dtype=jnp.int32)
            inf = jnp.int32(T)
            e_pos = jnp.where(edge, idx32, inf)
            nxt = jax.lax.cummin(e_pos, reverse=True)
            # first idle sample, relative to the block start
            r0 = jnp.where(
                t0_carry == _NO_EVENT,
                jnp.zeros((), t.dtype),
                t0_carry + src_len - t[0],
            )
            r0 = jnp.clip(r0, 0, T).astype(jnp.int32)

            def jump(_i, carry):
                r, mask = carry
                p = jnp.where(r >= T, inf, nxt[jnp.clip(r, 0, T - 1)])
                hit = p < T
                mask = mask.at[jnp.clip(p, 0, T - 1)].max(
                    hit.astype(jnp.int32)
                )
                r = jnp.where(hit, p + src_len, inf)
                return r, mask

            _, acc = jax.lax.fori_loop(
                0, k_jumps, jump, (r0, jnp.zeros((T,), jnp.int32))
            )
            events = jnp.where(acc > 0, t, _NO_EVENT)
            t0 = jax.lax.cummax(jnp.maximum(events, t0_carry))

        ctx.set_state(self, (gate[-1], t0[-1]))

        local = t - t0
        valid = (t0 != _NO_EVENT) & (local >= 0) & (local < src_len)
        if self._mode == TriggerMode.GATED:
            valid = valid & (gate > 0)
        pos = jnp.clip(local, 0, src_len - 1).astype(jnp.int32)
        return jnp.where(valid[:, None], _clip_pick(clip, pos), 0.0)

    def __repr__(self) -> str:
        return (
            f"TriggerPE(gate={type(self._gate).__name__}, "
            f"source={type(self._source).__name__}, mode={self._mode.value})"
        )


class ResetPE(ProcessingElement):
    """Re-anchor the source's local time to 0 on each rising edge of
    ``trigger``; before the first edge the source passes through at
    absolute time.

    The reference ships this PE only as a disabled draft (its
    tests/test_reset_pe.py importorskips ``pygmu2.reset_pe``); this is
    the live TPU-native equivalent. Differences from TriggerPE: no
    playback gate (output never cuts on trigger-low), retriggers are
    always honored (every rising edge re-anchors), and the un-reset
    passthrough anchors at t=0. The source must have finite extent
    (wrap infinite sources in CropPE) — the static-shape analog of the
    reference draft's unbounded replay.
    """

    def __init__(self, source: ProcessingElement, trigger):
        self._source = source
        self._trigger = trigger

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def trigger(self):
        return self._trigger

    def inputs(self) -> list[ProcessingElement]:
        return [self._source, self._trigger]

    def is_pure(self) -> bool:
        return False

    def state_decays(self) -> bool:
        return False  # the latched reset time never converges on its own

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def resolve_channel_count(self, input_channel_counts: list[int]) -> int:
        if len(input_channel_counts) != 2:
            raise ValueError("ResetPE expects exactly two inputs")
        return input_channel_counts[0]

    def _compute_extent(self) -> Extent:
        return self._trigger.extent()

    def _trace(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0]
        t = ctx.times()
        src_start, src_len = _finite_len(self._source, "ResetPE")
        clip = ctx.pull_abs(self._source, src_start, src_len)  # (L, C)

        init = (
            jnp.asarray(0.0, prec.AUDIO),   # previous trigger sample
            jnp.asarray(0, prec.INDEX),     # latched reset time (0 = none)
        )
        (prev_g, t0_carry), _ = ctx.state(self, init=init)
        prev = jnp.concatenate([prev_g[None], trig[:-1]])
        edge = (trig > 0) & (prev <= 0)
        events = jnp.where(edge, t, jnp.asarray(_NO_EVENT, prec.INDEX))
        t0 = jax.lax.cummax(jnp.maximum(events, t0_carry))
        ctx.set_state(self, (trig[-1], t0[-1]))

        # the source is evaluated at absolute time (t - t0): passthrough
        # before any reset (t0 = 0), re-anchored to its own time origin
        # after each edge — including the source extent's own offset
        local = t - t0 - src_start
        valid = (local >= 0) & (local < src_len)
        pos = jnp.clip(local, 0, src_len - 1).astype(jnp.int32)
        return jnp.where(valid[:, None], _clip_pick(clip, pos), 0.0)

    def __repr__(self) -> str:
        return (
            f"ResetPE(source={type(self._source).__name__}, "
            f"trigger={type(self._trigger).__name__})"
        )

"""Nonlinear sequential DSP: LadderPE, CombPE, KarplusStrongPE.

TPU-native rebuilds of:
- LadderPE        (reference: src/pygmu2/ladder_pe.py:31-625) — Moog
  ladder virtual-analog: 4 cascaded one-pole stages with trapezoidal
  0.769/0.231 weighting, tanh feedback saturation, polynomial
  alpha/q_adjust coefficients, 2× oversampling with input interpolation,
  silence state-decay, 6 response modes.
- CombPE          (reference: src/pygmu2/comb_pe.py:26-349) — feedback
  comb ``y[n] = x[n] + fb·y[n−delay]`` with delay = one period of the
  target frequency, one-pole frequency smoothing, fb clamp ±0.995.
- KarplusStrongPE (reference: src/pygmu2/karplus_strong_pe.py:61-220) —
  plucked string: one-period delay line + fractional-delay first-order
  allpass, seeded noise excitation, optional two-phase decay.

TPU design: these recurrences are *nonlinear/data-dependent* (tanh in
the loop, state-fed delay length), so unlike Biquad/SVF they cannot use
the associative scan. They run as ``lax.scan`` over time with all
per-sample coefficient math hoisted out of the loop (parallel), the
loop body fully vectorized over channels, and ring buffers updated with
``dynamic_update_slice``. Batching many voices/channels is the
throughput lever (VPU lanes), as in the 64-voice KS benchmark.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.core import prec
from pygmu2_tpu.ops import diffable as _dfb
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement, SourcePE
from pygmu2_tpu.models.modes import LadderMode

_LADDER_MODE_INDEX = {
    LadderMode.LP24: 0,
    LadderMode.LP12: 1,
    LadderMode.BP24: 2,
    LadderMode.BP12: 3,
    LadderMode.HP24: 4,
    LadderMode.HP12: 5,
}


def rho_for_decay_db(
    seconds: float,
    frequency: float,
    sample_rate: int,
    db: float = -60.0,
) -> float:
    """Feedback gain rho so a Karplus-Strong pluck decays |db| dB over
    ``seconds``. Accounts for the two-point average's cos(π/N) loss at the
    fundamental (reference: karplus_strong_pe.py:22-58)."""
    n = sample_rate / frequency
    target = 10.0 ** (db / (20.0 * seconds * frequency))
    rho = target / math.cos(math.pi / n)
    return min(rho, 1.0)


class LadderPE(ProcessingElement):
    """Moog-style ladder filter with tanh feedback and oversampling."""

    def state_decays(self) -> bool:
        return True  # stable nonlinear IIR: state decays by _STATE_DECAY

    _DEFAULT_OVERSAMPLE = 2
    _RESONANCE_MULTIPLIER = 1.8
    _STATE_DECAY = 0.95
    _INPUT_THRESHOLD = 1e-5

    def __init__(
        self,
        source: ProcessingElement,
        frequency,
        resonance=0.0,
        mode: LadderMode = LadderMode.LP24,
        drive=1.0,
        passband_gain: float = 0.5,
        oversample: int = _DEFAULT_OVERSAMPLE,
    ):
        self._source = source
        self._frequency = frequency
        self._resonance = resonance
        self._mode = mode
        self._drive = drive
        self._passband_gain = float(np.clip(passband_gain, 0.0, 0.5))
        self._oversample = max(1, int(oversample))

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def frequency(self):
        return self._frequency

    @property
    def resonance(self):
        return self._resonance

    @property
    def drive(self):
        return self._drive

    @property
    def mode(self) -> LadderMode:
        return self._mode

    @property
    def passband_gain(self) -> float:
        return self._passband_gain

    @property
    def oversample(self) -> int:
        return self._oversample

    def _fills_own_edges(self) -> bool:
        # IIR state rings past the source extent; the reference keeps
        # filtering the zero-padded input through its carried state
        # instead of clipping at the extent, so the decay tail is
        # audible. Opt out of the engine's central zero-fill.
        return True

    def inputs(self) -> list[ProcessingElement]:
        out = [self._source]
        for p in (self._frequency, self._resonance, self._drive):
            if isinstance(p, ProcessingElement):
                out.append(p)
        return out

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        ext = self._source.extent()
        for p in (self._frequency, self._resonance, self._drive):
            if isinstance(p, ProcessingElement):
                ext = ext.intersection(p.extent()) or ext
        return ext

    def _trace(self, ctx):
        x = ctx.pull(self._source)  # (T, C)
        T, C = x.shape
        sr = float(ctx.sample_rate)
        os_n = self._oversample
        pbg = self._passband_gain

        # --- per-sample coefficients, hoisted out of the scan (parallel) ---
        freq = ctx.param(self._frequency, dtype=prec.AUDIO)
        nyq = sr / 2.0
        cutoff = jnp.clip(freq, 5.0, min(nyq * 0.85, nyq - 1.0))
        wc = cutoff * (2.0 * jnp.pi) / (sr * os_n)
        wc2 = wc * wc
        alpha = 0.9892 * wc - 0.4324 * wc2 + 0.1381 * wc2 * wc - 0.0202 * wc2 * wc2
        q_adjust = 1.006 + 0.0536 * wc - 0.095 * wc2 - 0.05 * wc2 * wc2

        res = jnp.clip(ctx.param(self._resonance, dtype=prec.AUDIO), 0.0, 1.0)
        k = 4.0 * res * self._RESONANCE_MULTIPLIER

        drv = jnp.clip(ctx.param(self._drive, dtype=prec.AUDIO), 0.0, 4.0)
        drive_scaled = jnp.where(drv > 1.0, 1.0 + (drv - 1.0) * (1.0 - pbg), drv)

        # State as SEPARATE per-stage (C,) arrays: a (C, 4) carrier would
        # tile-pad the 4 and force 8 dynamic-update-slices per sample.
        st, _ = ctx.state(
            self,
            init=lambda: {
                "z0": tuple(jnp.zeros((C,), prec.AUDIO) for _ in range(4)),
                "z1": tuple(jnp.zeros((C,), prec.AUDIO) for _ in range(4)),
                "old": jnp.zeros((C,), prec.AUDIO),
            },
        )
        mode_index = _LADDER_MODE_INDEX[self._mode]
        os_recip = 1.0 / os_n

        def mode_mix(u, s1, s2, s3, s4):
            if mode_index == 0:
                return s4
            if mode_index == 1:
                return s2
            if mode_index == 2:
                return (s2 + s4) * 4.0 - s3 * 8.0
            if mode_index == 3:
                return (s1 - s2) * 2.0
            if mode_index == 4:
                return u + s4 - (s1 + s3) * 4.0 + s2 * 6.0
            return u + s2 - s1 * 2.0

        def step(carry, inp):
            z0 = list(carry["z0"])
            z1 = list(carry["z1"])
            old = carry["old"]
            xi, al, qa, ki, dsc = inp
            input_sample = xi * dsc  # (C,)
            quiet = jnp.abs(input_sample) < self._INPUT_THRESHOLD
            decay = jnp.where(quiet, self._STATE_DECAY, 1.0)
            z0 = [z * decay for z in z0]
            z1 = [z * decay for z in z1]
            old = old * decay

            total = jnp.zeros_like(input_sample)
            for s_idx in range(os_n):
                interp = s_idx * os_recip
                in_i = interp * old + (1.0 - interp) * input_sample
                u = jnp.tanh(in_i - (z1[3] - pbg * in_i) * ki * qa)
                stages = []
                prev = u
                for st_i in range(4):
                    ft = prev * 0.76923077 + 0.23076923 * z0[st_i] - z1[st_i]
                    ft = ft * al + z1[st_i]
                    z1[st_i] = ft
                    z0[st_i] = prev
                    stages.append(ft)
                    prev = ft
                total = total + mode_mix(u, *stages) * os_recip
            new_carry = {"z0": tuple(z0), "z1": tuple(z1), "old": input_sample}
            return new_carry, total

        if _dfb.kernel_path_enabled() and C <= 128:
            # sequential Mosaic kernel: ~280 ns/sample vs ~2.4 us/sample
            # for the unrolled lax.scan (ops/ladder_pallas.py)
            from pygmu2_tpu.ops.ladder_pallas import ladder_scan_pallas

            st9 = jnp.concatenate(
                [jnp.stack(st["z0"]), jnp.stack(st["z1"]), st["old"][None]], 0
            )
            bb = lambda a: jnp.broadcast_to(a, (T,)).astype(jnp.float32)
            y, new9 = ladder_scan_pallas(
                x, bb(alpha), bb(q_adjust), bb(k), bb(drive_scaled), st9,
                os_n=os_n, pbg=float(pbg), mode_index=mode_index,
                input_threshold=float(self._INPUT_THRESHOLD),
                state_decay=float(self._STATE_DECAY), chunk=512,
                interpret=_dfb.kernel_interpret(),
            )
            final = {
                "z0": tuple(new9[i] for i in range(4)),
                "z1": tuple(new9[4 + i] for i in range(4)),
                "old": new9[8],
            }
            ctx.set_state(self, final)
            return y.astype(prec.AUDIO)

        xs = (
            x,
            jnp.broadcast_to(alpha[:, None], (T, 1)),
            jnp.broadcast_to(q_adjust[:, None], (T, 1)),
            jnp.broadcast_to(k[:, None], (T, 1)),
            jnp.broadcast_to(drive_scaled[:, None], (T, 1)),
        )
        final, y = jax.lax.scan(step, st, xs, unroll=32)
        ctx.set_state(self, final)
        return y.astype(prec.AUDIO)

    def __repr__(self) -> str:
        return (
            f"LadderPE(source={type(self._source).__name__}, mode={self._mode.value}, "
            f"oversample={self._oversample})"
        )


class CombPE(ProcessingElement):
    """Feedback comb tuned to a (possibly modulated) frequency."""

    def state_decays(self) -> bool:
        return True  # feedback < 1: delay-line contents decay geometrically

    _MAX_FEEDBACK = 0.995

    def __init__(
        self,
        source: ProcessingElement,
        frequency,
        feedback=0.0,
        min_frequency: float = 20.0,
        smoothing_samples: int = 2400,
    ):
        self._source = source
        self._frequency = frequency
        self._feedback = feedback
        self._min_frequency = max(1.0, float(min_frequency))
        self._smoothing_samples = max(1, int(smoothing_samples))

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def frequency(self):
        return self._frequency

    @property
    def feedback(self):
        return self._feedback

    def _fills_own_edges(self) -> bool:
        # IIR state rings past the source extent; the reference keeps
        # filtering the zero-padded input through its carried state
        # instead of clipping at the extent, so the decay tail is
        # audible. Opt out of the engine's central zero-fill.
        return True

    def inputs(self) -> list[ProcessingElement]:
        out = [self._source]
        for p in (self._frequency, self._feedback):
            if isinstance(p, ProcessingElement):
                out.append(p)
        return out

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        ext = self._source.extent()
        for p in (self._frequency, self._feedback):
            if isinstance(p, ProcessingElement):
                ext = ext.intersection(p.extent()) or ext
        return ext

    def _trace(self, ctx):
        x = ctx.pull(self._source)  # (T, C)
        T, C = x.shape
        sr = float(ctx.sample_rate)
        L = max(2, int(math.ceil(sr / self._min_frequency)) + 1)

        freq = jnp.maximum(
            ctx.param(self._frequency, dtype=prec.AUDIO), self._min_frequency
        )
        fb = jnp.clip(
            jnp.nan_to_num(ctx.param(self._feedback, dtype=prec.AUDIO)),
            -self._MAX_FEEDBACK,
            self._MAX_FEEDBACK,
        )

        st, _ = ctx.state(
            self,
            init=lambda: {
                "buf": jnp.zeros((L, C), prec.AUDIO),
                "pos": jnp.zeros((), jnp.int32),
                "sf": jnp.full((), -1.0, prec.AUDIO),
            },
        )
        smooth_alpha = 1.0 / self._smoothing_samples

        # --- constant-frequency fast path (ops/comb_block.py) ----------
        # With a static scalar frequency the one-pole smoother is a
        # bitwise fixed point (sf == f32(f) from the first sample), so
        # the delay is a compile-time constant and the comb collapses to
        # one fused multiply-add per d-sample block — arithmetically
        # identical to the sequential kernel, ~50x faster.
        fast_d = None
        if not ctx.param_is_pe(self._frequency):
            f_eff = np.maximum(
                np.float32(float(self._frequency)),
                np.float32(self._min_frequency),
            )
            d_static = int(
                np.clip(
                    np.round(np.float32(sr) / np.maximum(f_eff, np.float32(1.0))),
                    1,
                    L - 1,
                )
            )
            if d_static >= 8:
                fast_d = d_static

        if fast_d is not None:
            from pygmu2_tpu.ops.comb_block import comb_const_delay
            from pygmu2_tpu.ops.comb_pallas import (
                comb_scan_pallas,
                comb_scan_ref,
            )

            fb_t = jnp.broadcast_to(fb, (T,)).astype(jnp.float32)
            f32c = jnp.float32(f_eff)

            def _fast(x, fbt, buf, pos, sf):
                y, buf2, pos2 = comb_const_delay(
                    x, fbt, buf, pos, d=fast_d, L=L
                )
                return y, buf2, pos2, jnp.full((), f32c, jnp.float32)

            def _slow(x, fbt, buf, pos, sf):
                # carried smoother state disagrees with the static
                # frequency (e.g. a foreign checkpoint): sequential path
                freq_t = jnp.broadcast_to(freq, (T,)).astype(jnp.float32)
                if _dfb.kernel_path_enabled() and C <= 128:
                    return comb_scan_pallas(
                        x, freq_t, fbt, buf, pos, sf, L=L, sr=sr,
                        smooth_alpha=float(smooth_alpha), chunk=512,
                        interpret=_dfb.kernel_interpret(),
                    )
                return comb_scan_ref(
                    x, freq_t, fbt, buf, pos, sf, L=L, sr=sr,
                    smooth_alpha=float(smooth_alpha),
                )

            ok = (st["sf"] < 0.0) | (st["sf"] == f32c)
            y, buf2, pos2, sf2 = jax.lax.cond(
                ok, _fast, _slow,
                x.astype(jnp.float32), fb_t, st["buf"], st["pos"], st["sf"],
            )
            ctx.set_state(self, {"buf": buf2, "pos": pos2, "sf": sf2})
            return y.astype(prec.AUDIO)

        if _dfb.kernel_path_enabled() and C <= 128:
            # sequential Mosaic kernel with the ring buffer in VMEM
            # scratch (ops/comb_pallas.py) — lax.scan re-materializes the
            # whole (L, C) buffer per sample.
            from pygmu2_tpu.ops.comb_pallas import comb_scan_pallas

            freq_t = jnp.broadcast_to(freq, (T,)).astype(jnp.float32)
            fb_t = jnp.broadcast_to(fb, (T,)).astype(jnp.float32)
            y, buf2, pos2, sf2 = comb_scan_pallas(
                x, freq_t, fb_t, st["buf"], st["pos"], st["sf"],
                L=L, sr=sr, smooth_alpha=float(smooth_alpha), chunk=512,
                interpret=_dfb.kernel_interpret(),
            )
            ctx.set_state(self, {"buf": buf2, "pos": pos2, "sf": sf2})
            return y.astype(prec.AUDIO)

        def step(carry, inp):
            buf, pos, sf = carry["buf"], carry["pos"], carry["sf"]
            xi, fi, fbi = inp
            sf = jnp.where(sf < 0.0, fi, sf + (fi - sf) * smooth_alpha)
            delay = jnp.clip(
                jnp.round(sr / jnp.maximum(sf, 1.0)).astype(jnp.int32), 1, L - 1
            )
            read = jnp.mod(pos - delay, L).astype(jnp.int32)
            delayed = jax.lax.dynamic_slice(buf, (read, jnp.int32(0)), (1, C))[0]
            out = xi + fbi * delayed
            buf = jax.lax.dynamic_update_slice(buf, out[None], (pos, jnp.int32(0)))
            pos = jnp.mod(pos + 1, L)
            return {"buf": buf, "pos": pos, "sf": sf}, out

        final, y = jax.lax.scan(step, st, (x, freq, fb), unroll=32)
        ctx.set_state(self, final)
        return y.astype(prec.AUDIO)

    def __repr__(self) -> str:
        return f"CombPE(source={type(self._source).__name__})"


class KarplusStrongPE(SourcePE):
    """Plucked string: noise-filled delay line with averaging feedback and
    a fractional-delay allpass. Extent (0, ∞); crop to taste."""

    def __init__(
        self,
        frequency: float,
        rho: float = 0.996,
        duration: int | None = None,
        rho_damping: float | None = None,
        amplitude: float = 0.3,
        seed: int | None = None,
        channels: int = 1,
    ):
        if frequency <= 0:
            raise ValueError(f"frequency must be positive, got {frequency}")
        if not (0 < rho <= 1.0):
            raise ValueError(f"rho must be in (0, 1], got {rho}")
        if amplitude <= 0:
            raise ValueError(f"amplitude must be positive, got {amplitude}")
        two_phase = duration is not None and rho_damping is not None
        if two_phase:
            if duration < 0:
                raise ValueError(f"duration must be >= 0, got {duration}")
            if not (0 < rho_damping <= 1.0):
                raise ValueError(
                    f"rho_damping must be in (0, 1], got {rho_damping}"
                )
        self._frequency = float(frequency)
        self._rho = float(rho)
        self._duration_param = duration if two_phase else None
        self._rho_damping = float(rho_damping) if two_phase else None
        self._amplitude = float(amplitude)
        self._seed = seed
        self._channels = channels

    @property
    def frequency(self) -> float:
        return self._frequency

    @property
    def rho(self) -> float:
        return self._rho

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        return Extent(0, None)

    def _excitation(self, delay_len: int) -> np.ndarray:
        rng = np.random.default_rng(self._seed)
        noise = rng.standard_normal(delay_len).astype(np.float32)
        return noise * (self._amplitude / (np.max(np.abs(noise)) + 1e-9))

    def _trace(self, ctx):
        sr = ctx.sample_rate
        delay_float = sr / self._frequency
        delay_len = max(2, int(math.floor(delay_float)))
        frac = min(1.0, max(0.0, delay_float - delay_len))
        allpass_c = (1.0 - frac) / (1.0 + frac)

        st, _ = ctx.state(
            self,
            init=lambda: {
                "buf": jnp.asarray(self._excitation(delay_len)),
                "r": jnp.zeros((), jnp.int32),
                "ap_in": jnp.zeros((), jnp.float32),
                "ap_out": jnp.zeros((), jnp.float32),
            },
        )

        t = ctx.times()
        if self._duration_param is not None:
            rho_t = jnp.where(
                t >= self._duration_param, self._rho_damping, self._rho
            ).astype(jnp.float32)
        else:
            rho_t = jnp.full((ctx.duration,), self._rho, jnp.float32)
        active = t >= 0  # string exists from t=0; don't advance state before

        if delay_len >= 16:
            # block-parallel fast path (ops/ks_block.py): the string's
            # dependence distance is delay_len - 1, so blocks of that
            # size vectorize; only the rare partially-active render
            # (start < 0) falls back to the sequential path.
            from pygmu2_tpu.ops.ks_block import ks_blocked
            from pygmu2_tpu.ops.ks_pallas import ks_scan_pallas, ks_scan_ref

            def _fast(rho_t, active, buf, r, ai, ao):
                return ks_blocked(
                    rho_t, buf, r, ai, ao,
                    L=delay_len, allpass_c=float(allpass_c),
                )

            def _slow(rho_t, active, buf, r, ai, ao):
                if _dfb.kernel_path_enabled():
                    return ks_scan_pallas(
                        rho_t, active, buf, r, ai, ao,
                        L=delay_len, allpass_c=float(allpass_c), chunk=512,
                        interpret=_dfb.kernel_interpret(),
                    )
                return ks_scan_ref(
                    rho_t, active, buf, r, ai, ao,
                    L=delay_len, allpass_c=float(allpass_c),
                )

            y, buf2, r2, ai2, ao2 = jax.lax.cond(
                jnp.all(active), _fast, _slow,
                rho_t, active, st["buf"], st["r"], st["ap_in"], st["ap_out"],
            )
            ctx.set_state(
                self, {"buf": buf2, "r": r2, "ap_in": ai2, "ap_out": ao2}
            )
            out = y.astype(prec.AUDIO)[:, None]
            if self._channels > 1:
                out = jnp.tile(out, (1, self._channels))
            return out

        if _dfb.kernel_path_enabled():
            # sequential Mosaic kernel (ops/ks_pallas.py)
            from pygmu2_tpu.ops.ks_pallas import ks_scan_pallas

            y, buf2, r2, ai2, ao2 = ks_scan_pallas(
                rho_t, active, st["buf"], st["r"], st["ap_in"], st["ap_out"],
                L=delay_len, allpass_c=float(allpass_c), chunk=512,
                interpret=_dfb.kernel_interpret(),
            )
            ctx.set_state(
                self, {"buf": buf2, "r": r2, "ap_in": ai2, "ap_out": ao2}
            )
            out = y.astype(prec.AUDIO)[:, None]
            if self._channels > 1:
                out = jnp.tile(out, (1, self._channels))
            return out

        def step(carry, inp):
            rho_eff, act = inp
            buf, r = carry["buf"], carry["r"]
            r_next = jnp.mod(r + 1, delay_len)
            out_val = rho_eff * (buf[r] + buf[r_next]) * 0.5
            ap_out = (
                allpass_c * out_val + carry["ap_in"] - allpass_c * carry["ap_out"]
            )
            new = {
                "buf": buf.at[r].set(ap_out),
                "r": r_next,
                "ap_in": out_val,
                "ap_out": ap_out,
            }
            carry = jax.tree_util.tree_map(
                lambda n, o: jnp.where(act, n, o), new, carry
            )
            return carry, jnp.where(act, ap_out, 0.0)

        final, y = jax.lax.scan(step, st, (rho_t, active), unroll=32)
        ctx.set_state(self, final)
        out = y.astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            out = jnp.tile(out, (1, self._channels))
        return out

    def __repr__(self) -> str:
        return (
            f"KarplusStrongPE(frequency={self._frequency}, rho={self._rho}, "
            f"channels={self._channels})"
        )

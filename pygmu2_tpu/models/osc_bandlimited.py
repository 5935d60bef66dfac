"""Band-limited oscillators: BlitSawPE, SuperSawPE, AnalogOscPE.

TPU-native rebuilds of:
- BlitSawPE  (reference: src/pygmu2/blit_saw_pe.py:25-299) — Dirichlet
  kernel BLIT integrated by a leaky one-pole; the integrator is a
  *linear* recurrence, so it runs as the parallel affine scan, and the
  phase accumulates by prefix sum — no per-sample loop anywhere.
- SuperSawPE (reference: src/pygmu2/super_saw_pe.py:25-342) — N detuned
  BLIT saws. Instead of N child PE objects, the voices vectorize as one
  (T, voices) batch inside a single node: detune ratios scale the phase
  increments, mix gains weight the sum — the classic TPU
  batch-over-voices layout.
- AnalogOscPE (reference: src/pygmu2/analog_osc_pe.py:34-267) —
  polyBLEP rectangle and duty-morphed saw/triangle (integrated slope +
  BLEP residuals; the integral is a prefix sum).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.ops.linrec import affine_scan_1
from pygmu2_tpu.ops.trig import dirichlet_blit


def _param_extent(pe, params) -> Extent:
    ext = Extent(None, None)
    for p in params:
        if isinstance(p, ProcessingElement):
            ext = ext.intersection(p.extent())
    return ext


class BlitSawPE(ProcessingElement):
    """Band-limited sawtooth via BLIT + leaky integrator."""

    def __init__(
        self,
        frequency,
        amplitude=1.0,
        initial_phase: float = 0.0,
        m=None,
        leak: float = 0.999,
        channels: int = 1,
    ):
        self._frequency = frequency
        self._amplitude = amplitude
        self._initial_phase = float(np.asarray(initial_phase).reshape(-1)[0]) % 1.0
        self._m = m
        self._leak = leak
        self._channels = channels

    @property
    def frequency(self):
        return self._frequency

    @property
    def amplitude(self):
        return self._amplitude

    @property
    def m(self):
        return self._m

    @property
    def leak(self) -> float:
        return self._leak

    @property
    def initial_phase(self) -> float:
        return self._initial_phase

    def inputs(self) -> list[ProcessingElement]:
        return [
            p
            for p in (self._frequency, self._amplitude, self._m)
            if isinstance(p, ProcessingElement)
        ]

    def is_pure(self) -> bool:
        return False  # integrator state

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        return _param_extent(self, (self._frequency, self._amplitude, self._m))

    def _blit(self, ctx, freq, phase):
        """Dirichlet-kernel band-limited impulse train (AC-coupled).

        ``freq`` and ``phase`` arrive wide; the folding/range-reduction
        stays wide and only the two sins run native f32 — see
        ops/trig.py for why a plain f32 phase cast is not accurate
        enough here.
        """
        sr = ctx.sample_rate
        if self._m is None:
            m_f = sr / (2.0 * jnp.maximum(freq, 1.0))
            m = jnp.floor(m_f)
            m = m - (1.0 - jnp.mod(m, 2.0))  # force odd
            m = jnp.maximum(m, 1.0)
        else:
            m_vals = ctx.param(self._m, dtype=prec.WIDE)
            m = jnp.maximum(jnp.floor(m_vals), 1.0)
        P = sr / jnp.maximum(freq, 1.0)
        return dirichlet_blit(phase, m, P)

    def _trace(self, ctx):
        freq = ctx.param(self._frequency, dtype=prec.WIDE)
        amp = ctx.param(self._amplitude, dtype=prec.AUDIO)
        inc = freq / ctx.sample_rate

        st, _ = ctx.state(
            self,
            init=lambda: {
                "phase": jnp.asarray(self._initial_phase, prec.WIDE),
                "integ": jnp.asarray(0.0, prec.AUDIO),
            },
        )
        # Accumulate phase wide (drift-free over hours); the BLIT folds
        # wide and evaluates its transcendentals f32 (ops/trig.py), and
        # the leaky integrator runs f32 (leak=0.999 bounds its memory to
        # ~1e3 samples, so f32 rounding stays ~3e-6 RMS in the output).
        phase = jnp.mod(st["phase"] + jnp.cumsum(inc), 1.0)
        blit_ac = self._blit(ctx, freq, phase)

        # Leaky integrator y[n] = blit[n] + leak·y[n−1] — parallel scan.
        saw = affine_scan_1(
            jnp.full_like(blit_ac, self._leak), blit_ac, st["integ"]
        )
        ctx.set_state(self, {"phase": phase[-1], "integ": saw[-1]})

        samples = (saw * 2.0 * amp).astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            samples = jnp.tile(samples, (1, self._channels))
        return samples

    def __repr__(self) -> str:
        def s(p):
            return type(p).__name__ if isinstance(p, ProcessingElement) else str(p)

        m = "auto" if self._m is None else s(self._m)
        return (
            f"BlitSawPE(frequency={s(self._frequency)}, amplitude={s(self._amplitude)}, "
            f"m={m}, leak={self._leak}, channels={self._channels})"
        )


class SuperSawPE(ProcessingElement):
    """N detuned BLIT saws, vectorized as one (time, voices) batch."""

    MIX_EQUAL = "equal"
    MIX_CENTER_HEAVY = "center_heavy"
    MIX_LINEAR = "linear"

    def __init__(
        self,
        frequency,
        amplitude=1.0,
        voices: int = 7,
        detune_cents: float = 20.0,
        mix_mode: str = "center_heavy",
        channels: int = 1,
        randomize_phase: bool = True,
        seed: int | None = None,
        leak: float = 0.999,
    ):
        self._frequency = frequency
        self._amplitude = amplitude
        self._voices = max(1, voices)
        self._detune_cents = detune_cents
        self._mix_mode = mix_mode
        self._channels = channels
        self._leak = leak
        self._detune_ratios = self._compute_detune_ratios()
        self._mix_gains = self._compute_mix_gains()
        rng = np.random.default_rng(seed)
        self._init_phases = (
            rng.random(len(self._detune_ratios))
            if randomize_phase
            else np.zeros(len(self._detune_ratios))
        )

    @property
    def frequency(self):
        return self._frequency

    @property
    def amplitude(self):
        return self._amplitude

    @property
    def voices(self) -> int:
        return self._voices

    @property
    def detune_cents(self) -> float:
        return self._detune_cents

    @property
    def mix_mode(self) -> str:
        return self._mix_mode

    def _compute_detune_ratios(self) -> np.ndarray:
        if self._voices == 1 or self._detune_cents == 0:
            return np.array([1.0])
        cents = np.linspace(-self._detune_cents, self._detune_cents, self._voices)
        return 2.0 ** (cents / 1200.0)

    def _compute_mix_gains(self) -> np.ndarray:
        n = len(self._detune_ratios)
        if n == 1:
            return np.array([1.0])
        gains = np.ones(n, dtype=np.float64)
        if self._mix_mode == self.MIX_EQUAL:
            pass
        elif self._mix_mode == self.MIX_LINEAR:
            center = (n - 1) / 2.0
            d = np.abs(np.arange(n) - center)
            gains = 0.5 + 0.5 * (1.0 - d / d.max())
        elif self._mix_mode == self.MIX_CENTER_HEAVY:
            gains[:] = 0.5
            if n % 2 == 1:
                gains[n // 2] = 1.0
            else:
                gains[n // 2 - 1] = 1.0
                gains[n // 2] = 1.0
        else:
            raise ValueError(f"Unknown mix mode: {self._mix_mode}")
        return gains / np.sqrt(np.sum(gains**2))

    def inputs(self) -> list[ProcessingElement]:
        return [
            p
            for p in (self._frequency, self._amplitude)
            if isinstance(p, ProcessingElement)
        ]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        return _param_extent(self, (self._frequency, self._amplitude))

    def _trace(self, ctx):
        sr = ctx.sample_rate
        freq = ctx.param(self._frequency, dtype=prec.WIDE)  # (T,)
        amp = ctx.param(self._amplitude, dtype=prec.AUDIO)
        ratios = jnp.asarray(self._detune_ratios, prec.WIDE)  # (V,)
        gains = jnp.asarray(self._mix_gains, prec.AUDIO)
        V = ratios.shape[0]

        st, _ = ctx.state(
            self,
            init=lambda: {
                "phase": jnp.asarray(self._init_phases, prec.WIDE),
                "integ": jnp.zeros((V,), prec.AUDIO),
            },
        )
        # f64 is software-emulated on TPU, so keep only the drift-critical
        # phase math wide — and accumulate ONCE over (T,): each voice's
        # increment is the base increment scaled by its detune ratio, so
        # cumsum distributes (cumsum(inc·r_v) == cumsum(inc)·r_v) and the
        # old per-voice (T, V) f64 cumsum collapses to one (T,) pass plus
        # an outer product. The BLIT folds wide and evaluates its two
        # sins native f32 (ops/trig.py); the leaky integrator runs f32.
        cum = jnp.cumsum(freq / sr)  # (T,) f64
        phase = jnp.mod(
            st["phase"][None, :] + cum[:, None] * ratios[None, :], 1.0
        )

        # Per-voice BLIT (auto harmonic count, all voices share the rule).
        fv = jnp.maximum(freq[:, None] * ratios[None, :], 1.0)
        m_f = sr / (2.0 * fv)
        m = jnp.maximum(jnp.floor(m_f) - (1.0 - jnp.mod(jnp.floor(m_f), 2.0)), 1.0)
        P = sr / fv
        blit = dirichlet_blit(phase, m, P)

        saw = affine_scan_1(
            jnp.full_like(blit, self._leak), blit, st["integ"]
        )  # (T, V) f32
        ctx.set_state(self, {"phase": phase[-1], "integ": saw[-1]})

        mixed = (saw * 2.0) @ gains  # (T,)
        out = (mixed * amp).astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            out = jnp.tile(out, (1, self._channels))
        return out

    def __repr__(self) -> str:
        return (
            f"SuperSawPE(voices={self._voices}, detune_cents={self._detune_cents}, "
            f"mix_mode={self._mix_mode})"
        )


class AnalogOscPE(ProcessingElement):
    """polyBLEP rectangle / duty-morphed saw-triangle."""

    WAVE_RECTANGLE = "rectangle"
    WAVE_SAWTOOTH = "sawtooth"

    def __init__(
        self,
        frequency=440.0,
        duty_cycle=0.5,
        waveform: str = "rectangle",
        channels: int = 1,
    ):
        self._frequency = frequency
        self._duty_cycle = duty_cycle
        self._waveform = str(waveform).lower()
        self._channels = int(channels)
        if self._waveform not in (self.WAVE_RECTANGLE, self.WAVE_SAWTOOTH):
            raise ValueError(
                f"waveform must be 'rectangle' or 'sawtooth', got {waveform!r}"
            )
        if self._channels < 1:
            raise ValueError(f"channels must be >= 1, got {channels}")

    @property
    def frequency(self):
        return self._frequency

    @property
    def duty_cycle(self):
        return self._duty_cycle

    @property
    def waveform(self) -> str:
        return self._waveform

    def inputs(self) -> list[ProcessingElement]:
        return [
            p
            for p in (self._frequency, self._duty_cycle)
            if isinstance(p, ProcessingElement)
        ]

    def is_pure(self) -> bool:
        return not self.inputs()

    def channel_count(self) -> int:
        return self._channels

    def _compute_extent(self) -> Extent:
        return _param_extent(self, (self._frequency, self._duty_cycle))

    @staticmethod
    def _blep(t, dt):
        """4-point polyBLEP residual for a step at phase 0."""
        dt = jnp.maximum(dt, 1e-12)
        x = t / dt
        u = 2.0 - x
        y = jnp.where(t < 2.0 * dt, u**4, 0.0)
        v = 1.0 - x
        y = y - jnp.where(t < dt, 4.0 * v**4, 0.0)
        return y / 12.0

    @classmethod
    def _blep_residual(cls, t, dt):
        t = jnp.mod(t, 1.0)
        return cls._blep(t, dt) - cls._blep(1.0 - t, dt)

    @staticmethod
    def _saw_value(phase0, a):
        return jnp.where(
            phase0 < a,
            -1.0 + 2.0 * (phase0 / a),
            1.0 - 2.0 * ((phase0 - a) / (1.0 - a)),
        )

    def _trace(self, ctx):
        sr = ctx.sample_rate
        freq = ctx.param(self._frequency, dtype=prec.WIDE)
        duty = ctx.param(self._duty_cycle, dtype=prec.WIDE)
        dt = freq / sr
        dt_blep = jnp.clip(jnp.abs(dt), 1e-12, 0.5)
        edge = jnp.maximum(1e-5, 2.0 * dt_blep)
        duty = jnp.clip(duty, edge, 1.0 - edge)

        if self.is_pure():
            idx = ctx.times(prec.WIDE)
            phase = jnp.mod(idx * dt[0], 1.0)
            saw0 = None
        else:
            st, _ = ctx.state(
                self,
                init=lambda: {
                    "phase": jnp.asarray(0.0, prec.WIDE),
                    "saw": jnp.asarray(-1.0, prec.WIDE),
                },
            )
            incs = jnp.concatenate(
                [jnp.zeros((1,), prec.WIDE), jnp.cumsum(dt[:-1])]
            )
            phase = jnp.mod(st["phase"] + incs, 1.0)
            saw0 = st["saw"]

        if self._waveform == self.WAVE_RECTANGLE:
            base = jnp.where(phase < duty, 1.0, -1.0)
            y = (
                base
                + self._blep_residual(phase, dt_blep)
                - self._blep_residual(phase - duty, dt_blep)
            )
            if not self.is_pure():
                ctx.set_state(
                    self,
                    {
                        "phase": jnp.mod(st["phase"] + jnp.sum(dt), 1.0),
                        "saw": st["saw"],
                    },
                )
        else:
            a = 1.0 - duty
            u1 = 2.0 / a
            u2 = -2.0 / (1.0 - a)
            u = jnp.where(phase < a, u1, u2)
            delta = u2 - u1
            u_corr = (
                u
                + (-0.5 * delta) * self._blep_residual(phase, dt_blep)
                + (0.5 * delta) * self._blep_residual(phase - a, dt_blep)
            )
            dy = u_corr * dt
            if self.is_pure():
                y0 = self._saw_value(phase[0], a[0])
            else:
                y0 = saw0
            incs = jnp.concatenate([jnp.zeros((1,), prec.WIDE), jnp.cumsum(dy[:-1])])
            y = y0 + incs
            if not self.is_pure():
                ctx.set_state(
                    self,
                    {
                        "phase": jnp.mod(st["phase"] + jnp.sum(dt), 1.0),
                        "saw": y0 + jnp.sum(dy),
                    },
                )

        out = y.astype(prec.AUDIO)[:, None]
        if self._channels > 1:
            out = jnp.tile(out, (1, self._channels))
        return out

    def __repr__(self) -> str:
        return (
            f"AnalogOscPE(waveform={self._waveform!r}, channels={self._channels})"
        )

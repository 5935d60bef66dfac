"""Envelope follower and ADSR generators.

TPU-native rebuilds of:
- EnvelopePE     (reference: src/pygmu2/envelope_pe.py:25-271) — causal
  attack/release follower, PEAK or windowed-RMS detection, lookahead by
  pulling the future (legal: time is random-access).
- AdsrGatedPE    (reference: src/pygmu2/adsr_pe.py:30-193) — gate-driven
  ADSR with linear segments, IDLE/ATTACK/DECAY/SUSTAIN/RELEASE.
- AdsrTriggeredPE (reference: src/pygmu2/adsr_pe.py:199-335) — one-shot
  ADSR with fixed sustain_time, restarted by triggers.

TPU design: the symmetric follower (attack == release) is a linear
one-pole → parallel affine scan. The asymmetric follower and the ADSR
state machines are data-dependent recurrences → ``lax.scan`` with the
per-sample update as fused selects (the reference loops in Python /
Numba). The ADSR carries (stage, env, …) as a scalar state pytree.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.ops import diffable as _dfb
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement
from pygmu2_tpu.models.modes import DetectionMode
from pygmu2_tpu.ops.linrec import affine_scan_1

# ADSR stage codes.
_IDLE, _ATTACK, _DECAY, _SUSTAIN, _RELEASE = 0, 1, 2, 3, 4


class EnvelopePE(ProcessingElement):
    """Attack/release envelope follower with optional lookahead."""

    def state_decays(self) -> bool:
        return True  # follower state converges within a few time-constants

    def __init__(
        self,
        source: ProcessingElement,
        attack: float = 0.01,
        release: float = 0.1,
        lookahead: float = 0.0,
        mode: DetectionMode = DetectionMode.PEAK,
    ):
        self._source = source
        self._attack = max(0.0, attack)
        self._release = max(0.0, release)
        self._lookahead = max(0.0, min(lookahead, self._attack))
        self._mode = mode

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def attack(self) -> float:
        return self._attack

    @property
    def release(self) -> float:
        return self._release

    @property
    def lookahead(self) -> float:
        return self._lookahead

    @property
    def mode(self) -> DetectionMode:
        return self._mode

    def _fills_own_edges(self) -> bool:
        # IIR state rings past the source extent; the reference keeps
        # filtering the zero-padded input through its carried state
        # instead of clipping at the extent, so the decay tail is
        # audible. Opt out of the engine's central zero-fill.
        return True

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        return self._source.extent()

    def _rms(self, x, window: int):
        """Centered moving RMS with edge-replicate padding (matches
        scipy.ndimage.uniform_filter1d(mode='nearest'))."""
        if window <= 1:
            return x
        left = window // 2
        right = window - 1 - left
        sq = x * x
        padded = jnp.concatenate(
            [jnp.repeat(sq[:1], left, axis=0), sq, jnp.repeat(sq[-1:], right, axis=0)],
            axis=0,
        )
        csum = jnp.cumsum(padded, axis=0)
        csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)
        mean = (csum[window:] - csum[:-window]) / window
        return jnp.sqrt(jnp.maximum(mean, 0.0))

    def _trace(self, ctx):
        sr = ctx.sample_rate
        look = int(self._lookahead * sr)
        x = jnp.abs(ctx.pull(self._source, shift=look))

        if self._mode == DetectionMode.RMS:
            window = max(1, int(min(0.01, self._attack) * sr))
            x = self._rms(x, window)

        atk = 1.0 - math.exp(-1.0 / (self._attack * sr)) if self._attack > 0 else 1.0
        rel = 1.0 - math.exp(-1.0 / (self._release * sr)) if self._release > 0 else 1.0

        env0, _ = ctx.state(
            self, init=lambda: jnp.zeros((x.shape[1],), prec.AUDIO)
        )

        if atk == rel:
            # Linear one-pole — parallel in time.
            y = affine_scan_1(
                jnp.full_like(x, 1.0 - atk), atk * x, env0
            )
        elif _dfb.kernel_path_enabled() and x.shape[1] <= 128:
            # asymmetric follower: sequential Mosaic kernel
            from pygmu2_tpu.ops.envelope_pallas import envelope_ar_pallas

            y, _ef = envelope_ar_pallas(
                x.astype(jnp.float32), env0.astype(jnp.float32),
                atk=atk, rel=rel, interpret=_dfb.kernel_interpret(),
            )
        else:
            def step(env, xi):
                coeff = jnp.where(xi > env, atk, rel)
                nxt = env + coeff * (xi - env)
                return nxt, nxt

            _, y = jax.lax.scan(step, env0, x, unroll=32)
        ctx.set_state(self, y[-1])
        return y.astype(prec.AUDIO)

    def __repr__(self) -> str:
        return (
            f"EnvelopePE(source={type(self._source).__name__}, "
            f"attack={self._attack}, release={self._release}, "
            f"lookahead={self._lookahead}, mode={self._mode.value})"
        )


class _AdsrBase(ProcessingElement):
    """Shared pieces of the gated/triggered ADSR state machines."""

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 1

    def _segment_step(self, stage, env, sustain_level):
        """One linear-segment update; returns (stage', env')."""
        # ATTACK: ramp up, clip to 1 → DECAY
        env_a = env + self._attack_dvdt
        hit_a = env_a >= 1.0
        # DECAY: ramp down, clip to sustain → SUSTAIN
        env_d = env + self._decay_dvdt
        hit_d = env_d <= sustain_level
        # RELEASE: ramp down, clip to 0 → IDLE
        env_r = env + self._release_dvdt
        hit_r = env_r <= 0.0

        new_env = jnp.select(
            [
                stage == _IDLE,
                stage == _ATTACK,
                stage == _DECAY,
                stage == _SUSTAIN,
            ],
            [
                jnp.zeros_like(env),
                jnp.where(hit_a, 1.0, env_a),
                jnp.where(hit_d, sustain_level, env_d),
                jnp.full_like(env, sustain_level),
            ],
            default=jnp.where(hit_r, 0.0, env_r),
        )
        new_stage = jnp.select(
            [
                (stage == _ATTACK) & hit_a,
                (stage == _DECAY) & hit_d,
                (stage == _RELEASE) & hit_r,
            ],
            [
                jnp.full_like(stage, _DECAY),
                jnp.full_like(stage, _SUSTAIN),
                jnp.full_like(stage, _IDLE),
            ],
            default=stage,
        )
        return new_stage, new_env


class AdsrGatedPE(_AdsrBase):
    """Gate-driven ADSR: rising edge → attack, falling edge → release."""

    def __init__(
        self,
        gate,
        attack_time: float = 0.1,
        decay_time: float = 0.1,
        sustain_level: float = 0.5,
        release_time: float = 0.1,
    ):
        self._gate = gate
        self._attack_time = float(attack_time)
        self._decay_time = float(decay_time)
        self._sustain_level = float(sustain_level)
        self._release_time = float(release_time)
        sr = float(self.sample_rate)
        self._attack_dvdt = 1.0 / (self._attack_time * sr)
        self._decay_dvdt = (self._sustain_level - 1.0) / (self._decay_time * sr)
        self._release_dvdt = -self._sustain_level / (self._release_time * sr)

    def inputs(self) -> list[ProcessingElement]:
        return [self._gate]

    def _compute_extent(self) -> Extent:
        return self._gate.extent()

    def _trace(self, ctx):
        gate = ctx.pull(self._gate)[:, 0]
        init = {
            "stage": jnp.asarray(_IDLE, jnp.int32),
            # env accumulates per-sample slopes for seconds at a time; the
            # reference does this in python float64 — carry f64 (scalar) to
            # match within 1e-7 (f32 drifts ~3e-4 over long segments).
            "env": jnp.asarray(0.0, prec.WIDE),
            "prev_gate": jnp.asarray(0.0, prec.AUDIO),
        }
        st, _ = ctx.state(self, init=init)
        sus = self._sustain_level

        # Closed-form primary path (ops/adsr_block.py): the envelope
        # depends only on the gate's edge pattern and deterministic clip
        # crossings, so it factors into a tiny scan over the EDGES plus
        # one vectorized evaluation (OPTIMIZING.md 2c). The edge scan's
        # cost is linear in the CAP, not the actual edge count, so
        # dispatch is tiered by this block's edge count (8 / 32 /
        # sequential kernel) — see ops/adsr_block.adsr_tiered.
        from pygmu2_tpu.ops.adsr_block import adsr_tiered
        from pygmu2_tpu.ops.adsr_pallas import (
            adsr_scan_pallas,
            adsr_scan_ref,
            env_of_state,
        )

        kw = dict(
            dA=self._attack_dvdt,
            dD=self._decay_dvdt,
            dR=self._release_dvdt,
            sus=sus,
        )
        kst = jnp.stack(
            [
                st["stage"].astype(jnp.float32),
                st["env"].astype(jnp.float32),
                jnp.float32(0.0),
                st["prev_gate"].astype(jnp.float32),
            ]
        )
        g32 = gate.astype(jnp.float32)

        def _seq(g, s4):
            if _dfb.kernel_path_enabled():
                return adsr_scan_pallas(
                    g, s4, interpret=_dfb.kernel_interpret(), **kw
                )
            return adsr_scan_ref(g, s4, **kw)

        y, ns = adsr_tiered(g32, kst, seq_fn=_seq, **kw)
        ctx.set_state(
            self,
            {
                "stage": ns[0].astype(jnp.int32),
                "env": env_of_state(ns, **kw).astype(prec.WIDE),
                "prev_gate": ns[3].astype(prec.AUDIO),
            },
        )
        return y.astype(prec.AUDIO)[:, None]

    def __repr__(self) -> str:
        return (
            f"AdsrGatedPE(A={self._attack_time}, D={self._decay_time}, "
            f"S={self._sustain_level}, R={self._release_time})"
        )


class AdsrTriggeredPE(_AdsrBase):
    """One-shot ADSR with a fixed sustain time, restarted by triggers."""

    def __init__(
        self,
        trigger,
        attack_time: float = 0.1,
        decay_time: float = 0.1,
        sustain_time: float = 0.5,
        sustain_level: float = 0.5,
        release_time: float = 0.1,
    ):
        self._trigger = trigger
        self._attack_time = float(attack_time)
        self._decay_time = float(decay_time)
        self._sustain_time = float(sustain_time)
        self._sustain_level = float(sustain_level)
        self._release_time = float(release_time)
        sr = float(self.sample_rate)
        self._attack_dvdt = 1.0 / (self._attack_time * sr)
        self._decay_dvdt = (self._sustain_level - 1.0) / (self._decay_time * sr)
        self._release_dvdt = -self._sustain_level / (self._release_time * sr)
        self._sustain_samples = int(round(self._sustain_time * sr))

    def inputs(self) -> list[ProcessingElement]:
        return [self._trigger]

    def _compute_extent(self) -> Extent:
        return self._trigger.extent()

    def _trace(self, ctx):
        trig = ctx.pull(self._trigger)[:, 0]
        t = ctx.times()
        init = {
            "stage": jnp.asarray(_IDLE, jnp.int32),
            "env": jnp.asarray(0.0, prec.WIDE),  # see AdsrGatedPE note
            "sustain_ends_at": jnp.asarray(0, prec.INDEX),
        }
        st, _ = ctx.state(self, init=init)
        sus = self._sustain_level

        # Reference timing (adsr_pe.py:323-328): the sustain branch holds
        # one more sample than `sustain_samples` — the expiry check runs
        # pre-update on the transition sample, so the first *decremented*
        # output lands at entry + S + 2. Our count-based expiry fires one
        # sample earlier; S + 1 aligns them (golden parity:
        # tests/test_parity_control.py TestAdsrParity::test_triggered).
        S = self._sustain_samples + 1
        if 1 < S < (1 << 24):
            # closed-form primary path, tiered by trigger count with a
            # sequential fallback (see AdsrGatedPE._trace); the absolute
            # sustain deadline is converted to a samples-since-entry
            # count (see adsr_pallas)
            from pygmu2_tpu.ops.adsr_block import adsr_tiered
            from pygmu2_tpu.ops.adsr_pallas import (
                adsr_scan_pallas,
                adsr_scan_ref,
                env_of_state,
            )

            kw = dict(
                dA=self._attack_dvdt,
                dD=self._decay_dvdt,
                dR=self._release_dvdt,
                sus=sus,
            )
            t0 = t[0]
            in_sus = st["stage"] == _SUSTAIN
            # n_pre(t0) = S - 1 - (ends_at - t0), clamped into [0, S-1]
            n0 = jnp.where(
                in_sus,
                jnp.clip(
                    S - 1 - (st["sustain_ends_at"] - t0), 0, S - 1
                ).astype(jnp.float32),
                jnp.float32(0.0),
            )
            kst = jnp.stack(
                [
                    st["stage"].astype(jnp.float32),
                    st["env"].astype(jnp.float32),
                    n0,
                    jnp.float32(0.0),
                ]
            )
            g32 = trig.astype(jnp.float32)

            def _seq(g, s4):
                if _dfb.kernel_path_enabled():
                    return adsr_scan_pallas(
                        g, s4, sustain_samples=S,
                        interpret=_dfb.kernel_interpret(), **kw,
                    )
                return adsr_scan_ref(g, s4, sustain_samples=S, **kw)

            y, ns = adsr_tiered(
                g32, kst, seq_fn=_seq, sustain_samples=S, **kw
            )
            t_next = t0 + trig.shape[0]
            ends = jnp.where(
                ns[0] == float(_SUSTAIN),
                t_next + S - 1 - ns[2].astype(prec.INDEX),
                st["sustain_ends_at"],
            ).astype(prec.INDEX)
            ctx.set_state(
                self,
                {
                    "stage": ns[0].astype(jnp.int32),
                    "env": env_of_state(ns, **kw).astype(prec.WIDE),
                    "sustain_ends_at": ends,
                },
            )
            return y.astype(prec.AUDIO)[:, None]

        def step(carry, inp):
            g, now = inp
            out = carry["env"]
            stage = jnp.where(g > 0.0, _ATTACK, carry["stage"]).astype(jnp.int32)
            stage2, env = self._segment_step(stage, carry["env"], sus)
            # Entering SUSTAIN arms the timer; SUSTAIN expires → RELEASE.
            entered_sustain = (stage == _DECAY) & (stage2 == _SUSTAIN)
            ends = jnp.where(
                entered_sustain, now + self._sustain_samples, carry["sustain_ends_at"]
            )
            expire = (stage2 == _SUSTAIN) & (now >= ends)
            stage2 = jnp.where(expire, _RELEASE, stage2).astype(jnp.int32)
            return {"stage": stage2, "env": env, "sustain_ends_at": ends}, out

        final, out = jax.lax.scan(step, st, (trig, t), unroll=32)
        ctx.set_state(self, final)
        return out.astype(prec.AUDIO)[:, None]

    def __repr__(self) -> str:
        return (
            f"AdsrTriggeredPE(A={self._attack_time}, D={self._decay_time}, "
            f"S={self._sustain_level}@{self._sustain_time}s, R={self._release_time})"
        )

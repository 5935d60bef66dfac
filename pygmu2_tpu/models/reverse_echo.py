"""ReversePitchEchoPE — CCRMA-style pitch-shifting reverse echo.

TPU-native rebuild of the reference effect (reference:
src/pygmu2/reverse_pitch_echo_pe.py:30-716):

1. dual-read-head time-domain pitch shifter (heads 180° apart,
   crossfaded by distance from the write head),
2. pitch-shifted audio written into fixed blocks (double buffered),
3. completed blocks played back reversed (or alternating direction)
   under a Hann window,
4. windowed output fed back into the write path.

All parameters (block length, pitch ratio, feedback, alternate) are
scalar-or-PE. The recurrence is data-dependent (feedback through the
block buffers, state-fed read positions), so it runs as one ``lax.scan``
over time with the loop body fully vectorized over channels and the two
delay blocks carried as scan state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.ops import diffable as _dfb
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import ProcessingElement


class ReversePitchEchoPE(ProcessingElement):
    """Reverse echo with integrated time-domain pitch shifter."""

    _MAX_DELAY_SECONDS = 10.0
    _MIN_BLOCK_SAMPLES = 64
    _MAX_FEEDBACK = 0.995

    def __init__(
        self,
        source: ProcessingElement,
        block_seconds=0.25,
        pitch_ratio=1.0,
        feedback=0.85,
        alternate_direction=0.0,
        smoothing_samples: int = 2400,
        max_delay_seconds: float | None = None,
    ):
        self._source = source
        self._block_seconds = block_seconds
        self._pitch_ratio = pitch_ratio
        self._feedback = feedback
        self._alternate_direction = alternate_direction
        self._smoothing_samples = max(1, int(smoothing_samples))
        # TPU addition: the block buffers are carried scan state, so their
        # capacity is a compile-time constant — allow shrinking it when the
        # effect uses short blocks.
        self._max_delay_seconds = float(max_delay_seconds or self._MAX_DELAY_SECONDS)

    @property
    def source(self) -> ProcessingElement:
        return self._source

    @property
    def block_seconds(self):
        return self._block_seconds

    @property
    def pitch_ratio(self):
        return self._pitch_ratio

    @property
    def feedback(self):
        return self._feedback

    @property
    def alternate_direction(self):
        return self._alternate_direction

    def inputs(self) -> list[ProcessingElement]:
        out = [self._source]
        for p in (
            self._block_seconds,
            self._pitch_ratio,
            self._feedback,
            self._alternate_direction,
        ):
            if isinstance(p, ProcessingElement):
                out.append(p)
        return out

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _fills_own_edges(self) -> bool:
        # The echo rings past the source extent (feedback + the replayed
        # previous block); the reference produces this tail because it
        # never clips to extent (reverse_pitch_echo_pe.py renders from
        # carried buffers regardless of extent). Opt out of the engine's
        # central zero-fill so the tail survives.
        return True

    def _compute_extent(self) -> Extent:
        ext = self._source.extent()
        for p in (
            self._block_seconds,
            self._pitch_ratio,
            self._feedback,
            self._alternate_direction,
        ):
            if isinstance(p, ProcessingElement):
                ext = ext.intersection(p.extent()) or ext
        return ext

    def _trace(self, ctx):
        x = ctx.pull(self._source)  # (T, C)
        T, C = x.shape
        sr = float(ctx.sample_rate)
        max_delay = max(
            self._MIN_BLOCK_SAMPLES + 1, int(self._max_delay_seconds * sr)
        )
        pitch_len = max(2, int(sr / 60))

        block_v = ctx.param(self._block_seconds, dtype=prec.AUDIO)
        pitch_v = jnp.maximum(ctx.param(self._pitch_ratio, dtype=prec.AUDIO), 0.001)
        fb_v = jnp.clip(
            jnp.nan_to_num(ctx.param(self._feedback, dtype=prec.AUDIO)),
            -self._MAX_FEEDBACK,
            self._MAX_FEEDBACK,
        )
        alt_v = ctx.param(self._alternate_direction, dtype=prec.AUDIO)

        init_seconds = (
            0.25
            if isinstance(self._block_seconds, ProcessingElement)
            else float(self._block_seconds)
        )
        init_block = float(
            min(max(init_seconds * sr, self._MIN_BLOCK_SAMPLES), max_delay - 1)
        )

        st, _ = ctx.state(
            self,
            init=lambda: {
                "buf_a": jnp.zeros((max_delay, C), prec.AUDIO),
                "buf_b": jnp.zeros((max_delay, C), prec.AUDIO),
                "cur_is_a": jnp.asarray(1, jnp.int32),
                "pitch_buf": jnp.zeros((pitch_len, C), prec.AUDIO),
                "p_wpos": jnp.asarray(0, jnp.int32),
                "p_rpos": jnp.asarray(0.0, jnp.float32),
                "w_idx": jnp.asarray(0, jnp.int32),
                "r_idx": jnp.asarray(0, jnp.int32),
                "smoothed": jnp.asarray(init_block, jnp.float32),
                "cur_block": jnp.asarray(int(init_block), jnp.int32),
                "prev_block": jnp.asarray(0, jnp.int32),
                "reverse": jnp.asarray(1, jnp.int32),
            },
        )
        smooth_alpha = 1.0 / self._smoothing_samples
        min_block = self._MIN_BLOCK_SAMPLES
        max_block = max_delay - 1

        pallas_ok = (
            _dfb.kernel_path_enabled()
            and C <= 128
            and (2 * max_delay + pitch_len + 2) * 512 <= 10 * 2**20
        )

        def run_sequential(xf, fbv, st_in):
            """Per-sample path (Mosaic kernel in VMEM, else lax.scan).
            Returns (wet, new_state)."""
            if pallas_ok:
                from pygmu2_tpu.ops.reverse_echo_pallas import (
                    MISC_FIELDS,
                    reverse_echo_scan_pallas,
                )

                misc = jnp.stack(
                    [st_in[k].astype(jnp.float32) for k in MISC_FIELDS]
                )
                wet, ba2, bb2, pb2, misc2 = reverse_echo_scan_pallas(
                    xf,
                    block_v, pitch_v, fbv, alt_v,
                    st_in["buf_a"], st_in["buf_b"], st_in["pitch_buf"],
                    misc,
                    sr=sr, plen=pitch_len, cap=max_delay,
                    min_block=min_block, max_block=max_block,
                    smooth_alpha=smooth_alpha,
                    interpret=_dfb.kernel_interpret(),
                )
                return wet, {
                    "buf_a": ba2,
                    "buf_b": bb2,
                    "pitch_buf": pb2,
                    "cur_is_a": misc2[0].astype(jnp.int32),
                    "p_wpos": misc2[1].astype(jnp.int32),
                    "p_rpos": misc2[2],
                    "w_idx": misc2[3].astype(jnp.int32),
                    "r_idx": misc2[4].astype(jnp.int32),
                    "smoothed": misc2[5],
                    "cur_block": misc2[6].astype(jnp.int32),
                    "prev_block": misc2[7].astype(jnp.int32),
                    "reverse": misc2[8].astype(jnp.int32),
                }
            final, y = jax.lax.scan(
                _step, st_in, (xf, block_v, pitch_v, fbv, alt_v), unroll=32
            )
            return y, final

        # --- static-parameter block fast path (ops/reverse_echo_block) -
        # Engages when block_seconds is a static scalar whose sample
        # count is an exact f32 fixed point of the smoother, pitch_ratio
        # is a static near-unity scalar (kernel bypasses the shifter
        # bitwise), and alternate_direction is static. The recurrence
        # then only binds at block-swap granularity: one vectorized scan
        # step per block period instead of per sample.
        fast_Lb = None
        if (
            not ctx.param_is_pe(self._block_seconds)
            and not ctx.param_is_pe(self._pitch_ratio)
            and not ctx.param_is_pe(self._alternate_direction)
            and abs(float(self._pitch_ratio) - 1.0) < 1e-4
        ):
            import numpy as np

            blk32 = np.float32(
                np.float32(self._block_seconds) * np.float32(sr)
            )
            t32 = np.float32(
                np.round(
                    np.clip(
                        np.nan_to_num(blk32, nan=float(min_block)),
                        min_block,
                        max_block,
                    )
                )
            )
            if np.float32(init_block) == t32:
                fast_Lb = int(t32)

        if fast_Lb is not None:
            from pygmu2_tpu.ops.reverse_echo_block import (
                reverse_echo_aligned,
            )

            Lb = fast_Lb
            alternate = float(self._alternate_direction) >= 0.5

            def _fast(xf, fbv, st_in):
                (
                    wet, ba2, bb2, pb2, cia2, pw2, pr2, w2, prev2, rev2,
                ) = reverse_echo_aligned(
                    xf, fbv,
                    st_in["buf_a"], st_in["buf_b"], st_in["pitch_buf"],
                    st_in["cur_is_a"], st_in["p_wpos"], st_in["p_rpos"],
                    st_in["w_idx"], st_in["prev_block"], st_in["reverse"],
                    Lb=Lb, plen=pitch_len,
                    ratio=float(self._pitch_ratio), alternate=alternate,
                )
                return wet, {
                    "buf_a": ba2,
                    "buf_b": bb2,
                    "pitch_buf": pb2,
                    "cur_is_a": cia2,
                    "p_wpos": pw2,
                    "p_rpos": pr2,
                    "w_idx": w2,
                    "r_idx": w2,
                    "smoothed": st_in["smoothed"],
                    "cur_block": st_in["cur_block"],
                    "prev_block": prev2,
                    "reverse": rev2,
                }

            ok = (
                (st["smoothed"] == jnp.float32(Lb))
                & (st["cur_block"] == Lb)
                & (st["w_idx"] == st["r_idx"])
                & (st["w_idx"] >= 0)
                & (st["w_idx"] < Lb)
                & ((st["prev_block"] == 0) | (st["prev_block"] == Lb))
            )

        def _step(s, inp):
            xi, blk, ratio, fb, alt = inp

            target = jnp.round(
                jnp.clip(
                    jnp.nan_to_num(blk * sr, nan=float(min_block)),
                    min_block,
                    max_block,
                )
            )
            smoothed = s["smoothed"] + (target - s["smoothed"]) * smooth_alpha
            cur_block = jnp.where(
                s["w_idx"] == 0,
                jnp.clip(jnp.round(smoothed), min_block, max_block).astype(jnp.int32),
                s["cur_block"],
            )

            # --- pitch shifter: write, dual-head read ---
            pitch_buf = jax.lax.dynamic_update_slice(
                s["pitch_buf"], xi[None], (s["p_wpos"], jnp.int32(0))
            )
            p_wpos = jnp.mod(s["p_wpos"] + 1, pitch_len)

            pos = jnp.mod(s["p_rpos"], pitch_len)
            i0 = jnp.floor(pos).astype(jnp.int32)
            i1 = jnp.mod(i0 + 1, pitch_len)
            frac = pos - i0
            pos2 = jnp.mod(pos + pitch_len / 2.0, pitch_len)
            i2 = jnp.floor(pos2).astype(jnp.int32)
            i3 = jnp.mod(i2 + 1, pitch_len)
            frac2 = pos2 - i2
            dist = jnp.abs(s["p_rpos"] - p_wpos.astype(jnp.float32))
            dist = jnp.where(dist > pitch_len / 2.0, pitch_len - dist, dist)
            f = dist / (pitch_len / 2.0)
            s1 = (1.0 - frac) * pitch_buf[i0] + frac * pitch_buf[i1]
            s2 = (1.0 - frac2) * pitch_buf[i2] + frac2 * pitch_buf[i3]
            pitched = f * s1 + (1.0 - f) * s2
            near_unity = jnp.abs(ratio - 1.0) < 1e-4
            pitched = jnp.where(near_unity, xi, pitched)
            p_rpos = jnp.mod(s["p_rpos"] + ratio, float(pitch_len))

            # --- reverse playback of the previous block, Hann windowed ---
            # Slice both buffers (cheap) and pick per-scalar instead of
            # materializing a full-buffer select inside the scan.
            prev_block = s["prev_block"]
            cur_is_a = s["cur_is_a"]
            r_idx = s["r_idx"]
            idx = jnp.where(s["reverse"] == 1, prev_block - 1 - r_idx, r_idx)
            playing = (prev_block > 0) & (r_idx < prev_block) & (idx >= 0) & (idx < prev_block)
            wpos = jnp.where(
                prev_block > 1,
                r_idx.astype(jnp.float32) / jnp.maximum(prev_block - 1, 1),
                0.0,
            )
            window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * wpos)
            read_at = (jnp.clip(idx, 0, max_delay - 1), jnp.int32(0))
            wet_a = jax.lax.dynamic_slice(s["buf_a"], read_at, (1, C))[0]
            wet_b = jax.lax.dynamic_slice(s["buf_b"], read_at, (1, C))[0]
            wet_raw = jnp.where(cur_is_a == 1, wet_b, wet_a)
            wet = jnp.where(playing, wet_raw * window, 0.0)

            # --- write into the current block with feedback ---
            write_val = pitched + wet * fb

            def write_a(bufs):
                a, b = bufs
                return (
                    jax.lax.dynamic_update_slice(
                        a, write_val[None], (s["w_idx"], jnp.int32(0))
                    ),
                    b,
                )

            def write_b(bufs):
                a, b = bufs
                return (
                    a,
                    jax.lax.dynamic_update_slice(
                        b, write_val[None], (s["w_idx"], jnp.int32(0))
                    ),
                )

            buf_a, buf_b = jax.lax.cond(
                cur_is_a == 1, write_a, write_b, (s["buf_a"], s["buf_b"])
            )

            # --- advance; swap buffers when the block completes ---
            w_idx = s["w_idx"] + 1
            r_idx = r_idx + 1
            done = w_idx >= cur_block
            new = {
                "buf_a": buf_a,
                "buf_b": buf_b,
                "cur_is_a": jnp.where(done, 1 - cur_is_a, cur_is_a),
                "pitch_buf": pitch_buf,
                "p_wpos": p_wpos,
                "p_rpos": p_rpos,
                "w_idx": jnp.where(done, 0, w_idx),
                "r_idx": jnp.where(done, 0, r_idx),
                "smoothed": smoothed,
                "cur_block": cur_block,
                "prev_block": jnp.where(done, cur_block, prev_block),
                "reverse": jnp.where(
                    done,
                    jnp.where(alt >= 0.5, 1 - s["reverse"], 1),
                    s["reverse"],
                ),
            }
            return new, wet

        def _slow_scan(xf, fbv, st_in):
            # cond fallback for misaligned/restored state. Deliberately
            # the lax.scan body, NOT the Mosaic kernel: the remote TPU
            # compiler hangs (>9 min, reproduced in isolation) lowering
            # this kernel's custom call inside a lax.cond branch, while
            # both branches alone compile in seconds. Misaligned state is
            # the rare case (one partial chunk after a foreign restore);
            # steady-state traffic takes the fast branch.
            final, yy = jax.lax.scan(
                _step, st_in, (xf, block_v, pitch_v, fbv, alt_v), unroll=32
            )
            return yy, final

        if fast_Lb is not None:
            wet, new_st = jax.lax.cond(
                ok, _fast, _slow_scan,
                x.astype(jnp.float32), fb_v, st,
            )
        else:
            wet, new_st = run_sequential(x.astype(jnp.float32), fb_v, st)
        ctx.set_state(self, new_st)
        return wet.astype(prec.AUDIO)

    def __repr__(self) -> str:
        return f"ReversePitchEchoPE(source={type(self._source).__name__})"

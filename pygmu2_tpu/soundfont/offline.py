"""Fully-parallel offline MIDI rendering (the speed-of-light path).

The scanned renderer (synthesizer.render_midi_schedule) is sequential over
blocks; on TPU each tiny scan step pays fixed overheads. This module
splits the work by *rate* instead:

- **Control rate (host, numpy)**: one Python pass over blocks evaluates
  everything the reference computes per block per voice — closed-form
  envelopes/LFOs, release/death logic, pitch ratios, filter coefficients
  (incl. the clamped cutoff smoother), pan/gain ramps, oscillator base
  positions (float64, exact) — producing small (blocks, voices) arrays.
  This mirrors synthesizer._block_kernel's control section 1:1.

- **Audio rate (device, ONE jit launch, no scan)**: a fused parallel
  program: oscillator gather+lerp over (voices, samples), the per-voice
  lowpass as a single associative scan over the whole timeline (epoch
  boundaries reset state via zeroed transition matrices), per-block gain
  ramps, and the stereo mixdown reduction.

Output matches the scanned renderer to float32 round-off.
"""

from __future__ import annotations

import concurrent.futures
import math

import numpy as np

import jax
import jax.numpy as jnp

from pygmu2_tpu.soundfont.model import LoopMode
from pygmu2_tpu.soundfont.params import NON_AUDIBLE

LOG_NON_AUDIBLE = math.log(NON_AUDIBLE)

# Test hook: when True, _audio_pass takes the fused Pallas branches with
# interpret=True even off-TPU, so CPU CI covers the kernel integrations
# (window_osc_rows coordinates, lv_off packing, segment state threading)
# end to end. Set via tests only; never in production paths.
FORCE_PALLAS_INTERPRET = False

# Pitch-ratio ceiling the windowed-DMA oscillator is provisioned for:
# window length and loop-view guards cover one MIDI block of advance at
# ratio <= WINDOW_RATIO_BUCKET (3 octaves above the sample's root pitch).
# Schedules that can exceed it fall back to the XLA oscillator.
WINDOW_RATIO_BUCKET = 8


# ---- numpy twins of the closed-form control functions ------------------


def _exp_cutoff_np(x, xp=np):
    return xp.where(x < LOG_NON_AUDIBLE, 0.0, xp.exp(xp.minimum(x, 0.0)))


def _vol_env_np(t, p, released, rel_t, rel_level, xp=np):
    held = xp.where(
        t < p["v_att_start"],
        0.0,
        xp.where(
            t < p["v_hold_start"],
            p["v_att_slope"] * (t - p["v_att_start"]),
            xp.where(
                t < p["v_dec_start"],
                1.0,
                xp.maximum(
                    _exp_cutoff_np(p["v_dec_slope"] * (t - p["v_dec_start"]), xp),
                    p["v_sustain"],
                ),
            ),
        ),
    )
    rel = rel_level * _exp_cutoff_np(p["v_rel_slope"] * (t - rel_t), xp)
    return xp.where(released, rel, held)


def _mod_env_np(t, p, released, rel_t, rel_level, xp=np):
    held = xp.where(
        t < p["m_att_start"],
        0.0,
        xp.where(
            t < p["m_hold_start"],
            p["m_att_slope"] * (t - p["m_att_start"]),
            xp.where(
                t < p["m_dec_start"],
                1.0,
                xp.maximum(
                    p["m_dec_slope"] * (p["m_dec_end"] - t), p["m_sustain"]
                ),
            ),
        ),
    )
    rel = xp.maximum(
        rel_level * (1.0 - (t - rel_t) / xp.maximum(p["m_rel_dur"], 1e-9)), 0.0
    )
    return xp.where(released, rel, held)


def _lfo_np(t, delay, period, xp=np):
    active = period > 0.0
    safe = xp.maximum(period, 1e-9)
    phase = xp.mod(t - delay, safe) / safe
    tri = xp.where(
        phase < 0.25,
        4.0 * phase,
        xp.where(phase < 0.75, 4.0 * (0.5 - phase), 4.0 * (phase - 1.0)),
    )
    return xp.where(active & (t >= delay), tri, 0.0)


def compute_control(synth, par_np, ch_np, snap_idx):
    """Host control pass → dict of (B, P) float32/bool arrays.

    Fully vectorized over blocks: the sequential chains of the block
    kernel (voice time, release latch, position accumulation, liveness)
    become segment-wise cummax/cumsum along the block axis, with epochs
    (voice restarts) as segment boundaries. Matches
    ``Synthesizer._block_kernel``'s control section bit-for-bit in its
    float32 arithmetic.
    """
    return _compute_control_vectorized(synth, par_np, ch_np, snap_idx)


def _compute_control_loop(synth, par_np, ch_np, snap_idx):
    """Reference implementation (per-block Python loop)."""
    N = synth.block_size
    sr = float(synth.sample_rate)
    min_dur = synth._minimum_voice_duration
    B = len(snap_idx)
    P = synth.maximum_polyphony

    # Expand snapshots to per-block views (cheap fancy indexing).
    par = {k: v[snap_idx].astype(np.float32) if v.dtype == np.float64 else v[snap_idx] for k, v in par_np.items()}
    par_f64 = {k: par_np[k][snap_idx] for k in ("smp_start", "smp_end", "loop_start", "loop_end", "srate_ratio")}
    ch = {k: v[snap_idx] for k, v in ch_np.items()}

    out = {
        k: np.zeros((B, P), np.float32)
        for k in (
            "ratio",
            "b0",
            "b1",
            "b2",
            "a1",
            "a2",
            "gl",
            "gr",
            "pgl",
            "pgr",
        )
    }
    out["base_pos"] = np.zeros((B, P), np.float64)
    out["looping"] = np.zeros((B, P), bool)
    out["alive"] = np.zeros((B, P), bool)
    out["fresh"] = np.zeros((B, P), bool)
    out["flt_on"] = np.zeros((B, P), bool)

    # dynamic state mirrors ((P,) numpy)
    d_epoch = np.full(P, -1, np.int32)
    d_vt = np.zeros(P, np.int64)
    d_released = np.zeros(P, bool)
    d_rel_t = np.zeros(P, np.float32)
    d_rel_vol = np.zeros(P, np.float32)
    d_rel_mod = np.zeros(P, np.float32)
    d_pos = np.zeros(P, np.float64)
    d_smc = np.zeros(P, np.float32)
    d_pgl = np.zeros(P, np.float32)
    d_pgr = np.zeros(P, np.float32)
    d_active = np.zeros(P, bool)

    rpo = np.float32(1.0 - 1.0 / math.sqrt(2.0))

    for b in range(B):
        p = {k: v[b] for k, v in par.items()}
        p64 = {k: v[b] for k, v in par_f64.items()}
        chb = {k: v[b] for k, v in ch.items()}
        chan = par["channel"][b]

        fresh = p["epoch"] != d_epoch
        vt = np.where(fresh, 0, d_vt)
        released = np.where(fresh, False, d_released)
        rel_t = np.where(fresh, 0.0, d_rel_t).astype(np.float32)
        rel_vol = np.where(fresh, 0.0, d_rel_vol).astype(np.float32)
        rel_mod = np.where(fresh, 0.0, d_rel_mod).astype(np.float32)
        pos = np.where(fresh, p64["smp_start"], d_pos)
        smc = np.where(fresh, p["cutoff"], d_smc).astype(np.float32)
        pgl = np.where(fresh, 0.0, d_pgl).astype(np.float32)
        pgr = np.where(fresh, 0.0, d_pgr).astype(np.float32)
        active = np.where(fresh, p["note_gain"] >= NON_AUDIBLE, d_active)

        hold = chb["ch_hold"][chan]
        t_now = (vt / sr).astype(np.float32)
        want = (
            active
            & ~released
            & (p["release_req"] <= vt)
            & (vt >= min_dur)
            & ~hold
        )
        rel_t = np.where(want, t_now, rel_t)
        rel_vol = np.where(
            want, _vol_env_np(t_now, p, False, rel_t, rel_vol), rel_vol
        ).astype(np.float32)
        rel_mod = np.where(
            want, _mod_env_np(t_now, p, False, rel_t, rel_mod), rel_mod
        ).astype(np.float32)
        released = released | want

        t_end = ((vt + N) / sr).astype(np.float32)
        vol_env = _vol_env_np(t_end, p, released, rel_t, rel_vol)
        mod_env = _mod_env_np(t_end, p, released, rel_t, rel_mod)
        vib = _lfo_np(t_end, p["vib_delay"], p["vib_period"])
        mlf = _lfo_np(t_end, p["mod_delay"], p["mod_period"])

        dead_vol = (vol_env <= NON_AUDIBLE) & (
            released | (t_end >= p["v_dec_start"])
        )

        pitch = (
            p["key"]
            + (np.float32(0.01) * chb["ch_mod"][chan] + p["vib2pitch"]) * vib
            + p["mod2pitch"] * mlf
            + p["modenv2pitch"] * mod_env
            + chb["ch_pitch"][chan]
        )
        pitch_change = p["pitch_scale"] * (pitch - p["root_key"]) + p["tune"]
        ratio = p64["srate_ratio"] * 2.0 ** (pitch_change.astype(np.float64) / 12.0)

        looping = (p["loop_mode"] == int(LoopMode.CONTINUOUS)) | (
            (p["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)) & ~released
        )
        loop_len = np.maximum(p64["loop_end"] - p64["loop_start"], 1.0)
        pos_wrapped = np.where(
            looping,
            np.mod(pos - p64["loop_start"], loop_len) + p64["loop_start"],
            pos,
        )
        dead_osc = ~looping & (pos >= p64["smp_end"])
        new_pos = pos_wrapped + N * ratio
        new_pos = np.where(
            looping & (new_pos >= p64["loop_end"]),
            np.mod(new_pos - p64["loop_start"], loop_len) + p64["loop_start"],
            new_pos,
        )

        # filter coefficients (f32 math like the kernel)
        res = p["resonance"]
        cents = p["modlfo2cut"] * mlf + p["modenv2cut"] * mod_env
        dynamic = (p["modlfo2cut"] != 0.0) | (p["modenv2cut"] != 0.0)
        new_cut = (2.0 ** (cents / 1200.0)).astype(np.float32) * p["cutoff"]
        smc = np.where(
            dynamic, np.clip(new_cut, 0.5 * smc, 2.0 * smc), smc
        ).astype(np.float32)
        cutoff = np.where(dynamic, smc, p["cutoff"])
        flt_on = cutoff < 0.499 * sr
        q = res - rpo / (1.0 + 6.0 * (res - 1.0))
        w = np.float32(2.0 * np.pi) * cutoff / np.float32(sr)
        cosw = np.cos(w)
        alpha = np.sin(w) / (2.0 * np.maximum(q, 1e-6))
        a0 = 1.0 + alpha
        b0 = ((1.0 - cosw) / 2.0) / a0
        b1 = (1.0 - cosw) / a0
        b2 = b0
        a1 = (-2.0 * cosw) / a0
        a2 = (1.0 - alpha) / a0
        # Inactive filter = identity passthrough: the y-chain then carries
        # the raw samples, matching the reference's state update.
        b0 = np.where(flt_on, b0, 1.0).astype(np.float32)
        b1 = np.where(flt_on, b1, 0.0).astype(np.float32)
        b2 = np.where(flt_on, b2, 0.0).astype(np.float32)
        a1 = np.where(flt_on, a1, 0.0).astype(np.float32)
        a2 = np.where(flt_on, a2, 0.0).astype(np.float32)

        ve = chb["ch_vol_exp"][chan]
        mix_gain = p["note_gain"] * ve * ve * vol_env.astype(np.float32)
        dyn_vol = p["modlfo2vol"] > 0.05
        mix_gain = mix_gain * np.where(
            dyn_vol, (10.0 ** (0.05 * p["modlfo2vol"] * mlf)).astype(np.float32), 1.0
        )
        angle = np.float32(np.pi / 200.0) * (
            chb["ch_pan"][chan] + p["inst_pan"] + np.float32(50.0)
        )
        gl = np.where(
            angle <= 0.0,
            mix_gain,
            np.where(angle >= np.float32(np.pi / 2), 0.0, mix_gain * np.cos(angle)),
        ).astype(np.float32)
        gr = np.where(
            angle <= 0.0,
            0.0,
            np.where(angle >= np.float32(np.pi / 2), mix_gain, mix_gain * np.sin(angle)),
        ).astype(np.float32)
        first_block = vt == 0
        pgl = np.where(first_block, gl, pgl)
        pgr = np.where(first_block, gr, pgr)

        alive = active & ~dead_vol & ~dead_osc

        out["ratio"][b] = ratio.astype(np.float32)
        out["base_pos"][b] = pos_wrapped
        out["looping"][b] = looping
        out["alive"][b] = alive
        out["fresh"][b] = fresh
        out["flt_on"][b] = flt_on
        for k, v in (("b0", b0), ("b1", b1), ("b2", b2), ("a1", a1), ("a2", a2)):
            out[k][b] = v
        out["gl"][b] = gl
        out["gr"][b] = gr
        out["pgl"][b] = pgl
        out["pgr"][b] = pgr

        d_epoch = par["epoch"][b].copy()
        d_vt = vt + N
        d_released = released
        d_rel_t = rel_t
        d_rel_vol = rel_vol
        d_rel_mod = rel_mod
        d_pos = new_pos
        d_smc = smc
        d_pgl = gl
        d_pgr = gr
        d_active = alive

    # Static per-voice-per-block sample geometry for the device pass.
    out["loop_start"] = par_f64["loop_start"].astype(np.float64)
    out["loop_len"] = np.maximum(
        par_f64["loop_end"] - par_f64["loop_start"], 1.0
    )
    out["smp_end"] = par_f64["smp_end"]
    out["lv_off"] = par["lv_off"]
    return out


def _compute_control_vectorized(synth, par_np, ch_np, snap_idx):
    N = synth.block_size
    sr = float(synth.sample_rate)
    min_dur = synth._minimum_voice_duration
    B = len(snap_idx)
    P = synth.maximum_polyphony
    rpo = np.float32(1.0 - 1.0 / math.sqrt(2.0))

    par = {
        k: (v[snap_idx].astype(np.float32) if v.dtype == np.float64 else v[snap_idx])
        for k, v in par_np.items()
    }
    par64 = {
        k: par_np[k][snap_idx]
        for k in ("smp_start", "smp_end", "loop_start", "loop_end", "srate_ratio")
    }
    ch = {k: v[snap_idx] for k, v in ch_np.items()}
    chan = par["channel"]  # (B, P)
    b_idx = np.arange(B)[:, None]

    def chv(name):  # per-voice view of a channel field
        return np.take_along_axis(ch[name], chan, axis=1)

    # --- segments (epochs) ---
    epoch = par["epoch"]
    fresh = np.ones((B, P), bool)
    fresh[1:] = epoch[1:] != epoch[:-1]
    seg_start = np.maximum.accumulate(np.where(fresh, b_idx, -1), axis=0)
    vt = ((b_idx - seg_start) * N).astype(np.int64)
    t_now = (vt / sr).astype(np.float32)
    t_end = ((vt + N) / sr).astype(np.float32)

    def seg_gather(arr):
        """arr value at each row's segment start."""
        return np.take_along_axis(arr, seg_start, axis=0)

    # --- release latch ---
    hold = chv("ch_hold")
    eligible = (par["release_req"] <= vt) & (vt >= min_dur) & ~hold
    # latch within segment: count eligible rows since the segment start
    elig_cs = np.cumsum(eligible, axis=0)
    excl = np.zeros_like(elig_cs)
    excl[1:] = elig_cs[:-1]
    elig_in_seg = elig_cs - seg_gather(excl)
    released = elig_in_seg > 0
    # the first eligible row of each segment is where the release lands
    first_elig = eligible & (elig_in_seg == 1)
    marker_row = np.where(first_elig, b_idx, -1)
    marker_cm = np.maximum.accumulate(marker_row, axis=0)
    rel_valid = marker_cm >= seg_start
    rel_row = np.clip(marker_cm, 0, B - 1)
    rel_t = np.where(
        released & rel_valid,
        np.take_along_axis(t_now, rel_row, axis=0),
        0.0,
    ).astype(np.float32)
    released = released & rel_valid

    # --- envelopes / LFOs ---
    rel_vol = _vol_env_np(rel_t, par, False, rel_t, 0.0).astype(np.float32)
    rel_mod = _mod_env_np(rel_t, par, False, rel_t, 0.0).astype(np.float32)
    vol_env = _vol_env_np(t_end, par, released, rel_t, rel_vol)
    mod_env = _mod_env_np(t_end, par, released, rel_t, rel_mod)
    vib = _lfo_np(t_end, par["vib_delay"], par["vib_period"])
    mlf = _lfo_np(t_end, par["mod_delay"], par["mod_period"])

    dead_vol = (vol_env <= NON_AUDIBLE) & (released | (t_end >= par["v_dec_start"]))

    # --- pitch / oscillator advance ---
    pitch = (
        par["key"]
        + (np.float32(0.01) * chv("ch_mod") + par["vib2pitch"]) * vib
        + par["mod2pitch"] * mlf
        + par["modenv2pitch"] * mod_env
        + chv("ch_pitch")
    )
    pitch_change = par["pitch_scale"] * (pitch - par["root_key"]) + par["tune"]
    ratio = par64["srate_ratio"] * 2.0 ** (pitch_change.astype(np.float64) / 12.0)

    looping = (par["loop_mode"] == int(LoopMode.CONTINUOUS)) | (
        (par["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)) & ~released
    )
    advance = N * ratio
    adv_cs = np.cumsum(advance, axis=0)
    adv_excl = np.zeros_like(adv_cs)
    adv_excl[1:] = adv_cs[:-1]
    base = par64["smp_start"] + (adv_excl - seg_gather(adv_excl))

    # LOOP_UNTIL_NOTE_OFF: after release the head leaves the loop from its
    # *wrapped* position — re-anchor the unwrapped chain at the release row.
    loop_len = np.maximum(par64["loop_end"] - par64["loop_start"], 1.0)
    mode3 = par["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)
    if mode3.any():
        base_at_rel = np.take_along_axis(base, rel_row, axis=0)
        wrapped_at_rel = (
            np.mod(base_at_rel - par64["loop_start"], loop_len) + par64["loop_start"]
        )
        fix = mode3 & released
        base = np.where(fix, base - base_at_rel + wrapped_at_rel, base)
    dead_osc = ~looping & (base >= par64["smp_end"])
    # Pre-wrap looping bases so the device wrap needs no integer mod.
    base = np.where(
        looping,
        np.mod(base - par64["loop_start"], loop_len) + par64["loop_start"],
        base,
    )

    # --- filter coefficients ---
    res = par["resonance"]
    dynamic = (par["modlfo2cut"] != 0.0) | (par["modenv2cut"] != 0.0)
    if dynamic.any():
        # clamped smoother is sequential; tiny loop over blocks for the
        # dynamic voices only.
        cents = par["modlfo2cut"] * mlf + par["modenv2cut"] * mod_env
        new_cut = (2.0 ** (cents / 1200.0)).astype(np.float32) * par["cutoff"]
        smc = np.empty((B, P), np.float32)
        prev = par["cutoff"][0].copy()
        for b in range(B):
            prev = np.where(fresh[b], par["cutoff"][b], prev)
            prev = np.where(
                dynamic[b],
                np.clip(new_cut[b], 0.5 * prev, 2.0 * prev),
                prev,
            ).astype(np.float32)
            smc[b] = prev
        cutoff = np.where(dynamic, smc, par["cutoff"])
    else:
        cutoff = par["cutoff"]
    flt_on = cutoff < 0.499 * sr
    q = res - rpo / (1.0 + 6.0 * (res - 1.0))
    w = np.float32(2.0 * np.pi) * cutoff / np.float32(sr)
    cosw = np.cos(w)
    alpha = np.sin(w) / (2.0 * np.maximum(q, 1e-6))
    a0 = 1.0 + alpha
    b0 = np.where(flt_on, ((1.0 - cosw) / 2.0) / a0, 1.0).astype(np.float32)
    b1 = np.where(flt_on, (1.0 - cosw) / a0, 0.0).astype(np.float32)
    b2 = np.where(flt_on, ((1.0 - cosw) / 2.0) / a0, 0.0).astype(np.float32)
    a1 = np.where(flt_on, (-2.0 * cosw) / a0, 0.0).astype(np.float32)
    a2 = np.where(flt_on, (1.0 - alpha) / a0, 0.0).astype(np.float32)

    # --- gains ---
    ve = chv("ch_vol_exp")
    mix_gain = par["note_gain"] * ve * ve * vol_env.astype(np.float32)
    dyn_vol = par["modlfo2vol"] > 0.05
    mix_gain = mix_gain * np.where(
        dyn_vol, (10.0 ** (0.05 * par["modlfo2vol"] * mlf)).astype(np.float32), 1.0
    )
    angle = np.float32(np.pi / 200.0) * (
        chv("ch_pan") + par["inst_pan"] + np.float32(50.0)
    )
    gl = np.where(
        angle <= 0.0,
        mix_gain,
        np.where(angle >= np.float32(np.pi / 2), 0.0, mix_gain * np.cos(angle)),
    ).astype(np.float32)
    gr = np.where(
        angle <= 0.0,
        0.0,
        np.where(angle >= np.float32(np.pi / 2), mix_gain, mix_gain * np.sin(angle)),
    ).astype(np.float32)
    pgl = np.where(fresh, gl, np.roll(gl, 1, axis=0))
    pgr = np.where(fresh, gr, np.roll(gr, 1, axis=0))

    # --- liveness chain ---
    active0 = par["note_gain"] >= NON_AUDIBLE
    dead = dead_vol | dead_osc
    dead_cs = np.cumsum(dead, axis=0)
    dead_excl = np.zeros_like(dead_cs)
    dead_excl[1:] = dead_cs[:-1]
    dead_before = (dead_excl - seg_gather(dead_excl)) > 0
    alive = active0 & ~dead_before & ~dead

    return {
        "ratio": ratio.astype(np.float32),
        "base_pos": base,
        "looping": looping,
        "alive": alive,
        "fresh": fresh,
        "flt_on": flt_on,
        "b0": b0,
        "b1": b1,
        "b2": b2,
        "a1": a1,
        "a2": a2,
        "gl": gl,
        "gr": gr,
        "pgl": pgl,
        "pgr": pgr,
        "loop_start": par64["loop_start"].astype(np.float64),
        "loop_len": np.maximum(par64["loop_end"] - par64["loop_start"], 1.0),
        "smp_end": par64["smp_end"],
        "lv_off": par["lv_off"],
    }


# ---- device pass --------------------------------------------------------


def _split_base(ctrl):
    """(base_int i32, base_frac f32) from ctrl (packed or f64)."""
    if "base_int" in ctrl:
        return ctrl["base_int"], ctrl["base_frac"]
    base = ctrl["base_pos"]
    bi = jnp.floor(base)
    return bi.astype(jnp.int32), (base - bi).astype(jnp.float32)


def window_w(N: int, bucket: int, align: int = 128) -> int:
    """Window length for the windowed-DMA oscillator: covers one MIDI
    block at pitch ratio <= bucket, plus the window-start alignment
    slack, plus the second lerp tap."""
    w = N * bucket + align + 4
    return -(-w // 128) * 128


def window_osc_rows(ctrl, W: int, L_ext: int, align: int = 128):
    """Control rows for the windowed-DMA oscillator kernel (large fonts).

    Remaps oscillator coordinates into the extended wavetable
    (``Synthesizer.wave_ext``) and emits the per-(block, voice) window
    start plane ``ws``:

    - looping voices whose loop (+2 lerp guard) fits the window are
      ANCHORED at their loop view: ``ws`` is constant for the life of
      the note, so sustained notes trigger no DMA refresh at all; the
      in-kernel wrap runs in view coordinates.
    - looping voices with long loops read the view UNWRAPPED (the view's
      cyclic guard covers one block of advance; the per-block pre-wrap
      of ``base_pos`` handles block boundaries); ``smp_end`` is pushed
      to +inf so validity masking stays true.
    - non-looping voices window at their (align-rounded) block base in
      original wave coordinates.

    Reference anchor: the arbitrary-length vectorized oscillator of
    reference meltysynth/synth/oscillator.py:79-148 — here the arbitrary
    length lives in HBM and per-voice windows are DMA'd into VMEM.
    """
    ls = ctrl["loop_start"].astype(jnp.int32)
    ll = jnp.maximum(ctrl["loop_len"].astype(jnp.int32), 1)
    lv = ctrl["lv_off"].astype(jnp.int32)
    looping = ctrl["looping"]
    alive = ctrl["alive"]
    smp_end = ctrl["smp_end"].astype(jnp.int32)
    base_int, base_frac = _split_base(ctrl)

    is_loop = looping & (lv >= 0)
    anchored = is_loop & ((ll + 2) <= W)
    view_base = lv + (base_int - ls)
    base_i = jnp.where(is_loop, view_base, base_int)
    loop_start_o = jnp.where(anchored, lv, jnp.int32(0))
    loopf = anchored.astype(jnp.float32)
    smp_end_o = jnp.where(
        is_loop & ~anchored, jnp.int32(1 << 30), smp_end
    )
    ws = jnp.where(
        anchored, lv, jnp.bitwise_and(base_i, jnp.int32(~(align - 1)))
    )
    ws = jnp.where(alive, ws, jnp.int32(0))
    ws = jnp.minimum(jnp.maximum(ws, jnp.int32(0)), jnp.int32(L_ext - W))
    return dict(
        ratio=ctrl["ratio"],
        base_frac=base_frac,
        loopf=loopf,
        base_int=base_i,
        loop_start=loop_start_o,
        loop_len=ll,
        smp_end=smp_end_o,
        ws=ws,
        # liveness for the per-sub-chunk gather row bounds (dead voices
        # must not widen the loop range)
        alive=alive.astype(jnp.float32),
    )


def _osc_rows(ctrl, wave):
    """Oscillator control rows for the fused Pallas kernel."""
    from pygmu2_tpu.ops.table import table_lookup

    W = wave.shape[0]
    loop_start_i = ctrl["loop_start"].astype(jnp.int32)
    if "base_int" in ctrl:
        base_int, base_frac = ctrl["base_int"], ctrl["base_frac"]
    else:
        base = ctrl["base_pos"]
        base_int = jnp.floor(base).astype(jnp.int32)
        base_frac = (base - jnp.floor(base)).astype(jnp.float32)
    return dict(
        ratio=ctrl["ratio"],
        base_frac=base_frac,
        base_int=base_int,
        loopf=ctrl["looping"].astype(jnp.float32),
        loop_start=loop_start_i,
        loop_len=jnp.maximum(ctrl["loop_len"].astype(jnp.int32), 1),
        smp_end=ctrl["smp_end"].astype(jnp.int32),
        ls_val=table_lookup(wave, jnp.clip(loop_start_i, 0, W - 1)),
    )


def _gain_rows(ctrl, master):
    """Filter-coefficient + gain-ramp control rows for the fused kernels
    ((B, P) planes; dead voices contribute exactly zero gain)."""
    alive = ctrl["alive"]
    m = jnp.float32(master)
    return {
        "b0": ctrl["b0"],
        "b1": ctrl["b1"],
        "b2": ctrl["b2"],
        "a1": ctrl["a1"],
        "a2": ctrl["a2"],
        "freshf": ctrl["fresh"].astype(jnp.float32),
        "pgl": m * jnp.where(alive, ctrl["pgl"], 0.0),
        "gl": m * jnp.where(alive, ctrl["gl"], 0.0),
        "pgr": m * jnp.where(alive, ctrl["pgr"], 0.0),
        "gr": m * jnp.where(alive, ctrl["gr"], 0.0),
    }


def _audio_pass(ctrl, wave, N: int, master: float, wave_ext=None,
                win_w: int | None = None, interpret: bool = False):
    """One parallel program over the whole timeline.

    ctrl fields are (B, P); returns (B·N, 2) float32.

    wave_ext / win_w: when provided (and the wavetable exceeds the
    resident kernel's VMEM budget), the windowed-DMA kernel renders
    with per-voice W=win_w windows DMA'd from the extended wavetable —
    arbitrary font sizes at resident-kernel speed.

    Everything audio-rate lives in (B, N, P) / (T, P) layout: P = 128
    voices ride the TPU lanes, the time axis is the leading (cheap)
    dimension, and no (time x voices)-sized transpose ever happens —
    (B, P) control planes are broadcast straight into the big layout
    and the associative filter scan consumes (T, P) natively.
    """
    from pygmu2_tpu.ops.linrec import affine_scan_2

    B, P = ctrl["ratio"].shape
    T = B * N
    W = wave.shape[0]

    interp = bool(interpret)
    if (
        (jax.default_backend() == "tpu" or interp)
        and P % 128 == 0
        and N % 128 == 0
    ):
        gains = _gain_rows(ctrl, master)
        from pygmu2_tpu.soundfont.filter_pallas import (
            OSC_KERNEL_MAX_WAVE,
            osc_filter_gain_mix_pallas,
        )

        if W <= OSC_KERNEL_MAX_WAVE:
            # fully fused: the oscillator runs inside the kernel; the
            # (T, P) oscillator output never exists in HBM. Timelines
            # beyond the kernel's VMEM budget render as fused segments
            # with the filter carry + FIR tail threaded between them.
            from pygmu2_tpu.soundfont.filter_pallas import OSC_KERNEL_MAX_T

            rows = dict(gains, **_osc_rows(ctrl, wave))
            blocks_per_seg = max(1, OSC_KERNEL_MAX_T // N)
            if B <= blocks_per_seg:
                out, _st = osc_filter_gain_mix_pallas(
                    rows, wave, N, W, interpret=interp
                )
                return out
            outs = []
            st = None
            for b0 in range(0, B, blocks_per_seg):
                seg = {k: v[b0 : b0 + blocks_per_seg] for k, v in rows.items()}
                out, st = osc_filter_gain_mix_pallas(
                    seg, wave, N, W, state=st, interpret=interp
                )
                outs.append(out)
            return jnp.concatenate(outs, axis=0)

        if wave_ext is not None and win_w is not None:
            # windowed-DMA kernel: wavetable stays in HBM; per-voice
            # windows DMA into VMEM with conditional refresh.
            from pygmu2_tpu.soundfont.filter_pallas import (
                WINDOW_KERNEL_MAX_T,
                osc_window_filter_gain_mix_pallas,
            )

            rows = dict(
                gains,
                **window_osc_rows(ctrl, win_w, int(wave_ext.shape[0])),
            )
            blocks_per_seg = max(1, WINDOW_KERNEL_MAX_T // N)
            if B <= blocks_per_seg:
                out, _st = osc_window_filter_gain_mix_pallas(
                    rows, wave_ext, N, win_w, interpret=interp
                )
                return out
            outs = []
            st = None
            for b0 in range(0, B, blocks_per_seg):
                seg = {k: v[b0 : b0 + blocks_per_seg] for k, v in rows.items()}
                out, st = osc_window_filter_gain_mix_pallas(
                    seg, wave_ext, N, win_w, state=st, interpret=interp
                )
                outs.append(out)
            return jnp.concatenate(outs, axis=0)

    def e(c):  # (B, P) -> (B, 1, P) broadcast plane
        return c[:, None, :]

    ratio = e(ctrl["ratio"])  # f32
    looping = e(ctrl["looping"])
    loop_start = e(ctrl["loop_start"].astype(jnp.int32))
    loop_len = e(jnp.maximum(ctrl["loop_len"].astype(jnp.int32), 1))
    smp_end = e(ctrl["smp_end"].astype(jnp.int32))

    if "base_int" in ctrl:  # packed path: split on host, f64 never shipped
        base_int = e(ctrl["base_int"])
        base_frac = e(ctrl["base_frac"])
    else:
        base = ctrl["base_pos"]  # (B, P) f64, wrapped into the loop
        base_int = e(jnp.floor(base).astype(jnp.int32))
        base_frac = e((base - jnp.floor(base)).astype(jnp.float32))
    steps = jnp.arange(N, dtype=jnp.float32)[None, :, None]  # (1, N, 1)
    offset = base_frac + steps * ratio  # (B, N, P)
    off_int = jnp.floor(offset)
    frac = offset - off_int
    abs_idx = base_int + off_int.astype(jnp.int32)
    # Loop wrap WITHOUT integer mod (int32 division is software-emulated
    # on TPU and dominated this kernel): the base is pre-wrapped into
    # [loop_start, loop_end), so the in-loop index is bounded by
    # loop_len + N·ratio; divide by multiplying with the reciprocal and
    # correct the ±1 ulp cases exactly in integer math.
    phi = abs_idx - loop_start  # ≥ 0, modest magnitude
    inv_ll = 1.0 / loop_len.astype(jnp.float32)
    k = jnp.floor(phi.astype(jnp.float32) * inv_ll).astype(jnp.int32)
    w = phi - k * loop_len
    w = jnp.where(w < 0, w + loop_len, w)
    w = jnp.where(w >= loop_len, w - loop_len, w)
    idx_eff = jnp.where(looping, loop_start + w, abs_idx)
    W = wave.shape[0]
    i0 = jnp.clip(idx_eff, 0, W - 2)
    # wave[i0] and wave[i0 + 1] via the MXU one-hot contraction
    # (ops.table) — the direct scalar gather costs ~7 ns/element on TPU
    # and dominated this kernel.  The loop-end wrap (i1 -> loop_start)
    # is applied afterwards from a tiny (B, P) gather.
    from pygmu2_tpu.ops.table import paired_table_lookup

    pair = jnp.stack([wave, jnp.concatenate([wave[1:], wave[-1:]])], 1)
    w0, w1 = paired_table_lookup(pair, i0)
    ls_val = wave[jnp.clip(loop_start, 0, W - 1)]  # (B, 1, P) — tiny gather
    wrap = looping & ((i0 + 1) >= (loop_start + loop_len))
    w1 = jnp.where(wrap, ls_val, w1)
    smp = (1.0 - frac) * w0 + frac * w1
    valid = looping | (abs_idx < smp_end)
    xt = jnp.where(valid, smp, 0.0).reshape(T, P)

    if (
        (jax.default_backend() == "tpu" or interp)
        and P % 128 == 0
        and N % 128 == 0
    ):
        # fused filter + gain ramps + mixdown in one Pallas pass
        # (wavetable too large for the in-kernel gather; xt came from
        # the XLA one-hot path above)
        from pygmu2_tpu.soundfont.filter_pallas import filter_gain_mix_pallas

        return filter_gain_mix_pallas(xt, gains, N, interpret=interp)

    # ---- filter over the whole timeline, per voice ----
    # epoch boundaries: first samples of fresh blocks must not see the
    # previous epoch through the FIR taps or the y-state.
    fresh = ctrl["fresh"]  # (B, P)
    boundary = (
        jnp.zeros((B, N, P), bool).at[:, 0, :].set(fresh).reshape(T, P)
    )  # True at each epoch's sample 0

    def per_sample(c):  # (B, P) → (T, P)
        return jnp.broadcast_to(e(c), (B, N, P)).reshape(T, P)

    b0 = per_sample(ctrl["b0"])
    b1 = per_sample(ctrl["b1"])
    b2 = per_sample(ctrl["b2"])
    a1 = per_sample(ctrl["a1"])
    a2 = per_sample(ctrl["a2"])

    x1 = jnp.concatenate([jnp.zeros((1, P), xt.dtype), xt[:-1]], axis=0)
    x2 = jnp.concatenate([jnp.zeros((2, P), xt.dtype), xt[:-2]], axis=0)
    b1_ok = ~boundary
    b2_ok = b1_ok & jnp.concatenate(
        [jnp.ones((1, P), bool), b1_ok[:-1]], axis=0
    )
    fir = b0 * xt + b1 * jnp.where(b1_ok, x1, 0.0) + b2 * jnp.where(b2_ok, x2, 0.0)

    # state transition zeroed at boundaries (resets y1/y2)
    keep = (~boundary).astype(jnp.float32)
    if jax.default_backend() == "tpu" and P % 128 == 0:
        # single-HBM-pass blocked scan (2.4x the associative scan)
        from pygmu2_tpu.ops.linrec_pallas import affine_scan_2_pallas as _scan2

        scan2 = lambda *a: _scan2(*a, chunk=128)
    else:
        scan2 = affine_scan_2
    y, _s2 = scan2(
        -a1 * keep,
        -a2 * keep,
        keep,
        jnp.zeros((T, P), jnp.float32),
        fir,
        jnp.zeros((T, P), jnp.float32),
    )  # (T, P)

    # ---- gains with per-block ramps ----
    ramp = steps / N  # (1, N, 1)

    def gain_grid(prev, cur):  # (B, P) each → (T, P)
        audible = jnp.maximum(prev, cur) >= NON_AUDIBLE
        const = jnp.abs(cur - prev) < 1.0e-3
        g = jnp.where(
            e(const),
            e(cur),
            e(prev) + e(cur - prev) * ramp,
        )  # (B, N, P)
        g = jnp.where(e(audible), g, 0.0)
        return g.reshape(T, P)

    alive = ctrl["alive"]
    m = jnp.float32(master)
    gl = gain_grid(m * jnp.where(alive, ctrl["pgl"], 0.0), m * jnp.where(alive, ctrl["gl"], 0.0))
    gr = gain_grid(m * jnp.where(alive, ctrl["pgr"], 0.0), m * jnp.where(alive, ctrl["gr"], 0.0))

    L = jnp.sum(gl * y, axis=1)
    R = jnp.sum(gr * y, axis=1)
    return jnp.stack([L, R], axis=1).astype(jnp.float32)


_audio_pass_jit = jax.jit(_audio_pass, static_argnums=(2,))

# Packed upload: the control dict is 18 separate (B, P) buffers; through
# the host<->device tunnel each transfer pays fixed latency, so ship
# three stacked tensors instead. base_pos (f64) is split host-side into
# exact int32/float32 planes (the device recomputed exactly this split).
_PACK_F32 = ("ratio", "b0", "b1", "b2", "a1", "a2", "gl", "gr", "pgl", "pgr", "base_frac")
_PACK_I32 = ("loop_start", "loop_len", "smp_end", "base_int", "lv_off")
_PACK_BOOL = ("looping", "alive", "fresh")


def _pack_control(ctrl):
    base = ctrl["base_pos"]
    base_int = np.floor(base)
    d = dict(ctrl)
    d["base_int"] = base_int.astype(np.int32)
    d["base_frac"] = (base - base_int).astype(np.float32)
    f32 = np.stack([d[k].astype(np.float32, copy=False) for k in _PACK_F32])
    i32 = np.stack([d[k].astype(np.int32, copy=False) for k in _PACK_I32])
    bl = np.stack([d[k] for k in _PACK_BOOL])
    return f32, i32, bl


def _audio_pass_packed(f32, i32, bl, wave, N: int, master, wave_ext=None,
                       win_w: int | None = None, interpret: bool = False):
    ctrl = {k: f32[i] for i, k in enumerate(_PACK_F32)}
    ctrl.update({k: i32[i] for i, k in enumerate(_PACK_I32)})
    ctrl.update({k: bl[i] for i, k in enumerate(_PACK_BOOL)})
    return _audio_pass(ctrl, wave, N, master, wave_ext, win_w, interpret)


_audio_pass_packed_jit = jax.jit(_audio_pass_packed, static_argnums=(4, 7, 8))


def _ratio_bound(synth, par_np, ch_np) -> float:
    """Conservative upper bound on any voice's pitch ratio across the
    schedule (vibrato/mod-LFO/mod-env at full deflection, the largest
    channel bend/modulation that ever occurs). Used to gate the
    windowed-DMA oscillator, whose window covers one block of advance at
    ratio <= WINDOW_RATIO_BUCKET."""
    p = par_np
    audible = p["note_gain"] >= NON_AUDIBLE
    if not np.any(audible):
        return 1.0
    mod_hi = float(np.abs(ch_np["ch_mod"]).max()) if len(ch_np["ch_mod"]) else 0.0
    bend_hi = float(np.abs(ch_np["ch_pitch"]).max()) if len(ch_np["ch_pitch"]) else 0.0
    swing = (
        np.abs(0.01 * mod_hi + np.abs(p["vib2pitch"]))
        + np.abs(p["mod2pitch"])
        + np.maximum(p["modenv2pitch"], 0.0)
        + bend_hi
    )
    pitch_hi = p["key"] + swing
    delta = p["pitch_scale"] * (pitch_hi - p["root_key"]) + p["tune"]
    delta = np.where(audible, delta, -np.inf)
    return float(np.max(p["srate_ratio"] * 2.0 ** (delta / 12.0)))


def _window_args(synth, par_np, ch_np):
    """(wave_ext, win_w) when the font needs the windowed-DMA oscillator
    and the schedule's pitch ratios fit its provisioning; else
    (None, None) — small fonts ride the resident fused kernel and
    out-of-provision schedules the XLA fallback."""
    from pygmu2_tpu.soundfont.filter_pallas import OSC_KERNEL_MAX_WAVE

    if not (jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET):
        return None, None
    if synth._wave.shape[0] <= OSC_KERNEL_MAX_WAVE:
        return None, None
    bound = _ratio_bound(synth, par_np, ch_np)
    if bound > WINDOW_RATIO_BUCKET:
        return None, None
    # smallest power-of-two bucket covering the schedule's actual pitch
    # range: most music stays within an octave of the sample roots
    # (bucket 2), so windows — and the per-block DMA refresh traffic —
    # are 4x smaller than the worst-case provisioning. Loop-view guards
    # are sized for bucket 8, so any smaller bucket is always safe.
    bucket = 2
    while bucket < bound:
        bucket *= 2
    return synth.wave_ext(), window_w(synth.block_size, bucket)


def render_midi_offline(synth, midi_file, seconds: float,
                        wire: str = "f32",
                        pipeline: int | None = None) -> np.ndarray:
    """Schedule on host, control + audio fused on device.

    Only the deduplicated event schedule crosses the link (tens of KB
    for minutes of MIDI); the per-(block, voice) control grid that the
    host pass produces (~1 MB for 3 s) is computed on device instead.

    wire: "f32" (default) returns float32; "int16" converts to DAC-ready
    PCM on device and ships half the bytes (the render itself stays
    float32 — see _to_wire).

    pipeline: number of host-level segments to overlap download with
    compute (see :func:`_render_pipelined`). ``None`` (default) picks
    ``PIPELINE_SEGMENTS`` when the schedule rides a fused Pallas kernel
    path and the render is long enough to split; ``0``/``1`` forces the
    monolithic single dispatch. Output is bit-identical either way.

    The whole schedule crosses the link as ONE flat buffer
    (:func:`_pack_flat`) — per-plane uploads each pay a synchronous
    round-trip on link-attached devices.
    """
    par_np, ch_np, snap_idx, n_blocks = synth.build_schedule(midi_file, seconds)
    pf32, pi32, pf64, cf32, chold, flags = _pack_schedule_np(par_np, ch_np)
    wave_ext, win_w = _window_args(synth, par_np, ch_np)
    S, P = pf32.shape[1], pf32.shape[2]
    flat = _pack_flat(pf32, pi32, pf64, cf32, chold, snap_idx)
    total = int(round(seconds * synth.sample_rate))
    if pipeline is None:
        # ~200 blocks (~4.6 s at block 1024) per segment measured best
        # on the dev tunnel: more segments overlap download deeper into
        # the compute, until per-dispatch overhead wins (K=12 beat K=4
        # by 17% on a 60 s render; see BENCHMARKS.md).
        pipeline = (
            max(PIPELINE_SEGMENTS, min(16, int(n_blocks) // 200))
            if int(n_blocks) >= 2 * PIPELINE_SEGMENTS
            and _pipeline_kernel_ok(synth, win_w)
            else 0
        )
    if pipeline and pipeline > 1 and _pipeline_kernel_ok(synth, win_w):
        out_np = _render_pipelined(
            synth, flat, flags, S, P, n_blocks, wave_ext, win_w, wire,
            pipeline,
        )
        synth.reset()
        return out_np[:total]
    # Pass the HOST array straight into the jit call: an explicit
    # jnp.asarray here is a SYNCHRONOUS upload — one full link
    # round-trip (~29 ms through a bad tunnel) — while a host argument's
    # transfer piggybacks on the dispatch for free (measured identical
    # to a device-resident argument).
    out = _render_fused_flat_jit(
        flat,
        synth._wave,
        synth.block_size,
        float(synth.master_volume),
        flags,
        int(synth._minimum_voice_duration),
        float(synth.sample_rate),
        S,
        P,
        int(n_blocks),
        wave_ext,
        win_w,
        bool(FORCE_PALLAS_INTERPRET),
        wire,
    )
    synth.reset()
    return np.asarray(out)[:total]


def render_midi_offline_hostctl(synth, midi_file, seconds: float) -> np.ndarray:
    """Host-control variant (numpy control pass + packed upload)."""
    par_np, ch_np, snap_idx, n_blocks = synth.build_schedule(midi_file, seconds)
    ctrl = compute_control(synth, par_np, ch_np, snap_idx)
    f32, i32, bl = _pack_control(ctrl)
    wave_ext, win_w = _window_args(synth, par_np, ch_np)
    out = _audio_pass_packed_jit(
        f32, i32, bl, synth._wave, synth.block_size,
        float(synth.master_volume), wave_ext, win_w,
        bool(FORCE_PALLAS_INTERPRET),
    )
    total = int(round(seconds * synth.sample_rate))
    synth.reset()
    return np.asarray(out)[:total]


# ---- device-side control (fused schedule -> audio) ----------------------

_PAR_F32 = (
    "key", "note_gain", "cutoff", "resonance", "vib2pitch", "mod2pitch",
    "modenv2pitch", "modlfo2cut", "modenv2cut", "modlfo2vol", "inst_pan",
    "v_att_start", "v_hold_start", "v_dec_start", "v_att_slope",
    "v_dec_slope", "v_rel_slope", "v_sustain", "m_att_start",
    "m_hold_start", "m_dec_start", "m_att_slope", "m_dec_slope",
    "m_dec_end", "m_rel_dur", "m_sustain", "vib_delay", "vib_period",
    "mod_delay", "mod_period", "root_key", "tune", "pitch_scale",
)
_PAR_I32 = ("epoch", "channel", "loop_mode", "release_req", "lv_off")
_PAR_F64 = ("smp_start", "smp_end", "loop_start", "loop_end", "srate_ratio")
_CH_F32 = ("ch_mod", "ch_vol_exp", "ch_pan", "ch_pitch")


def _pack_schedule_np(par_np, ch_np):
    """Stack the schedule by dtype (host arrays); derive static flags.

    f64 planes are shipped as exact (hi, lo) float32 pairs — stacked as
    (2 * len(_PAR_F64), S, P) — so the device-side snapshot expansion
    can run as an exact float32 one-hot matmul on the MXU (f64 matmul
    is software-emulated on TPU) and be recombined losslessly.
    """
    pf32 = np.stack([par_np[k] for k in _PAR_F32])
    pi32 = np.stack([par_np[k] for k in _PAR_I32])
    f64 = np.stack([par_np[k] for k in _PAR_F64])
    hi = f64.astype(np.float32)
    lo = (f64 - hi.astype(np.float64)).astype(np.float32)
    pf64 = np.concatenate([hi, lo], axis=0)
    cf32 = np.stack([ch_np[k] for k in _CH_F32])
    chold = ch_np["ch_hold"]
    mode3_any = bool((par_np["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)).any())
    dynamic_any = bool(
        ((par_np["modlfo2cut"] != 0.0) | (par_np["modenv2cut"] != 0.0)).any()
    )
    # int planes ride the f32 one-hot matmul only while exactly
    # representable (|v| < 2^24; release_req exceeds that past ~6 min)
    i32_mm_ok = bool(np.abs(pi32).max(initial=0) < (1 << 24))
    return pf32, pi32, pf64, cf32, chold, (mode3_any, dynamic_any, i32_mm_ok)


def _pack_schedule(par_np, ch_np):
    """Device-array variant of :func:`_pack_schedule_np` (one upload per
    plane — the fused offline path prefers ``_pack_flat``'s single
    buffer; this form feeds the amortized-chain benchmark and tests)."""
    pf32, pi32, pf64, cf32, chold, flags = _pack_schedule_np(par_np, ch_np)
    return (
        jnp.asarray(pf32),
        jnp.asarray(pi32),
        jnp.asarray(pf64),
        jnp.asarray(cf32),
        jnp.asarray(chold),
        flags,
    )


_N_F32 = len(_PAR_F32)
_N_I32 = len(_PAR_I32)
_N_F64 = 2 * len(_PAR_F64)  # (hi, lo) float32 pairs
_N_CH = len(_CH_F32)


def _pack_flat(pf32_np, pi32_np, pf64_np, cf32_np, chold_np, snap_idx):
    """Fuse every schedule plane into ONE flat float32 buffer.

    Through a link-attached device each ``jnp.asarray`` upload pays its
    own synchronous round-trip; shipping the whole schedule as a single
    H2D transfer removes ~5 round-trips per render (measured: the
    difference between ``execute_device_ms`` ≈ 32 ms and ≈ 9 ms on a
    3 ms-RTT tunnel). Int planes ride as exact bit patterns
    (``view(float32)`` / ``bitcast_convert_type`` on device).
    """
    parts = [
        np.ascontiguousarray(pf32_np, dtype=np.float32).ravel(),
        np.ascontiguousarray(pf64_np, dtype=np.float32).ravel(),
        np.ascontiguousarray(cf32_np, dtype=np.float32).ravel(),
        np.ascontiguousarray(pi32_np, dtype=np.int32).ravel().view(np.float32),
        np.ascontiguousarray(chold_np, dtype=np.bool_)
        .astype(np.int32).ravel().view(np.float32),
        np.ascontiguousarray(snap_idx, dtype=np.int32).ravel().view(np.float32),
    ]
    return np.concatenate(parts)


def _unpack_flat(flat, S, P, B):
    """Slice the single-buffer schedule back into typed planes (static
    offsets — S/P/B are trace-time constants)."""
    o = 0

    def take(n, shape, bitcast=None):
        nonlocal o
        x = flat[o : o + n].reshape(shape)
        o += n
        if bitcast is not None:
            x = jax.lax.bitcast_convert_type(x, bitcast)
        return x

    pf32 = take(_N_F32 * S * P, (_N_F32, S, P))
    pf64 = take(_N_F64 * S * P, (_N_F64, S, P))
    cf32 = take(_N_CH * S * 16, (_N_CH, S, 16))
    pi32 = take(_N_I32 * S * P, (_N_I32, S, P), jnp.int32)
    chold = take(S * 16, (S, 16), jnp.int32) != 0
    snap_idx = take(B, (B,), jnp.int32)
    return pf32, pi32, pf64, cf32, chold, snap_idx


def _render_fused_flat(
    flat, wave, N, master, flags, min_dur, sr, S, P, B,
    wave_ext=None, win_w=None, interpret=False, wire="f32",
):
    planes = _unpack_flat(flat, S, P, B)
    return _render_fused(
        *planes, wave, N, master, flags, min_dur, sr,
        wave_ext, win_w, interpret, wire,
    )


_render_fused_flat_jit = jax.jit(
    _render_fused_flat,
    static_argnums=(2, 4, 5, 6, 7, 8, 9, 11, 12, 13),
)


def _control_device(pf32, pi32, pf64, cf32, chold, snap_idx, N, flags, min_dur, sr,
                    b0=None, carry=None, with_carry=False):
    """jnp mirror of _compute_control_vectorized (same f32 arithmetic).

    All (B, P) sequential chains become cummax/cumsum along the block
    axis; the only lax.scan (the clamped cutoff smoother) is traced only
    when the soundfont actually modulates cutoff (static flag).

    Streaming (``carry`` is not None): renders blocks [b0, b0+B) of a
    longer timeline. Every scan takes the previous segment's last row as
    a prepended carry element, so a piece can be rendered as a sequence
    of segments whose control output matches the monolithic pass (the
    int scans are exact; the f64 advance cumsum differs only in
    associativity order, ~1e-12 relative). ``with_carry`` additionally
    returns the (P,)-shaped carry pytree for the next segment
    (:func:`_stream_carry_init` builds the stream-initial one). The
    monolithic path (carry None) is bit-identical to the pre-streaming
    code: no rows are prepended.
    """
    mode3_any, dynamic_any, i32_mm_ok = flags
    B = snap_idx.shape[0]
    P = pf32.shape[2]
    n64 = len(_PAR_F64)
    rpo = np.float32(1.0 - 1.0 / math.sqrt(2.0))
    xp = jnp

    # ---- snapshot expansion: (k, S, P) -> (k, B, P) -------------------
    # A plain `plane[snap_idx]` gather lowers to a ~7 ns/element scalar
    # loop on TPU (~116 µs per plane — it dominated this pass); the
    # one-hot contraction runs on the MXU and is exact (each product
    # term is the plane value or 0).  int planes ride the f32 matmul
    # (epoch/release_req < 2^24, exact in f32); f64 planes were packed
    # as exact (hi, lo) f32 pairs.
    S = pf32.shape[1]
    oh = jax.nn.one_hot(snap_idx, S, dtype=jnp.float32)  # (B, S)

    # precision=HIGHEST: the TPU default performs bf16 multiplies on f32
    # inputs, which would silently truncate plane values (epoch,
    # release_req, ratio) — the documented exactness of the one-hot
    # expansion holds only with full-f32 multiplies pinned.
    _EXACT = jax.lax.Precision.HIGHEST

    def expand(planes):  # (k, S, P) f32 -> (k, B, P)
        return jnp.einsum(
            "bs,ksp->kbp",
            oh,
            planes,
            preferred_element_type=jnp.float32,
            precision=_EXACT,
        )

    ef32 = expand(pf32)
    if i32_mm_ok:
        ei32 = jnp.round(expand(pi32.astype(jnp.float32))).astype(jnp.int32)
        pari = {k: ei32[i] for i, k in enumerate(_PAR_I32)}
    else:  # values too large for exact f32 matmul: plain (slow) gather
        pari = {k: pi32[i][snap_idx] for i, k in enumerate(_PAR_I32)}
    e64 = expand(pf64)
    ech = jnp.matmul(
        oh,
        cf32.astype(jnp.float32).transpose(1, 0, 2).reshape(S, -1),
        precision=_EXACT,
    )
    ech = ech.reshape(B, len(_CH_F32), -1).transpose(1, 0, 2)  # (4, B, 16)

    par = {k: ef32[i] for i, k in enumerate(_PAR_F32)}
    par64 = {
        k: e64[i].astype(jnp.float64) + e64[n64 + i].astype(jnp.float64)
        for i, k in enumerate(_PAR_F64)
    }
    ch = {k: ech[i] for i, k in enumerate(_CH_F32)}
    ch["ch_hold"] = (
        jnp.matmul(oh, chold.astype(jnp.float32), precision=_EXACT) > 0.5
    )
    chan = pari["channel"]
    par["release_req"] = pari["release_req"]  # int compare below
    # int32 throughout: block indices / voice times fit comfortably and
    # int64 arithmetic is software-emulated on TPU. b_idx is GLOBAL
    # under streaming so carried scans stay consistent across segments.
    C = carry
    base_b = jnp.int32(0) if b0 is None else jnp.asarray(b0, jnp.int32)
    b_idx = (base_b + jnp.arange(B, dtype=jnp.int32))[:, None]

    n_midi_ch = cf32.shape[2]

    def chv(name):
        # per-voice view of a (B, n_ch) channel field: a 16-way masked
        # select instead of a per-element gather (scalar loop on TPU)
        c = ch[name]
        acc = jnp.broadcast_to(c[:, 0:1], chan.shape)
        for j in range(1, n_midi_ch):
            acc = jnp.where(chan == j, c[:, j : j + 1], acc)
        return acc

    def cscan(x, c=None):  # inclusive cumsum without the reduce-window lowering
        if c is None:
            return jax.lax.associative_scan(jnp.add, x, axis=0)
        y = jax.lax.associative_scan(
            jnp.add, jnp.concatenate([c[None].astype(x.dtype), x], 0), axis=0
        )
        return y[1:]

    def cmax(x, c=None):
        if c is None:
            return jax.lax.associative_scan(jnp.maximum, x, axis=0)
        y = jax.lax.associative_scan(
            jnp.maximum,
            jnp.concatenate([c[None].astype(x.dtype), x], 0),
            axis=0,
        )
        return y[1:]

    def ffill(values, marked, c=None):
        """Forward-fill: at each row, the most recent `values` row where
        `marked` was True (rows before the first mark keep row 0's
        value masked by callers via the matching validity logic).
        Replaces take-along-axis row gathers (scalar loops on TPU).
        ``c``: carried (value, marked) row prepended under streaming.
        Returns (values, marked) so callers can extract scan carries."""

        def combine(a, b):
            va, ma = a
            vb, mb = b
            return jnp.where(mb, vb, va), ma | mb

        if c is not None:
            values = jnp.concatenate([c[0][None].astype(values.dtype), values], 0)
            marked = jnp.concatenate([c[1][None], marked], 0)
        v, m = jax.lax.associative_scan(combine, (values, marked), axis=0)
        if c is not None:
            v, m = v[1:], m[1:]
        return v, m

    _true_p = jnp.ones((P,), bool)

    epoch = pari["epoch"]
    if C is None:
        fresh = jnp.concatenate(
            [jnp.ones((1, P), bool), epoch[1:] != epoch[:-1]], axis=0
        )
    else:
        fresh = epoch != jnp.concatenate([C["epoch"][None], epoch[:-1]], 0)
    seg_start = cmax(
        jnp.where(fresh, b_idx, -1), None if C is None else C["seg_start"]
    )
    vt = (b_idx - seg_start) * N
    # divide in f64 then round, matching the numpy control pass bit-for-bit
    t_now = (vt.astype(jnp.float64) / sr).astype(jnp.float32)
    t_end = ((vt + N).astype(jnp.float64) / sr).astype(jnp.float32)

    def seg_gather(arr, c_v=None):
        # value at each row's segment start (forward-fill from fresh
        # rows). Under streaming the carried mark is always True: the
        # stream-initial carry makes every voice fresh at block 0, so
        # by segment 2 every voice has a fresh row in its history.
        c = None if (C is None or c_v is None) else (c_v, _true_p)
        return ffill(arr, fresh, c)[0]

    hold = chv("ch_hold")
    eligible = (par["release_req"] <= vt) & (vt >= min_dur) & ~hold
    elig_cs = cscan(
        eligible.astype(jnp.int32), None if C is None else C["elig_cs"]
    )
    excl_first = (
        jnp.zeros((1, P), elig_cs.dtype) if C is None else C["elig_cs"][None]
    )
    excl = jnp.concatenate([excl_first, elig_cs[:-1]], 0)
    sg_excl = seg_gather(excl, None if C is None else C["sg_excl"])
    elig_in_seg = elig_cs - sg_excl
    released = elig_in_seg > 0
    first_elig = eligible & (elig_in_seg == 1)
    marker_row = jnp.where(first_elig, b_idx, -1)
    marker_cm = cmax(marker_row, None if C is None else C["marker_cm"])
    rel_valid = marker_cm >= seg_start
    relt_f, relt_m = ffill(
        t_now, first_elig, None if C is None else (C["relt_v"], C["relt_m"])
    )
    rel_t = jnp.where(released & rel_valid, relt_f, 0.0).astype(jnp.float32)
    released = released & rel_valid

    rel_vol = _vol_env_np(rel_t, par, False, rel_t, 0.0, xp).astype(jnp.float32)
    rel_mod = _mod_env_np(rel_t, par, False, rel_t, 0.0, xp).astype(jnp.float32)
    vol_env = _vol_env_np(t_end, par, released, rel_t, rel_vol, xp)
    mod_env = _mod_env_np(t_end, par, released, rel_t, rel_mod, xp)
    vib = _lfo_np(t_end, par["vib_delay"], par["vib_period"], xp)
    mlf = _lfo_np(t_end, par["mod_delay"], par["mod_period"], xp)

    dead_vol = (vol_env <= NON_AUDIBLE) & (released | (t_end >= par["v_dec_start"]))

    pitch = (
        par["key"]
        + (np.float32(0.01) * chv("ch_mod") + par["vib2pitch"]) * vib
        + par["mod2pitch"] * mlf
        + par["modenv2pitch"] * mod_env
        + chv("ch_pitch")
    )
    pitch_change = par["pitch_scale"] * (pitch - par["root_key"]) + par["tune"]
    ratio = par64["srate_ratio"] * 2.0 ** (pitch_change.astype(jnp.float64) / 12.0)

    looping = (pari["loop_mode"] == int(LoopMode.CONTINUOUS)) | (
        (pari["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)) & ~released
    )
    advance = N * ratio
    adv_cs = cscan(advance, None if C is None else C["adv_cs"])
    adv_first = (
        jnp.zeros((1, P), adv_cs.dtype) if C is None else C["adv_cs"][None]
    )
    adv_excl = jnp.concatenate([adv_first, adv_cs[:-1]], 0)
    sg_adv = seg_gather(adv_excl, None if C is None else C["sg_adv"])
    base = par64["smp_start"] + (adv_excl - sg_adv)

    loop_len = jnp.maximum(par64["loop_end"] - par64["loop_start"], 1.0)
    bar_f = bar_m = None
    if mode3_any:
        bar_f, bar_m = ffill(
            base, first_elig, None if C is None else (C["bar_v"], C["bar_m"])
        )
        base_at_rel = bar_f
        wrapped_at_rel = (
            jnp.mod(base_at_rel - par64["loop_start"], loop_len)
            + par64["loop_start"]
        )
        mode3 = pari["loop_mode"] == int(LoopMode.LOOP_UNTIL_NOTE_OFF)
        fix = mode3 & released
        base = jnp.where(fix, base - base_at_rel + wrapped_at_rel, base)
    dead_osc = ~looping & (base >= par64["smp_end"])
    base = jnp.where(
        looping,
        jnp.mod(base - par64["loop_start"], loop_len) + par64["loop_start"],
        base,
    )

    res = par["resonance"]
    if dynamic_any:
        dynamic = (par["modlfo2cut"] != 0.0) | (par["modenv2cut"] != 0.0)
        cents = par["modlfo2cut"] * mlf + par["modenv2cut"] * mod_env
        new_cut = (2.0 ** (cents / 1200.0)).astype(jnp.float32) * par["cutoff"]

        def body(prev, xs):
            fr, cut0, dyn, nc = xs
            prev = jnp.where(fr, cut0, prev)
            prev = jnp.where(
                dyn, jnp.clip(nc, 0.5 * prev, 2.0 * prev), prev
            ).astype(jnp.float32)
            return prev, prev

        smc0 = par["cutoff"][0] if C is None else C["cutoff"]
        _, smc = jax.lax.scan(
            body, smc0, (fresh, par["cutoff"], dynamic, new_cut)
        )
        cutoff = jnp.where(dynamic, smc, par["cutoff"])
    else:
        smc = None
        cutoff = par["cutoff"]
    flt_on = cutoff < 0.499 * sr
    q = res - rpo / (1.0 + 6.0 * (res - 1.0))
    w = np.float32(2.0 * np.pi) * cutoff / np.float32(sr)
    cosw = jnp.cos(w)
    alpha = jnp.sin(w) / (2.0 * jnp.maximum(q, 1e-6))
    a0 = 1.0 + alpha
    b0 = jnp.where(flt_on, ((1.0 - cosw) / 2.0) / a0, 1.0).astype(jnp.float32)
    b1 = jnp.where(flt_on, (1.0 - cosw) / a0, 0.0).astype(jnp.float32)
    b2 = jnp.where(flt_on, ((1.0 - cosw) / 2.0) / a0, 0.0).astype(jnp.float32)
    a1 = jnp.where(flt_on, (-2.0 * cosw) / a0, 0.0).astype(jnp.float32)
    a2 = jnp.where(flt_on, (1.0 - alpha) / a0, 0.0).astype(jnp.float32)

    ve = chv("ch_vol_exp")
    mix_gain = par["note_gain"] * ve * ve * vol_env.astype(jnp.float32)
    dyn_vol = par["modlfo2vol"] > 0.05
    mix_gain = mix_gain * jnp.where(
        dyn_vol, (10.0 ** (0.05 * par["modlfo2vol"] * mlf)).astype(jnp.float32), 1.0
    )
    angle = np.float32(np.pi / 200.0) * (
        chv("ch_pan") + par["inst_pan"] + np.float32(50.0)
    )
    gl = jnp.where(
        angle <= 0.0,
        mix_gain,
        jnp.where(angle >= np.float32(np.pi / 2), 0.0, mix_gain * jnp.cos(angle)),
    ).astype(jnp.float32)
    gr = jnp.where(
        angle <= 0.0,
        0.0,
        jnp.where(angle >= np.float32(np.pi / 2), mix_gain, mix_gain * jnp.sin(angle)),
    ).astype(jnp.float32)
    if C is None:
        pgl = jnp.where(fresh, gl, jnp.roll(gl, 1, axis=0))
        pgr = jnp.where(fresh, gr, jnp.roll(gr, 1, axis=0))
    else:
        pgl = jnp.where(fresh, gl, jnp.concatenate([C["gl"][None], gl[:-1]], 0))
        pgr = jnp.where(fresh, gr, jnp.concatenate([C["gr"][None], gr[:-1]], 0))

    active0 = par["note_gain"] >= NON_AUDIBLE
    dead = dead_vol | dead_osc
    dead_cs = cscan(
        dead.astype(jnp.int32), None if C is None else C["dead_cs"]
    )
    dead_first = (
        jnp.zeros((1, P), dead_cs.dtype) if C is None else C["dead_cs"][None]
    )
    dead_excl = jnp.concatenate([dead_first, dead_cs[:-1]], 0)
    sg_dead = seg_gather(dead_excl, None if C is None else C["sg_dead"])
    dead_before = (dead_excl - sg_dead) > 0
    alive = active0 & ~dead_before & ~dead

    if with_carry:
        carry_out = {
            "epoch": epoch[-1],
            "seg_start": seg_start[-1],
            "elig_cs": elig_cs[-1],
            "sg_excl": sg_excl[-1],
            "marker_cm": marker_cm[-1],
            "relt_v": relt_f[-1],
            "relt_m": relt_m[-1],
            "adv_cs": adv_cs[-1],
            "sg_adv": sg_adv[-1],
            "bar_v": (
                bar_f[-1] if mode3_any else jnp.zeros((P,), base.dtype)
            ),
            "bar_m": (
                bar_m[-1] if mode3_any else jnp.zeros((P,), bool)
            ),
            "dead_cs": dead_cs[-1],
            "sg_dead": sg_dead[-1],
            "cutoff": (smc if dynamic_any else cutoff)[-1],
            "gl": gl[-1],
            "gr": gr[-1],
        }
    else:
        carry_out = None

    ctrl = {
        "ratio": ratio.astype(jnp.float32),
        "base_pos": base,
        "looping": looping,
        "alive": alive,
        "fresh": fresh,
        "b0": b0,
        "b1": b1,
        "b2": b2,
        "a1": a1,
        "a2": a2,
        "gl": gl,
        "gr": gr,
        "pgl": pgl,
        "pgr": pgr,
        "loop_start": par64["loop_start"],
        "loop_len": loop_len,
        "smp_end": par64["smp_end"],
        "lv_off": pari["lv_off"],
    }
    if with_carry:
        return ctrl, carry_out
    return ctrl


def _stream_carry_init(P: int):
    """Stream-initial carry for :func:`_control_device`: epoch -1 makes
    every voice fresh at the stream's first block (matching the
    monolithic pass's unconditional fresh row 0); everything else is the
    neutral element of its scan."""
    return {
        "epoch": np.full((P,), -1, np.int32),
        "seg_start": np.full((P,), -1, np.int32),
        "elig_cs": np.zeros((P,), np.int32),
        "sg_excl": np.zeros((P,), np.int32),
        "marker_cm": np.full((P,), -1, np.int32),
        "relt_v": np.zeros((P,), np.float32),
        "relt_m": np.zeros((P,), bool),
        "adv_cs": np.zeros((P,), np.float64),
        "sg_adv": np.zeros((P,), np.float64),
        "bar_v": np.zeros((P,), np.float64),
        "bar_m": np.zeros((P,), bool),
        "dead_cs": np.zeros((P,), np.int32),
        "sg_dead": np.zeros((P,), np.int32),
        "cutoff": np.zeros((P,), np.float32),
        "gl": np.zeros((P,), np.float32),
        "gr": np.zeros((P,), np.float32),
    }


def _render_fused(
    pf32, pi32, pf64, cf32, chold, snap_idx, wave, N, master, flags, min_dur,
    sr, wave_ext=None, win_w=None, interpret=False, wire="f32",
):
    ctrl = _control_device(
        pf32, pi32, pf64, cf32, chold, snap_idx, N, flags, min_dur, sr
    )
    out = _audio_pass(ctrl, wave, N, master, wave_ext, win_w, interpret)
    return _to_wire(out, wire)


def _to_wire(out, wire: str):
    """Device-side wire-format conversion for host transfer.

    The render itself is always float32 (the parity budget applies
    there); ``wire="int16"`` ships DAC-ready PCM at half the bytes —
    on link-constrained hosts the download dominates end-to-end time.
    """
    if wire == "f32":
        return out
    if wire == "int16":
        scaled = jnp.round(out * 32767.0)
        return jnp.clip(scaled, -32768.0, 32767.0).astype(jnp.int16)
    raise ValueError(f"unknown wire format: {wire!r} (use 'f32' or 'int16')")


_render_fused_jit = jax.jit(
    _render_fused, static_argnums=(7, 9, 10, 11, 13, 14, 15)
)


# ---- pipelined offline render (download/compute overlap) ----------------
#
# The monolithic fused render is ONE dispatch: nothing overlaps the D2H
# transfer with compute, so on link-attached hosts the wall time is
# execute + download, serial. The pipelined variant splits the timeline
# into K host-level segments (the kernels already thread their (4, P)
# filter/FIR state between launches — same math, same launches, just
# issued as separate dispatches) and starts each segment's D2H transfer
# as soon as it is dispatched: segment k downloads while segment k+1
# computes. Output is bit-identical to the monolithic path.
#
# Reference anchor: the monolithic workload corresponds to the reference
# benchmark render (/root/reference/benchmarks/benchmark_meltysynth.py);
# the reference has no device link, so this concern has no counterpart.

PIPELINE_SEGMENTS = 4  # default K; ~2 RTTs of overhead vs hiding compute


def _prep_rows_flat(flat, wave, N, master, flags, min_dur, sr, S, P, B,
                    win_w, l_ext):
    """Device control pass -> fused-kernel control rows ((B, P) planes).

    win_w None => resident-kernel rows (:func:`_osc_rows`); else
    windowed-DMA rows (:func:`window_osc_rows`) for the extended
    wavetable of length ``l_ext``.
    """
    planes = _unpack_flat(flat, S, P, B)
    ctrl = _control_device(*planes, N, flags, min_dur, sr)
    gains = _gain_rows(ctrl, master)
    if win_w is None:
        return dict(gains, **_osc_rows(ctrl, wave))
    return dict(gains, **window_osc_rows(ctrl, win_w, int(l_ext)))


_prep_rows_flat_jit = jax.jit(
    _prep_rows_flat, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
)


def _render_rows_seg(rows, state, b0, wave, N, seg_blocks, win_w, wire,
                     interpret):
    """Render ``seg_blocks`` blocks starting at block ``b0`` (traced
    scalar) from precomputed control rows, threading the fused kernel's
    (4, P) carry in and out. Returns (wire-format audio, state)."""
    from pygmu2_tpu.soundfont.filter_pallas import (
        OSC_KERNEL_MAX_T,
        WINDOW_KERNEL_MAX_T,
        osc_filter_gain_mix_pallas,
        osc_window_filter_gain_mix_pallas,
    )

    seg = {
        k: jax.lax.dynamic_slice_in_dim(v, b0, seg_blocks, axis=0)
        for k, v in rows.items()
    }
    max_t = OSC_KERNEL_MAX_T if win_w is None else WINDOW_KERNEL_MAX_T
    bps = max(1, max_t // N)
    outs = []
    st = state
    for s0 in range(0, seg_blocks, bps):
        sub = {k: v[s0 : s0 + bps] for k, v in seg.items()}
        if win_w is None:
            out, st = osc_filter_gain_mix_pallas(
                sub, wave, N, wave.shape[0], state=st, interpret=interpret
            )
        else:
            out, st = osc_window_filter_gain_mix_pallas(
                sub, wave, N, win_w, state=st, interpret=interpret
            )
        outs.append(out)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return _to_wire(out, wire), st


_render_rows_seg_jit = jax.jit(
    _render_rows_seg, static_argnums=(4, 5, 6, 7, 8)
)


def _pipeline_kernel_ok(synth, win_w) -> bool:
    """True when the schedule will take one of the fused Pallas kernel
    paths (the ones with threadable state) — mirrors _audio_pass's
    branch conditions."""
    from pygmu2_tpu.soundfont.filter_pallas import OSC_KERNEL_MAX_WAVE

    if not (jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET):
        return False
    if synth.block_size % 128 != 0 or synth._maximum_polyphony % 128 != 0:
        return False
    if synth._wave.shape[0] <= OSC_KERNEL_MAX_WAVE:
        return True
    return win_w is not None


def _render_pipelined(synth, flat, flags, S, P, n_blocks, wave_ext, win_w,
                      wire, segments):
    """K-segment dispatch loop with eager per-segment D2H.

    Downloads drain on a worker thread (one, FIFO) while the main
    thread keeps issuing segment dispatches: on link-attached devices
    each dispatch pays a synchronous round-trip (~3-30 ms through the
    dev tunnel), and draining ``np.asarray`` only after the dispatch
    loop serializes those RTTs with the payload stream. Both sides
    block in C++ (GIL released), so the overlap is real; dispatch
    order — hence output — is unchanged (segment state threads through
    the main thread only).
    """
    N = synth.block_size
    if win_w is None:
        wave = synth._wave
        l_ext = 0
    else:
        wave = wave_ext
        l_ext = int(wave_ext.shape[0])
    interp = bool(FORCE_PALLAS_INTERPRET)
    rows = _prep_rows_flat_jit(
        flat, synth._wave, N, float(synth.master_volume), flags,
        int(synth._minimum_voice_duration), float(synth.sample_rate),
        S, P, int(n_blocks), win_w, l_ext,
    )
    K = max(1, min(int(segments), int(n_blocks)))
    base, rem = divmod(int(n_blocks), K)
    st = np.zeros((4, P), np.float32)
    b0 = 0
    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        futs = []
        for k in range(K):
            sb = base + (1 if k < rem else 0)
            out, st = _render_rows_seg_jit(
                rows, st, np.int32(b0), wave, N, sb, win_w, wire, interp
            )
            out.copy_to_host_async()
            futs.append(pool.submit(np.asarray, out))
            b0 += sb
        return np.concatenate([f.result() for f in futs])


# ---- streamed offline render (schedule/compute overlap) ------------------


def _pad_snap_stacks(pf32, pi32, pf64, cf32, chold, S_pad):
    """Pad packed snapshot stacks to ``S_pad`` rows by repeating the
    last snapshot. ``snap_idx`` never references the pad rows, and the
    one-hot expansion multiplies them by exactly zero, so padding is
    free of numeric effect — it only pins the compiled shape."""
    S = pf32.shape[1]
    if S == S_pad:
        return pf32, pi32, pf64, cf32, chold

    def pad1(a):
        return np.concatenate(
            [a, np.repeat(a[:, -1:], S_pad - S, axis=1)], axis=1
        )

    chold_p = np.concatenate(
        [chold, np.repeat(chold[-1:], S_pad - S, axis=0)], axis=0
    )
    return pad1(pf32), pad1(pi32), pad1(pf64), pad1(cf32), chold_p


def _render_seg_stream(flat, kstate, carry, b0, wave, N, master, flags,
                       min_dur, sr, S, P, B, win_w, l_ext, wire, interpret):
    """One streamed segment: device control pass with carried scan state
    plus the fused kernel with its carried (4, P) filter state. Returns
    (wire-format audio, kernel state, control carry)."""
    planes = _unpack_flat(flat, S, P, B)
    ctrl, carry_out = _control_device(
        *planes, N, flags, min_dur, sr, b0=b0, carry=carry, with_carry=True
    )
    gains = _gain_rows(ctrl, master)
    if win_w is None:
        rows = dict(gains, **_osc_rows(ctrl, wave))
    else:
        rows = dict(gains, **window_osc_rows(ctrl, win_w, int(l_ext)))
    out, kstate = _render_rows_seg(
        rows, kstate, jnp.int32(0), wave, N, B, win_w, wire, interpret
    )
    return out, kstate, carry_out


_render_seg_stream_jit = jax.jit(
    _render_seg_stream,
    static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16),
)


def render_midi_offline_streamed(synth, midi_file, seconds: float,
                                 wire: str = "f32",
                                 seg_blocks: int | None = None) -> np.ndarray:
    """Schedule-pipelined offline render.

    The host event simulation for segment k+1 runs while the device
    renders segment k (and finished segments stream D2H on a worker
    thread), so on a host-attached chip the schedule pass is hidden
    behind device compute — only the FIRST segment's simulation sits on
    the critical path. Per-segment continuation is exact: the control
    pass threads its scan carries (:func:`_control_device` streaming
    mode) and the fused kernel its (4, P) filter state; parity vs the
    monolithic :func:`render_midi_offline` is ≤1e-5 (the f64 advance
    cumsum regroups across segment boundaries, nothing else changes).

    Falls back to the monolithic path when the schedule can't ride a
    fused Pallas kernel (non-TPU backend, odd block/polyphony sizes),
    when the piece fits one segment anyway, or — detected mid-stream —
    when a segment's pitch ratios exceed the window provisioning chosen
    from segment 1.
    """
    from pygmu2_tpu.soundfont.filter_pallas import (
        OSC_KERNEL_MAX_T,
        OSC_KERNEL_MAX_WAVE,
        WINDOW_KERNEL_MAX_T,
    )

    N = synth.block_size
    sr = float(synth.sample_rate)
    total = int(round(seconds * sr))
    n_blocks = int(math.ceil(seconds * sr / N))
    P = int(synth._maximum_polyphony)
    large = synth._wave.shape[0] > OSC_KERNEL_MAX_WAVE
    max_t = WINDOW_KERNEL_MAX_T if large else OSC_KERNEL_MAX_T
    if seg_blocks is None:
        seg_blocks = max(1, max_t // N)
    kernel_ok = (
        (jax.default_backend() == "tpu" or FORCE_PALLAS_INTERPRET)
        and N % 128 == 0
        and P % 128 == 0
    )
    if not kernel_ok or n_blocks <= seg_blocks:
        return render_midi_offline(synth, midi_file, seconds, wire=wire)

    if large:
        # complete the loop-view table BEFORE the first kernel compile:
        # a mid-stream wave_ext growth would change the operand shape
        synth.register_font_loop_views()
        wave_dev = synth.wave_ext()
        l_ext = int(wave_dev.shape[0])
    else:
        wave_dev = synth._wave
        l_ext = 0

    interp = bool(FORCE_PALLAS_INTERPRET)
    master = float(synth.master_volume)
    min_dur = int(synth._minimum_voice_duration)
    kstate = np.zeros((4, P), np.float32)
    carry = _stream_carry_init(P)
    win_w = None  # chosen from segment 1's pitch-ratio bound when large
    b0 = 0
    gen = synth.build_schedule_segments(midi_file, seconds, seg_blocks)
    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        futs = []
        for par_np, ch_np, snap_idx, nb in gen:
            if large:
                bound = _ratio_bound(synth, par_np, ch_np)
                if win_w is None:
                    bucket = 2
                    while bucket < bound:
                        bucket *= 2
                    if bucket > WINDOW_RATIO_BUCKET:
                        return render_midi_offline(
                            synth, midi_file, seconds, wire=wire
                        )
                    win_w = window_w(N, bucket)
                elif bound > bucket:
                    # a later segment outgrew segment 1's provisioning:
                    # abandon the stream, re-render monolithically
                    # (render_midi_offline resets and re-simulates)
                    return render_midi_offline(
                        synth, midi_file, seconds, wire=wire
                    )
            pf32, pi32, pf64, cf32, chold, flags = _pack_schedule_np(
                par_np, ch_np
            )
            if nb < seg_blocks:  # last segment: pad blocks, crop below
                snap_idx = np.concatenate(
                    [snap_idx, np.repeat(snap_idx[-1:], seg_blocks - nb)]
                )
            S = pf32.shape[1]
            S_pad = 4
            while S_pad < S:
                S_pad *= 2
            pf32, pi32, pf64, cf32, chold = _pad_snap_stacks(
                pf32, pi32, pf64, cf32, chold, S_pad
            )
            flat = _pack_flat(pf32, pi32, pf64, cf32, chold, snap_idx)
            out, kstate, carry = _render_seg_stream_jit(
                flat, kstate, carry, np.int32(b0), wave_dev, N, master,
                flags, min_dur, sr, S_pad, P, seg_blocks, win_w, l_ext,
                wire, interp,
            )
            out.copy_to_host_async()
            futs.append(pool.submit(np.asarray, out))
            b0 += nb
        out_np = np.concatenate([f.result() for f in futs])
    synth.reset()
    return out_np[:total]

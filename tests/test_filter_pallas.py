"""Fused filter+gain+mix Pallas kernel vs the XLA reference pipeline."""

import jax.numpy as jnp
import numpy as np

from pygmu2_tpu.ops.linrec import affine_scan_2
from pygmu2_tpu.soundfont.filter_pallas import filter_gain_mix_pallas
from pygmu2_tpu.soundfont.params import NON_AUDIBLE


def _xla_reference(xt, rows, N):
    """The exact XLA pipeline from offline._audio_pass (post-oscillator)."""
    T, P = xt.shape
    B = T // N
    fresh = rows["freshf"] > 0.5
    boundary = (
        jnp.zeros((B, N, P), bool).at[:, 0, :].set(fresh).reshape(T, P)
    )

    def per_sample(c):
        return jnp.broadcast_to(c[:, None, :], (B, N, P)).reshape(T, P)

    b0 = per_sample(rows["b0"])
    b1 = per_sample(rows["b1"])
    b2 = per_sample(rows["b2"])
    a1 = per_sample(rows["a1"])
    a2 = per_sample(rows["a2"])
    x1 = jnp.concatenate([jnp.zeros((1, P), xt.dtype), xt[:-1]], axis=0)
    x2 = jnp.concatenate([jnp.zeros((2, P), xt.dtype), xt[:-2]], axis=0)
    b1_ok = ~boundary
    b2_ok = b1_ok & jnp.concatenate(
        [jnp.ones((1, P), bool), b1_ok[:-1]], axis=0
    )
    fir = b0 * xt + b1 * jnp.where(b1_ok, x1, 0.0) + b2 * jnp.where(b2_ok, x2, 0.0)
    keep = (~boundary).astype(jnp.float32)
    y, _ = affine_scan_2(
        -a1 * keep, -a2 * keep, keep,
        jnp.zeros((T, P), jnp.float32), fir, jnp.zeros((T, P), jnp.float32),
    )
    ramp = jnp.arange(N, dtype=jnp.float32)[None, :, None] / N

    def gain_grid(prev, cur):
        audible = jnp.maximum(prev, cur) >= NON_AUDIBLE
        const = jnp.abs(cur - prev) < 1.0e-3
        g = jnp.where(
            const[:, None, :], cur[:, None, :],
            prev[:, None, :] + (cur - prev)[:, None, :] * ramp,
        )
        return jnp.where(audible[:, None, :], g, 0.0).reshape(T, P)

    gl = gain_grid(rows["pgl"], rows["gl"])
    gr = gain_grid(rows["pgr"], rows["gr"])
    return jnp.stack(
        [jnp.sum(gl * y, axis=1), jnp.sum(gr * y, axis=1)], axis=1
    )


def test_fused_kernel_matches_xla():
    rng = np.random.default_rng(0)
    B, N, P = 3, 256, 128
    T = B * N
    xt = jnp.asarray(rng.standard_normal((T, P)).astype(np.float32))
    # stable poles: a1 = -2 r cos(th), a2 = r^2 with r < 0.95
    r = rng.uniform(0.1, 0.95, (B, P))
    th = rng.uniform(0, np.pi, (B, P))
    rows = {
        "b0": rng.uniform(0.0, 0.3, (B, P)),
        "b1": rng.uniform(0.0, 0.5, (B, P)),
        "b2": rng.uniform(0.0, 0.3, (B, P)),
        "a1": -2.0 * r * np.cos(th),
        "a2": r**2,
        "freshf": (rng.uniform(0, 1, (B, P)) > 0.6).astype(np.float32),
        "pgl": rng.uniform(0, 0.5, (B, P)),
        "gl": rng.uniform(0, 0.5, (B, P)),
        "pgr": rng.uniform(0, 0.5, (B, P)),
        "gr": rng.uniform(0, 0.5, (B, P)),
    }
    rows["freshf"] = rows["freshf"].copy()
    rows["freshf"][0] = 1.0  # first block is always fresh
    rows = {k: jnp.asarray(v.astype(np.float32)) for k, v in rows.items()}

    ref = _xla_reference(xt, rows, N)
    got = filter_gain_mix_pallas(xt, rows, N, chunk=128, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * max(scale, 1.0)
    )


def _osc_fused_case(sample_specs, events, seconds, N=128):
    """Render one schedule through the XLA audio pass and the fused
    oscillator kernel (interpret mode) and compare."""
    from pygmu2_tpu.soundfont import (
        MidiFile,
        SoundFont,
        Synthesizer,
        SynthesizerSettings,
    )
    from pygmu2_tpu.soundfont.build import build_sf2
    from pygmu2_tpu.soundfont.offline import (
        _audio_pass,
        _osc_rows,
        compute_control,
    )
    from pygmu2_tpu.soundfont.filter_pallas import osc_filter_gain_mix_pallas
    from tests.test_soundfont import build_midi

    font = SoundFont(build_sf2(sample_specs))
    synth = Synthesizer(
        font, SynthesizerSettings(block_size=N, maximum_polyphony=128)
    )
    midi = MidiFile(build_midi(events))
    par_np, ch_np, snap_idx, _nb = synth.build_schedule(midi, seconds)
    ctrl = compute_control(synth, par_np, ch_np, snap_idx)
    ctrl = {k: jnp.asarray(v) for k, v in ctrl.items()}
    wave = synth._wave
    master = float(synth.master_volume)

    ref = _audio_pass(ctrl, wave, N, master)  # CPU backend -> XLA path

    m = jnp.float32(master)
    alive = ctrl["alive"]
    rows = {
        "b0": ctrl["b0"], "b1": ctrl["b1"], "b2": ctrl["b2"],
        "a1": ctrl["a1"], "a2": ctrl["a2"],
        "freshf": ctrl["fresh"].astype(jnp.float32),
        "pgl": m * jnp.where(alive, ctrl["pgl"], 0.0),
        "gl": m * jnp.where(alive, ctrl["gl"], 0.0),
        "pgr": m * jnp.where(alive, ctrl["pgr"], 0.0),
        "gr": m * jnp.where(alive, ctrl["gr"], 0.0),
    }
    rows.update(_osc_rows(ctrl, wave))
    got, _st = osc_filter_gain_mix_pallas(
        rows, wave, N, int(wave.shape[0]), interpret=True
    )
    scale = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5 * max(scale, 1.0)
    )
    assert float(jnp.max(jnp.abs(ref))) > 1e-4  # non-degenerate

    # segmented rendering with state threading must match one-shot
    B = rows["ratio"].shape[0]
    if B >= 4:
        cut = B // 2
        seg1 = {k: v[:cut] for k, v in rows.items()}
        seg2 = {k: v[cut:] for k, v in rows.items()}
        o1, st = osc_filter_gain_mix_pallas(
            seg1, wave, N, int(wave.shape[0]), interpret=True
        )
        o2, _ = osc_filter_gain_mix_pallas(
            seg2, wave, N, int(wave.shape[0]), interpret=True, state=st
        )
        np.testing.assert_allclose(
            np.concatenate([np.asarray(o1), np.asarray(o2)]),
            np.asarray(got), atol=1e-6,
        )


def test_osc_fused_looped_chord():
    from pygmu2_tpu.soundfont.build import make_looped_sample

    _osc_fused_case(
        [{"data": make_looped_sample(261.63, harmonics=4), "rate": 44100,
          "root_key": 60, "loop": True, "attack_tc": -9000,
          "release_tc": -5000}],
        [(0.0, 0x90, 60, 100), (0.0, 0x90, 64, 90), (0.01, 0x90, 67, 80),
         (0.02, 0x80, 60, 0), (0.03, 0x80, 64, 0)],
        0.06,
    )


def test_osc_fused_no_loop_runs_off_end():
    from pygmu2_tpu.soundfont.build import make_looped_sample

    _osc_fused_case(
        [{"data": make_looped_sample(261.63, cycles=4), "rate": 44100,
          "root_key": 60, "loop": False}],
        [(0.0, 0x90, 60, 100), (0.0, 0x90, 72, 100), (0.0, 0x90, 48, 100)],
        0.05,
    )


def test_osc_fused_pitch_bend():
    from pygmu2_tpu.soundfont.build import make_looped_sample

    _osc_fused_case(
        [{"data": make_looped_sample(220.0, harmonics=3), "rate": 44100,
          "root_key": 57, "loop": True}],
        [(0.0, 0x90, 57, 100), (0.01, 0xE0, 0, 96), (0.02, 0xE0, 0, 32),
         (0.035, 0x80, 57, 0)],
        0.05,
    )


def test_osc_fused_loop_until_note_off():
    import struct

    from pygmu2_tpu.soundfont.build import make_looped_sample, build_sf2

    font_bytes = build_sf2(
        [{"data": make_looped_sample(261.63, cycles=8), "rate": 44100,
          "root_key": 60, "loop": True, "release_tc": -3000}]
    )
    # patch loop mode to LOOP_UNTIL_NOTE_OFF (=3) in the igen record
    font_bytes = font_bytes.replace(
        struct.pack("<Hh", 54, 1), struct.pack("<Hh", 54, 3)
    )
    from pygmu2_tpu.soundfont import (
        MidiFile, SoundFont, Synthesizer, SynthesizerSettings,
    )
    from pygmu2_tpu.soundfont.offline import (
        _audio_pass, _osc_rows, compute_control,
    )
    from pygmu2_tpu.soundfont.filter_pallas import osc_filter_gain_mix_pallas
    from tests.test_soundfont import build_midi

    N = 128
    synth = Synthesizer(
        SoundFont(font_bytes),
        SynthesizerSettings(block_size=N, maximum_polyphony=128),
    )
    midi = MidiFile(build_midi([(0.0, 0x90, 60, 100), (0.02, 0x80, 60, 0)]))
    par_np, ch_np, snap_idx, _nb = synth.build_schedule(midi, 0.06)
    ctrl = compute_control(synth, par_np, ch_np, snap_idx)
    ctrl = {k: jnp.asarray(v) for k, v in ctrl.items()}
    wave = synth._wave
    m = jnp.float32(synth.master_volume)
    alive = ctrl["alive"]
    rows = {
        "b0": ctrl["b0"], "b1": ctrl["b1"], "b2": ctrl["b2"],
        "a1": ctrl["a1"], "a2": ctrl["a2"],
        "freshf": ctrl["fresh"].astype(jnp.float32),
        "pgl": m * jnp.where(alive, ctrl["pgl"], 0.0),
        "gl": m * jnp.where(alive, ctrl["gl"], 0.0),
        "pgr": m * jnp.where(alive, ctrl["pgr"], 0.0),
        "gr": m * jnp.where(alive, ctrl["gr"], 0.0),
    }
    rows.update(_osc_rows(ctrl, wave))
    ref = _audio_pass(ctrl, wave, N, float(synth.master_volume))
    got, _st = osc_filter_gain_mix_pallas(
        rows, wave, N, int(wave.shape[0]), interpret=True
    )
    scale = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-5 * scale
    )
    assert float(jnp.max(jnp.abs(ref))) > 1e-4

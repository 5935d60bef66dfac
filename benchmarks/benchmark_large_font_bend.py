#!/usr/bin/env python
"""Large-font benchmark with a MUSICAL schedule: staggered arpeggios,
pitch bends, and modulation sweeps across 16 channels.

The headline bench (bench.py) plays one sustained 128-voice chord —
the friendliest case for the windowed-DMA oscillator's refresh plan
(windows drift at constant ratios). This workload moves the pitch
ratios every block (bends + mod-LFO depth changes) and keeps voices
starting/stopping throughout, so the window refresh plan, the adaptive
bucket gate, and the gather-bound computation all run under churn.

Prints a small JSON report: device RTF (chained), e2e wall, and
whether the schedule stayed on the windowed kernel or fell back.

Run on the TPU: `python benchmarks/benchmark_large_font_bend.py`
Reference anchor: reference benchmarks/benchmark_meltysynth.py (scaled
from its 3-voice chord; the reference has no bend benchmark).
"""

import json
import sys
import time

sys.path.insert(0, ".")


def musical_events(seconds: float):
    """Staggered arpeggios + bends + mod wheel over 16 channels."""
    events = []
    scale = [0, 2, 4, 7, 9]  # pentatonic
    for ch in range(16):
        base = 40 + (ch * 3) % 24
        # mod wheel ramp early in the piece
        events.append((0.01 * ch, 0xB0 | ch, 0x01, 20 + ch * 6))
    t = 0.0
    i = 0
    while t < seconds - 0.35:
        ch = i % 16
        key = 40 + (i * 7) % 24 + scale[i % len(scale)]
        events.append((t, 0x90 | ch, key, 70 + (i * 13) % 50))
        events.append((t + 0.30, 0x80 | ch, key, 0))
        # a bend on this channel while the note sounds (14-bit center 8192)
        bend = 8192 + ((-1) ** i) * (900 + (i * 371) % 2600)
        events.append((t + 0.10, 0xE0 | ch, bend & 0x7F, (bend >> 7) & 0x7F))
        events.append((t + 0.28, 0xE0 | ch, 0x00, 0x40))  # re-center
        t += 0.045
        i += 1
    events.sort(key=lambda e: e[0])
    return events


def build_midi_bytes(seconds: float) -> bytes:
    import struct

    resolution, bpm = 480, 120
    tick_per_sec = resolution * bpm / 60.0
    body = b""
    last = 0
    for t, status, d1, d2 in musical_events(seconds):
        tick = int(round(t * tick_per_sec))
        body += _varint(tick - last) + bytes([status, d1, d2])
        last = tick
    body += _varint(0) + b"\xff\x2f\x00"
    return (
        b"MThd" + struct.pack(">ihhh", 6, 0, 1, resolution)
        + b"MTrk" + struct.pack(">i", len(body)) + body
    )


def _varint(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from pygmu2_tpu.soundfont import MidiFile
    from pygmu2_tpu.soundfont import offline as off
    from pygmu2_tpu.soundfont.offline import render_midi_offline

    seconds = 3.0
    synth, _ = bench.build_workload(large_font=True)
    midi = MidiFile(build_midi_bytes(seconds))

    # which path does this schedule take?
    par_np, ch_np, snap_idx, nb = synth.build_schedule(midi, seconds)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    bound = off._ratio_bound(synth, par_np, ch_np)
    synth.reset()

    np.asarray(jax.jit(lambda x: x * 2)(np.float32(1.0)))  # warm D2H
    out = render_midi_offline(synth, midi, seconds)
    assert np.isfinite(out).all() and np.abs(out).max() > 0.01
    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        render_midi_offline(synth, midi, seconds, wire="int16")
        walls.append(time.perf_counter() - t0)

    # amortized device time (chained, OPTIMIZING.md measurement rule)
    ctrl = off.compute_control(synth, par_np, ch_np, snap_idx)
    gains = off._gain_rows(ctrl, float(synth.master_volume))
    dev_rtf = None
    if win_w is not None:
        from pygmu2_tpu.soundfont import filter_pallas as fp

        rows = dict(
            gains,
            **off.window_osc_rows(ctrl, win_w, int(wave_ext.shape[0])),
        )
        rows = {k: jnp.asarray(v) for k, v in rows.items()}
        we = jnp.asarray(wave_ext)
        N = synth.block_size
        n_chain = 20

        @jax.jit
        def chain(rws, w):
            def body(_k, acc):
                r = dict(rws)
                r["base_frac"] = rws["base_frac"] + acc * 1e-30
                o, _ = fp.osc_window_filter_gain_mix_pallas(r, w, N, win_w)
                return acc + o[0, 0] * 1e-30
            return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

        jax.block_until_ready(chain(rows, we))
        runs = []
        for _ in range(3):
            t1 = time.perf_counter()
            jax.block_until_ready(chain(rows, we))
            runs.append(time.perf_counter() - t1)
        dev_rtf = round(seconds / (min(runs) / n_chain), 0)
    synth.reset()

    print(json.dumps({
        "workload": "musical large-font: staggered arpeggios + bends, 16ch, 3 s",
        "path": "windowed" if win_w is not None else "xla_fallback",
        "ratio_bound": round(bound, 3),
        "window_w": win_w,
        "e2e_rtf_int16": round(seconds / min(walls), 1),
        "device_only_rtf": dev_rtf,
    }))


if __name__ == "__main__":
    main()

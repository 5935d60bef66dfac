"""Example 40: render a MIDI chord progression through the SoundFont synth.

Reference counterpart: scripts/meltysynth_midi_demo.py + benchmark assets.
"""

import struct

import numpy as np

from _common import SAMPLE_RATE, pg
from pygmu2_tpu.soundfont import MidiFile, MidiFileSequencer, SoundFont, Synthesizer, SynthesizerSettings
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.utils import wavio


def simple_midi(chords, beat=0.75):
    def varint(v):
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    res, bpm = 480, 120
    tps = res * bpm / 60.0
    body, last = b"", 0
    events = []
    for i, chord in enumerate(chords):
        for k in chord:
            events.append((i * beat, 0x90, k, 100))
            events.append((i * beat + beat * 0.9, 0x80, k, 0))
    events.sort()
    for t, st, d1, d2 in events:
        tick = int(round(t * tps))
        body += varint(tick - last) + bytes([st, d1, d2])
        last = tick
    body += varint(0) + b"\xff\x2f\x00"
    return MidiFile(
        b"MThd" + struct.pack(">ihhh", 6, 0, 1, res)
        + b"MTrk" + struct.pack(">i", len(body)) + body
    )


font = SoundFont(build_sf2([{
    "data": make_looped_sample(261.63, harmonics=5),
    "rate": 44100, "root_key": 60, "loop": True,
    "attack_tc": -9500, "release_tc": -4500,
}]))
synth = Synthesizer(font, SynthesizerSettings(block_size=256))
seq = MidiFileSequencer(synth)
midi = simple_midi([[60, 64, 67], [57, 60, 64], [62, 65, 69], [60, 64, 67]])
seq.play(midi)
audio = seq.render_to_array(3.5)
wavio.write_wav("/tmp/40_soundfont_midi.wav", audio, SAMPLE_RATE)
print("wrote /tmp/40_soundfont_midi.wav", np.abs(audio).max())

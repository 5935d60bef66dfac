"""Live MIDI synth integration: MidiInPE drain -> synth -> MeltysynthPE.

Mirrors the reference's deepest call stack (SURVEY §3.4): the MIDI drain
happens first in the mix's pull order, messages reach the synthesizer
through the user callback, and the synth's audio appears in the SAME
block the event lands in."""

import numpy as np

import pygmu2_tpu as pg
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample


def test_live_midi_to_audio(tmp_path):
    font_path = tmp_path / "test.sf2"
    font_path.write_bytes(
        build_sf2(
            [{"data": make_looped_sample(261.63, harmonics=3), "rate": 44100,
              "root_key": 60, "loop": True}]
        )
    )

    synth_pe = pg.MeltysynthPE(str(font_path), block_size=64)
    midi_pe = pg.MidiInPE(
        port_name=None,
        callback=lambda start, msg: synth_pe.synthesizer.process_midi_message(
            *msg
        ),
    )
    # mono drain branch adapted to the synth's stereo (reference
    # meltysynth_midi_demo.py:95 pattern; MixPE requires matching channels)
    midi_2ch = pg.SpatialPE(midi_pe, method=pg.SpatialAdapter(channels=2))
    graph = pg.MixPE(midi_2ch, synth_pe)

    with pg.NullRenderer() as r:
        r.set_source(graph)
        r.start()

        # Block 0: silence (no events yet).
        s0 = graph.render(0, 512).data
        assert np.abs(s0).max() < 1e-7

        # Feed a note-on; it must sound in the NEXT rendered block.
        midi_pe.feed((0, 0x90, 60, 100))
        s1 = graph.render(512, 512).data
        assert np.abs(s1).max() > 1e-4
        assert s1.shape[1] == 2

        # Note-off: after the release tail decays the output dies out.
        midi_pe.feed((0, 0x80, 60, 0))
        for k in range(2, 40):
            tail = graph.render(k * 512, 512).data
        assert np.abs(tail).max() < 1e-3


def test_pull_order_midi_before_synth(tmp_path):
    """The mix pulls MidiInPE before MeltysynthPE (argument order), so an
    event fed before a block is audible within that block."""
    font_path = tmp_path / "t2.sf2"
    font_path.write_bytes(
        build_sf2(
            [{"data": make_looped_sample(440.0, harmonics=2), "rate": 44100,
              "root_key": 69, "loop": True}]
        )
    )
    synth_pe = pg.MeltysynthPE(str(font_path), block_size=64)
    midi_pe = pg.MidiInPE(
        port_name=None,
        callback=lambda start, msg: synth_pe.synthesizer.process_midi_message(
            *msg
        ),
    )
    # mono drain branch adapted to the synth's stereo (reference
    # meltysynth_midi_demo.py:95 pattern; MixPE requires matching channels)
    midi_2ch = pg.SpatialPE(midi_pe, method=pg.SpatialAdapter(channels=2))
    graph = pg.MixPE(midi_2ch, synth_pe)
    with pg.NullRenderer() as r:
        r.set_source(graph)
        r.start()
        graph.render(0, 256)  # prime (synth constructed at start)
        midi_pe.feed((0, 0x90, 69, 110))
        out = graph.render(256, 256).data
        assert np.abs(out).max() > 1e-4

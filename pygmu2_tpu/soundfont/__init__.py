"""SoundFont (SF2) synthesizer subsystem.

TPU-native rebuild of the reference's embedded meltysynth engine
(reference: src/pygmu2/meltysynth/ — an MIT port of py-meltysynth).
Host-side: SF2/MIDI file parsing and region matching. Device-side: a
struct-of-arrays voice-field engine — every per-voice quantity lives in a
(voices,) array and each block renders as fused vectorized ops, with a
fully parallel whole-timeline path for offline MIDI rendering.
"""

from pygmu2_tpu.soundfont.model import (
    Generator,
    GeneratorType,
    MeltysynthError,
    Instrument,
    InstrumentRegion,
    LoopMode,
    Preset,
    PresetRegion,
    SampleHeader,
    SampleType,
    SoundFont,
    SoundFontInfo,
    SoundFontVersion,
)
from pygmu2_tpu.soundfont.midi import MidiFile, MidiFileSequencer
from pygmu2_tpu.soundfont.synthesizer import Synthesizer, SynthesizerSettings

__all__ = [
    "Generator",
    "GeneratorType",
    "Instrument",
    "InstrumentRegion",
    "LoopMode",
    "MeltysynthError",
    "MidiFile",
    "MidiFileSequencer",
    "Preset",
    "PresetRegion",
    "SampleHeader",
    "SampleType",
    "SoundFont",
    "SoundFontInfo",
    "SoundFontVersion",
    "Synthesizer",
    "SynthesizerSettings",
]

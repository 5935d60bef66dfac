"""MeltysynthPE — SoundFont synthesis as a source PE.

TPU-native rebuild of the reference bridge (reference:
src/pygmu2/meltysynth_pe.py:28-107): wraps the soundfont Synthesizer
into the PE graph. The synth block engine is already a jitted voice-field
kernel (see pygmu2_tpu.soundfont.synthesizer); the bridge pulls stereo
blocks through an ordered host callback so the host-side MIDI event
machine stays in the loop even under scanned renders.

Expose ``.synthesizer`` so a MidiInPE callback can drive
note_on/note_off/process_midi_message between blocks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp
from jax.experimental import io_callback

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import SourcePE


class MeltysynthPE(SourcePE):
    """Stereo SoundFont synth source; drive it via ``.synthesizer``."""

    def __init__(
        self,
        soundfont_path: str,
        block_size: int = 64,
        program: int | None = None,
    ):
        self._soundfont_path = str(Path(soundfont_path).resolve())
        self._block_size = block_size
        self._program = program
        self._synthesizer = None

    @property
    def synthesizer(self):
        """The Synthesizer (None until start)."""
        return self._synthesizer

    def _ensure_synth(self):
        if self._synthesizer is None:
            from pygmu2_tpu.soundfont import (
                SoundFont,
                Synthesizer,
                SynthesizerSettings,
            )

            if not Path(self._soundfont_path).exists():
                raise FileNotFoundError(
                    f"SoundFont not found: {self._soundfont_path}"
                )
            sound_font = SoundFont.from_file(self._soundfont_path)
            settings = SynthesizerSettings(
                sample_rate=self.sample_rate or 44100,
                block_size=self._block_size,
            )
            self._synthesizer = Synthesizer(sound_font, settings)
            if self._program is not None:
                self._synthesizer.process_midi_message(0, 0xC0, self._program, 0)

    def _on_start(self) -> None:
        self._ensure_synth()

    def _on_stop(self) -> None:
        self._synthesizer = None

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 2

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _host_render(self, duration) -> np.ndarray:
        self._ensure_synth()
        return self._synthesizer.render_stereo(int(duration)).astype(np.float32)

    def _trace(self, ctx):
        duration = ctx.duration
        out = io_callback(
            self._host_render,
            jnp.zeros((duration, 2), jnp.float32),
            jnp.asarray(duration, prec.INDEX),
            ordered=True,
        )
        return out

    def __repr__(self) -> str:
        return f"MeltysynthPE(soundfont_path='{self._soundfont_path}')"

"""Example 37: SequencePE auto-advance — start=None chains items
back to back past each finite extent.

Reference counterpart: examples/37_sequence_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def _note(pitch, seconds=0.6):
    tone = pg.SinePE(frequency=float(pg.pitch_to_freq(pitch)), amplitude=0.4)
    return pg.SlicePE(
        pg.CropPE(tone, 0, int(seconds * SAMPLE_RATE)),
        0, int(seconds * SAMPLE_RATE), fade_out_seconds=0.05,
    )


def build():
    scale = [60, 62, 64, 65, 67, 69, 71, 72]
    return pg.SequencePE(*[(_note(p), None) for p in scale])


if __name__ == "__main__":
    finish(build(), "37_sequence_eg")

"""Example 03: LoopPE with and without a crossfaded seam.

Reference counterpart: examples/03_looping.py.
"""

from _common import SAMPLE_RATE, finish, make_drum_wav, pg


def build():
    total = 6 * SAMPLE_RATE
    src = pg.WavReaderPE(make_drum_wav())
    basic = pg.CropPE(pg.LoopPE(src), 0, total)
    smooth = pg.CropPE(
        pg.LoopPE(pg.WavReaderPE(make_drum_wav()), crossfade_seconds=0.02),
        0,
        total,
    )
    # hard seam first, then the 20 ms-crossfaded loop
    return pg.SequencePE((basic, 0), (smooth, total))


if __name__ == "__main__":
    finish(build(), "03_looping")

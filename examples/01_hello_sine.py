"""Example 01: a C-major triad of sines → gain → crop.

Reference counterpart: examples/01_hello_sine.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    triad = pg.MixPE(
        *[
            pg.SinePE(frequency=float(pg.pitch_to_freq(note)), amplitude=0.3)
            for note in (60, 64, 67)
        ]
    )
    graph = pg.CropPE(pg.GainPE(triad, 0.8), 0, 8 * SAMPLE_RATE)
    return graph


if __name__ == "__main__":
    finish(build(), "01_hello_sine")

"""Example 10: program compression with CompressorPE.

Reference counterpart: examples/10_compression.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    beat = pg.GainPE(
        pg.SuperSawPE(110.0, voices=7, seed=4),
        pg.PeriodicGate(frequency=3.0, duty_cycle=0.3),
    )
    graph = pg.CropPE(
        pg.CompressorPE(beat, threshold=-18.0, ratio=6.0), 0, 5 * SAMPLE_RATE
    )
    return graph


if __name__ == "__main__":
    finish(build(), "10_compression")

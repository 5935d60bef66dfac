"""Example: RandomSelectPE over looped samples (melodic variant).

Reference counterpart: examples/random_select_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    trig = pg.PeriodicTrigger(hz=2.0)
    notes = [60, 63, 65, 67, 70]
    voices = [
        pg.CropPE(
            pg.SinePE(frequency=float(pg.pitch_to_freq(n)), amplitude=0.4),
            0, SAMPLE_RATE // 2,
        )
        for n in notes
    ]
    return pg.CropPE(
        pg.RandomSelectPE(trig, voices, seed=5), 0, 6 * SAMPLE_RATE
    )


if __name__ == "__main__":
    finish(build(), "random_select_eg")

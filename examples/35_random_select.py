"""Example 35: RandomSelectPE — a weighted random drum chooser.

Each trigger rerolls one of three synthesized hits (weights 3:2:1).
Reference counterpart: examples/35_random_select.py.
"""

from _common import SAMPLE_RATE, finish, pg


def _hit(pitch, decay):
    tone = pg.KarplusStrongPE(
        frequency=float(pg.pitch_to_freq(pitch)), seed=pitch, amplitude=0.6
    )
    return pg.CropPE(tone, 0, int(decay * SAMPLE_RATE))


def build():
    trig = pg.PeriodicTrigger(hz=3.0)
    sel = pg.RandomSelectPE(
        trig,
        [_hit(48, 0.5), _hit(60, 0.4), _hit(72, 0.3)],
        weights=[3.0, 2.0, 1.0],
        seed=11,
    )
    return pg.CropPE(sel, 0, 6 * SAMPLE_RATE)


if __name__ == "__main__":
    finish(build(), "35_random_select")

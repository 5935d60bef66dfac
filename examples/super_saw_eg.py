"""Example: SuperSawPE — detuned saw stack, dry then filtered.

Reference counterpart: examples/super_saw_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    seg = 3 * SAMPLE_RATE
    dry = pg.SuperSawPE(frequency=float(pg.pitch_to_freq(45)),
                        amplitude=0.35, voices=7, detune_cents=25.0)
    sweep = pg.PiecewisePE([(0, 300.0), (seg, 6000.0)],
                           transition_type=pg.TransitionType.EXPONENTIAL)
    wet = pg.SVFilterPE(
        pg.SuperSawPE(frequency=float(pg.pitch_to_freq(45)),
                      amplitude=0.35, voices=7, detune_cents=25.0),
        frequency=sweep, q=4.0, mode=pg.BiquadMode.LOWPASS,
    )
    return pg.SequencePE(
        (pg.CropPE(dry, 0, seg), 0), (pg.CropPE(wet, 0, seg), seg)
    )


if __name__ == "__main__":
    finish(build(), "super_saw_eg")

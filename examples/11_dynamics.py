"""Example 11: the dynamics family — compressor, limiter, gate.

A quiet/loud alternating tone runs through CompressorPE, LimiterPE and
an ExpanderPE gate so the level differences are audible back to back.
Reference counterpart: examples/11_dynamics.py.
"""

from _common import SAMPLE_RATE, finish, pg


def _pulsed_tone(seconds: float):
    # 220 Hz tone whose level alternates loud/quiet once per second
    lvl = pg.PiecewisePE(
        [(int(i * 0.5 * SAMPLE_RATE), 1.0 if i % 2 == 0 else 0.12)
         for i in range(int(seconds * 2) + 1)],
        transition_type=pg.TransitionType.STEP,
    )
    return pg.GainPE(pg.SinePE(frequency=220.0, amplitude=0.8), lvl)


def build():
    seg = 3 * SAMPLE_RATE
    comp = pg.CompressorPE(
        _pulsed_tone(3.0), threshold=-18.0, ratio=6.0, attack=0.005,
        release=0.1,
    )
    limit = pg.LimiterPE(_pulsed_tone(3.0), ceiling=-6.0)
    gate = pg.ExpanderPE(_pulsed_tone(3.0), threshold=-15.0)
    return pg.SequencePE(
        (pg.CropPE(comp, 0, seg), 0),
        (pg.CropPE(limit, 0, seg), seg),
        (pg.CropPE(gate, 0, seg), 2 * seg),
    )


if __name__ == "__main__":
    finish(build(), "11_dynamics")

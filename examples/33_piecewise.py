"""Example 33: PiecewisePE pitch curves through each TransitionType.

A C-major arpeggio (C4 E4 G4 C5) drives a saw's frequency; STEP jumps,
LINEAR/EXPONENTIAL/SIGMOID glide differently between notes.
Reference counterpart: examples/33_piecewise.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    notes = [(0, 60), (SAMPLE_RATE, 64), (2 * SAMPLE_RATE, 67),
             (3 * SAMPLE_RATE, 72)]
    seg = 4 * SAMPLE_RATE
    parts = []
    for tt in (pg.TransitionType.STEP, pg.TransitionType.LINEAR,
               pg.TransitionType.EXPONENTIAL, pg.TransitionType.SIGMOID):
        pitch = pg.PiecewisePE(notes, transition_type=tt)
        # TransformPE funcs are traced: jnp equal-temperament formula
        freq = pg.TransformPE(
            pitch, func=lambda p: 440.0 * 2.0 ** ((p - 69.0) / 12.0)
        )
        osc = pg.BlitSawPE(frequency=freq, amplitude=0.35)
        parts.append(pg.CropPE(osc, 0, seg))
    return pg.SequencePE(*[(p, i * seg) for i, p in enumerate(parts)])


if __name__ == "__main__":
    finish(build(), "33_piecewise")

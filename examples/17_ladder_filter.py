"""Example 17: Moog ladder sweep over a supersaw.

Reference counterpart: examples/17_ladder_filter.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    saw = pg.SuperSawPE(65.4, voices=7, detune_cents=18.0, seed=2)
    sweep = pg.PiecewisePE([(0, 120.0), (6 * SAMPLE_RATE, 6000.0)])
    graph = pg.CropPE(
        pg.GainPE(pg.LadderPE(saw, sweep, resonance=0.55), 0.5), 0, 6 * SAMPLE_RATE
    )
    return graph


if __name__ == "__main__":
    finish(build(), "17_ladder_filter")

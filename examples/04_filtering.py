"""Example 04: swept lowpass over noise (BiquadPE + PiecewisePE).

Reference counterpart: examples/04_filtering.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    noise = pg.NoisePE(seed=1)
    sweep = pg.PiecewisePE([(0, 200.0), (4 * SAMPLE_RATE, 8000.0)])
    graph = pg.CropPE(
        pg.GainPE(pg.BiquadPE(noise, sweep, 4.0, mode=pg.BiquadMode.LOWPASS), 0.5),
        0,
        4 * SAMPLE_RATE,
    )
    return graph


if __name__ == "__main__":
    finish(build(), "04_filtering")

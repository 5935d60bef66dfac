"""Example 15: reverse pitch echo on a pluck.

Reference counterpart: examples/15_reverse_pitch_echo.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    dry = pg.SlicePE(pg.KarplusStrongPE(330.0, rho=0.997, seed=5), 0, SAMPLE_RATE)
    fx = pg.ReversePitchEchoPE(
        pg.SetExtentPE(dry, 0, 6 * SAMPLE_RATE),
        block_seconds=0.3,
        pitch_ratio=1.5,
        feedback=0.6,
        max_delay_seconds=0.5,
    )
    graph = pg.MixPE(dry, pg.GainPE(fx, 0.7))
    return graph


if __name__ == "__main__":
    finish(build(), "15_reverse_pitch_echo")

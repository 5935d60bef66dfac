"""Example 06: auto-wah — envelope follower drives a bandpass center.

Reference counterpart: examples/06_autowah.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    src = pg.CachePE(
        pg.GainPE(
            pg.KarplusStrongPE(82.4, rho=0.999, seed=3),  # low E pluck
            pg.PeriodicGate(frequency=2.0, duty_cycle=0.45),
        )
    )
    env = pg.EnvelopePE(src, attack=0.005, release=0.08)
    freq = pg.MixPE(pg.ConstantPE(300.0), pg.GainPE(env, 2500.0))
    graph = pg.CropPE(
        pg.BiquadPE(src, freq, 6.0, mode=pg.BiquadMode.BANDPASS), 0, 6 * SAMPLE_RATE
    )
    return graph


if __name__ == "__main__":
    finish(build(), "06_autowah")

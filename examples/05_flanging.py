"""Example 05: flanger — modulated fractional delay mixed with the dry path.

Reference counterpart: examples/05_flanging.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    src = pg.CachePE(pg.NoisePE(seed=7))
    lfo = pg.SinePE(frequency=0.3, amplitude=40.0)
    delay_mod = pg.MixPE(pg.ConstantPE(50.0), lfo)  # 50 ± 40 samples
    wet = pg.DelayPE(src, delay_mod, max_delay=128)
    graph = pg.CropPE(pg.GainPE(pg.MixPE(src, wet), 0.4), 0, 6 * SAMPLE_RATE)
    return graph


if __name__ == "__main__":
    finish(build(), "05_flanging")

"""Example: ReverbPE — convolution reverb from a synthetic room IR.

The reference convolves with a recorded impulse response; here the IR
is an exponentially decaying noise burst (same ConvolvePE machinery).
Reference counterpart: examples/reverb_eg.py.
"""

import numpy as np

from _common import SAMPLE_RATE, finish, pg


def build():
    rng = np.random.default_rng(2)
    n = int(1.2 * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    ir = (rng.standard_normal(n) * np.exp(-t * 5.0)).astype(np.float32)
    ir_pe = pg.ArrayPE(ir[:, None] * 0.3)

    dryline = pg.SequencePE(
        *[(pg.CropPE(
            pg.SinePE(frequency=float(pg.pitch_to_freq(p)), amplitude=0.4),
            0, SAMPLE_RATE // 3), None)
          for p in (72, 67, 64, 60)]
    )
    return pg.ReverbPE(dryline, ir_pe, mix=0.35)


if __name__ == "__main__":
    finish(build(), "reverb_eg")

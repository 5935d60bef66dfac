"""Example 23: convolution reverb with a synthetic exponential-decay IR.

Reference counterpart: examples/23_convolution.py + reverb_eg.py.
"""

import numpy as np

from _common import SAMPLE_RATE, finish, pg


def build():
    rng = np.random.default_rng(0)
    ir = (rng.uniform(-1, 1, SAMPLE_RATE // 2) * np.exp(-np.arange(SAMPLE_RATE // 2) / 6000)).astype(np.float32)
    dry = pg.SlicePE(pg.KarplusStrongPE(220.0, rho=0.998, seed=9), 0, 2 * SAMPLE_RATE)
    graph = pg.ReverbPE(dry, pg.ArrayPE(ir), mix=0.35)
    return graph


if __name__ == "__main__":
    finish(build(), "23_convolution")

"""Example 07: tanh soft clipping via TransformPE.

Reference counterpart: examples/07_soft_clipping.py.
"""

import jax.numpy as jnp

from _common import SAMPLE_RATE, finish, pg


def build():
    hot = pg.GainPE(pg.SinePE(frequency=110.0), 4.0)
    graph = pg.CropPE(
        pg.GainPE(pg.TransformPE(hot, jnp.tanh), 0.5), 0, 4 * SAMPLE_RATE
    )
    return graph


if __name__ == "__main__":
    finish(build(), "07_soft_clipping")

"""Example 00: template — the minimal shape of a pygmu2_tpu script.

Build a graph, give it a finite extent, bounce it. Copy this file to
start a new example. Reference counterpart: examples/00_template_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    tone = pg.SinePE(frequency=440.0, amplitude=0.4)
    return pg.CropPE(tone, 0, 2 * SAMPLE_RATE)


if __name__ == "__main__":
    finish(build(), "00_template")

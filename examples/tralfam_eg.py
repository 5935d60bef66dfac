"""Example: TralfamPE — spectral scramble (magnitudes kept, phases
randomized) of a chord, so it smears into a texture.

Reference counterpart: examples/tralfam_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    chord = pg.MixPE(
        *[pg.SinePE(frequency=float(pg.pitch_to_freq(n)), amplitude=0.2)
          for n in (48, 55, 64, 71)]
    )
    src = pg.CropPE(chord, 0, 4 * SAMPLE_RATE)
    return pg.TralfamPE(src, seed=3, normalize_peak=0.8)


if __name__ == "__main__":
    finish(build(), "tralfam_eg")

"""Example 08: offline rendering straight to a WAV file.

Reference counterpart: examples/08_write_to_file.py.
"""

from _common import SAMPLE_RATE, pg


def build():
    chord = pg.MixPE(
        *[
            pg.SinePE(frequency=float(pg.pitch_to_freq(n)), amplitude=0.25)
            for n in (57, 60, 64)
        ]
    )
    return pg.CropPE(pg.GainPE(chord, 0.9), 0, 4 * SAMPLE_RATE)


if __name__ == "__main__":
    out = "/tmp/08_write_to_file.wav"
    pg.render_to_file(build(), out)
    print(f"wrote {out}")

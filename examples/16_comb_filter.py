"""Example 16: CombPE — pitched resonance on a percussion hit.

Dry hit, then the same hit through combs tuned to 220 and 440 Hz.
Reference counterpart: examples/16_comb_filter.py.
"""

from _common import SAMPLE_RATE, finish, make_drum_wav, pg


def build():
    seg = 2 * SAMPLE_RATE
    wav = make_drum_wav()

    def hit():
        return pg.LoopPE(pg.WavReaderPE(wav), count=3)

    dry = pg.CropPE(hit(), 0, seg)
    comb220 = pg.CropPE(
        pg.GainPE(pg.CombPE(hit(), frequency=220.0, feedback=0.7), 0.7),
        0, seg,
    )
    comb440 = pg.CropPE(
        pg.GainPE(pg.CombPE(hit(), frequency=440.0, feedback=0.85), 0.7),
        0, seg,
    )
    return pg.SequencePE((dry, 0), (comb220, seg), (comb440, 2 * seg))


if __name__ == "__main__":
    finish(build(), "16_comb_filter")

"""Example 20: the same melody in 12-ET vs just intonation.

Reference counterpart: examples/20_alternative_temperaments.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    melody = [60, 64, 67, 72]
    parts = []
    for idx, temperament in enumerate([pg.EqualTemperament(12), pg.JustIntonation()]):
        for i, note in enumerate(melody):
            f = float(temperament.pitch_to_freq(note))
            tone = pg.SlicePE(
                pg.SinePE(frequency=f, amplitude=0.4), 0, SAMPLE_RATE // 2,
            )
            parts.append((tone, (idx * len(melody) + i) * SAMPLE_RATE // 2))
    graph = pg.SequencePE(parts)
    return graph


if __name__ == "__main__":
    finish(build(), "20_alternative_temperaments")

"""Example 29: plucked-string arpeggio (KarplusStrongPE + SequencePE).

Reference counterpart: examples/29_karplus_strong.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    notes = [57, 60, 64, 67, 64, 60, 57]
    parts = []
    for i, n in enumerate(notes):
        f = float(pg.pitch_to_freq(n))
        rho = pg.rho_for_decay_db(1.2, f, SAMPLE_RATE)
        pluck = pg.SlicePE(pg.KarplusStrongPE(f, rho=rho, seed=i), 0, SAMPLE_RATE)
        parts.append((pluck, i * SAMPLE_RATE // 3))
    graph = pg.SequencePE(parts)
    return graph


if __name__ == "__main__":
    finish(build(), "29_karplus_strong")

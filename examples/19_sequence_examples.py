"""Example 19: SequencePE scheduling — overlap vs non-overlap.

Three tones scheduled at explicit starts (OVERLAP lets tails ring
through the next entry; NON_OVERLAP crops each at the next start).
Reference counterpart: examples/19_sequence_examples.py.
"""

from _common import SAMPLE_RATE, finish, pg


def _pluck(pitch):
    return pg.KarplusStrongPE(
        frequency=float(pg.pitch_to_freq(pitch)), seed=pitch, amplitude=0.5
    )


def build():
    beat = SAMPLE_RATE // 2
    overlap = pg.SequencePE(
        (pg.CropPE(_pluck(60), 0, 2 * SAMPLE_RATE), 0),
        (pg.CropPE(_pluck(64), 0, 2 * SAMPLE_RATE), beat),
        (pg.CropPE(_pluck(67), 0, 2 * SAMPLE_RATE), 2 * beat),
    )
    chopped = pg.SequencePE(
        (pg.CropPE(_pluck(60), 0, 2 * SAMPLE_RATE), 0),
        (pg.CropPE(_pluck(64), 0, 2 * SAMPLE_RATE), beat),
        (pg.CropPE(_pluck(67), 0, 2 * SAMPLE_RATE), 2 * beat),
        mode=pg.SequenceMode.NON_OVERLAP,
    )
    gap = 3 * SAMPLE_RATE
    return pg.SequencePE((overlap, 0), (chopped, gap))


if __name__ == "__main__":
    finish(build(), "19_sequence_examples")

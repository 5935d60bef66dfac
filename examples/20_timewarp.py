"""Example 20: TimeWarpPE — variable-speed "tape head" playback.

Original speed, fixed 1.5x, then an accelerating 0.25x -> 5x warp over
a looped source. Reference counterpart: examples/20_timewarp.py.
"""

from _common import SAMPLE_RATE, finish, make_drum_wav, pg


def build():
    wav = make_drum_wav()

    def looped():
        return pg.LoopPE(pg.WavReaderPE(wav))

    seg = 2 * SAMPLE_RATE
    original = pg.CropPE(looped(), 0, seg)
    fast = pg.CropPE(pg.TimeWarpPE(looped(), rate=1.5), 0, seg)
    ramp = pg.PiecewisePE(
        [(0, 0.25), (4 * SAMPLE_RATE, 5.0)],
        transition_type=pg.TransitionType.EXPONENTIAL,
    )
    accel = pg.CropPE(pg.TimeWarpPE(looped(), rate=ramp), 0, 4 * SAMPLE_RATE)
    return pg.SequencePE((original, 0), (fast, seg), (accel, 2 * seg))


if __name__ == "__main__":
    finish(build(), "20_timewarp")

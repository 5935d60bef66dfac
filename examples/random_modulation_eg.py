"""Example: RandomPE as a modulation source.

A smooth random LFO sweeps a lowpass cutoff over filtered sawtooth
noise, a sample-hold random stream picks pitches, and a bounded random
walk drifts the stereo pan — three RandomPE modes in one patch.

The reference ships RandomPE only as a disabled draft
(src/pygmu2/random_pe.py-disabled); this is the live TPU-native
equivalent (models/random_control.py).
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    # sample-hold random pitch: 4 picks per second from a two-octave range
    pitch = pg.RandomPE(
        rate=4.0, min_value=48.0, max_value=72.0,
        mode=pg.RandomMode.SAMPLE_HOLD, seed=7,
    )
    freq = pg.TransformPE(
        pitch, lambda p: 440.0 * 2.0 ** ((p - 69.0) / 12.0), name="midi2hz"
    )
    voice = pg.BlitSawPE(frequency=freq, amplitude=0.5)

    # smooth random cutoff sweep between 400 Hz and 4 kHz
    cutoff = pg.RandomPE(
        rate=0.7, min_value=400.0, max_value=4000.0,
        mode=pg.RandomMode.SMOOTH, seed=11,
    )
    filtered = pg.SVFilterPE(voice, cutoff, 2.0)

    # random-walk pan drifting around the center
    pan = pg.RandomPE(
        rate=60.0, min_value=-0.8, max_value=0.8,
        mode=pg.RandomMode.WALK, step_size=0.05, seed=13,
    )
    spatial = pg.SpatialPE(filtered, method=pg.SpatialConstantPower(pan))
    return pg.CropPE(spatial, 0, 8 * SAMPLE_RATE)


if __name__ == "__main__":
    finish(build(), "random_modulation_eg")

"""Example: TriggerPE / ResetPE event-driven playback.

A drum-pad pattern: a one-shot TriggerPE fires a Karplus-Strong pluck
that always plays out fully, a gated TriggerPE chops a sustained pad,
and a ResetPE re-anchors a noise sweep on every beat.

The reference ships trigger_pe/reset_pe only as disabled drafts; these
are the live TPU-native equivalents (models/trigger_restart.py).
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    beat = pg.PeriodicTrigger(hz=2.0)

    # one-shot pluck: each beat fires the full clip, retriggers ignored
    pluck = pg.CropPE(pg.KarplusStrongPE(220.0, seed=4, amplitude=0.5),
                      0, SAMPLE_RATE)
    pads = pg.TriggerPE(beat, pluck, mode=pg.TriggerMode.ONE_SHOT)

    # gated chop: a sustained saw cut by a 4 Hz rectangular gate
    saw = pg.CropPE(pg.BlitSawPE(frequency=110.0, amplitude=0.3),
                    0, 8 * SAMPLE_RATE)
    gate = pg.PeriodicGate(frequency=4.0, duty_cycle=0.4)
    chop = pg.TriggerPE(gate, saw, mode=pg.TriggerMode.GATED)

    # reset sweep: a filtered-noise whoosh re-anchored on every beat
    sweep = pg.CropPE(
        pg.GainPE(
            pg.BiquadPE(pg.NoisePE(seed=9), 1200.0, 3.0),
            pg.PiecewisePE([(0, 0.5), (SAMPLE_RATE // 2, 0.0)]),
        ),
        0, SAMPLE_RATE // 2,
    )
    whoosh = pg.ResetPE(sweep, beat)

    mix = pg.MixPE(pads, chop, whoosh)
    return pg.CropPE(mix, 0, 6 * SAMPLE_RATE)


if __name__ == "__main__":
    finish(build(), "trigger_pads_eg")

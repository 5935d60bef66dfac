"""Example: gate- and trigger-driven ADSR envelopes shaping a saw.

Reference counterpart: examples/adsr_eg.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    seg = 4 * SAMPLE_RATE
    gate = pg.PeriodicGate(frequency=1.0, duty_cycle=0.4)
    env_g = pg.AdsrGatedPE(gate, attack_time=0.05, decay_time=0.1,
                           sustain_level=0.6, release_time=0.3)
    gated = pg.GainPE(pg.BlitSawPE(frequency=110.0, amplitude=0.5), env_g)

    trig = pg.PeriodicTrigger(hz=2.0)
    env_t = pg.AdsrTriggeredPE(trig, attack_time=0.01, decay_time=0.08,
                               sustain_time=0.1, sustain_level=0.5,
                               release_time=0.2)
    plucked = pg.GainPE(pg.BlitSawPE(frequency=220.0, amplitude=0.5), env_t)

    return pg.SequencePE(
        (pg.CropPE(gated, 0, seg), 0),
        (pg.CropPE(plucked, 0, seg), seg),
    )


if __name__ == "__main__":
    finish(build(), "adsr_eg")

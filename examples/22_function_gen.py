"""Example 22: FunctionGenPE — the deliberately naive (aliasing)
oscillator, A/B'd against the bandlimited AnalogOscPE at high pitch.

Reference counterpart: examples/22_function_gen.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    seg = 2 * SAMPLE_RATE
    naive_pwm = pg.FunctionGenPE(frequency=110.0, duty_cycle=0.3,
                                 waveform="rectangle")
    morph = pg.PiecewisePE([(0, 0.02), (seg, 0.98)])
    naive_saw = pg.FunctionGenPE(frequency=110.0, duty_cycle=morph,
                                 waveform="sawtooth")
    # A/B at a pitch where aliasing is obvious
    hi = float(pg.pitch_to_freq(96))
    naive_hi = pg.FunctionGenPE(frequency=hi, waveform="rectangle")
    clean_hi = pg.AnalogOscPE(frequency=hi, waveform="rectangle")
    parts = [naive_pwm, naive_saw, naive_hi, clean_hi]
    return pg.SequencePE(
        *[(pg.CropPE(pg.GainPE(p, 0.3), 0, seg), i * seg)
          for i, p in enumerate(parts)]
    )


if __name__ == "__main__":
    finish(build(), "22_function_gen")

"""Example 21: AnalogOscPE — bandlimited PWM and saw/triangle morph.

1) pulse wave with a slow duty LFO, 2) duty morph saw->tri->saw,
3) a small subtractive patch through LadderPE.
Reference counterpart: examples/21_analog_osc.py.
"""

from _common import SAMPLE_RATE, finish, pg


def build():
    seg = 3 * SAMPLE_RATE
    # 1) classic PWM: duty = 0.5 + 0.4 sin(0.5 Hz)
    duty_lfo = pg.TransformPE(
        pg.SinePE(frequency=0.5, amplitude=0.4),
        func=lambda x: x + 0.5,
    )
    pwm = pg.AnalogOscPE(frequency=110.0, duty_cycle=duty_lfo,
                         waveform="rectangle")
    # 2) saw -> triangle -> saw morph
    morph = pg.PiecewisePE([(0, 0.02), (seg // 2, 0.98), (seg, 0.02)])
    tri = pg.AnalogOscPE(frequency=110.0, duty_cycle=morph, waveform="sawtooth")
    # 3) subtractive: osc into a resonant ladder sweep
    sweep = pg.PiecewisePE([(0, 200.0), (seg, 4000.0)],
                           transition_type=pg.TransitionType.EXPONENTIAL)
    patch = pg.LadderPE(
        pg.AnalogOscPE(frequency=55.0, duty_cycle=0.2, waveform="rectangle"),
        frequency=sweep, resonance=0.6,
    )
    parts = [pwm, tri, patch]
    return pg.SequencePE(
        *[(pg.CropPE(pg.GainPE(p, 0.4), 0, seg), i * seg)
          for i, p in enumerate(parts)]
    )


if __name__ == "__main__":
    finish(build(), "21_analog_osc")

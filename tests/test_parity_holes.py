"""Golden-parity for the PEs the round-1 suite left uncovered.

VERDICT round 1 §4: EnvelopePE (PEAK/RMS/lookahead/asymmetric),
PortamentoPE, SlicePE fades, SetExtentPE ExtendMode edges, LoopPE
crossfade seam, TriggerRestartPE — rendered through the actual
reference implementation (tests/ref_oracle.py) and compared at the
≤1e-4 budget. RandomSelectPE's reroll RNG is a documented design
divergence (reference: random.Random.choices; ours: in-graph
counter-based draw), so it gets behavioral tests instead.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from tests.ref_oracle import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference not available")

SR = 44100
TOL = 1e-4


def both(build, start, duration):
    ref.set_sample_rate(SR)
    pg.set_sample_rate(SR)
    ours = build(pg).render(start, duration).data
    theirs = build(ref).render(start, duration).data
    return np.asarray(ours), np.asarray(theirs)


def assert_parity(build, start=0, duration=2048, tol=TOL):
    ours, theirs = both(build, start, duration)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=tol)


class TestEnvelopeParity:
    def _noise_src(self, m):
        rng = np.random.default_rng(9)
        data = (rng.standard_normal((6000, 1)) * 0.5).astype(np.float32)
        return m.ArrayPE(data)

    def test_peak_symmetric(self):
        assert_parity(
            lambda m: m.EnvelopePE(self._noise_src(m), attack=0.01,
                                   release=0.01),
            duration=4096,
        )

    def test_peak_asymmetric(self):
        assert_parity(
            lambda m: m.EnvelopePE(self._noise_src(m), attack=0.002,
                                   release=0.08),
            duration=4096,
        )

    def test_rms_mode(self):
        assert_parity(
            lambda m: m.EnvelopePE(self._noise_src(m), attack=0.01,
                                   release=0.05,
                                   mode=m.DetectionMode.RMS),
            duration=4096, tol=5e-4,
        )

    def test_lookahead(self):
        assert_parity(
            lambda m: m.EnvelopePE(self._noise_src(m), attack=0.01,
                                   release=0.05, lookahead=0.005),
            duration=4096,
        )

    def test_chunked_matches_oneshot(self):
        pg.set_sample_rate(SR)
        rng = np.random.default_rng(9)
        data = (rng.standard_normal((6000, 1)) * 0.5).astype(np.float32)

        def mk():
            return pg.EnvelopePE(pg.ArrayPE(data), attack=0.002,
                                 release=0.08)

        one = mk().render(0, 4096).data
        pe = mk()
        chunks = [pe.render(s, 512).data for s in range(0, 4096, 512)]
        np.testing.assert_allclose(
            np.concatenate(chunks), one, atol=2e-5
        )


class TestPortamentoBehavior:
    """Analytic oracle instead of golden parity: the reference's
    PortamentoPE cannot run (it is not exported from the package and
    its composite passes SequencePE(channels=...), a keyword the
    reference's own SequencePE rejects — portamento_pe.py:254)."""

    NOTES = [(60.0, 0, 4000), (67.0, 4000, 4000), (64.0, 8000, 2000)]

    def _render(self, **kw):
        pg.set_sample_rate(SR)
        pe = pg.PortamentoPE(self.NOTES, **kw)
        return np.asarray(pe.render(0, 10000).data)[:, 0]

    def test_holds_note_pitches_between_glides(self):
        out = self._render()
        # segment interiors sit exactly on the note pitch
        assert abs(out[2000] - 60.0) < 1e-4
        assert abs(out[6500] - 67.0) < 1e-4
        assert abs(out[9500] - 64.0) < 1e-4

    def test_glides_are_monotone(self):
        out = self._render()
        up = out[3800:4600]     # 60 -> 67 transition window
        down = out[7800:8600]   # 67 -> 64
        assert np.all(np.diff(up) >= -1e-6)
        assert np.all(np.diff(down) <= 1e-6)
        assert up.min() >= 60.0 - 1e-4 and up.max() <= 67.0 + 1e-4

    def test_ramp_fraction_limits_glide_length(self):
        fast = self._render(max_ramp_seconds=0.01)
        # with a 10 ms cap the glide completes within ~441 samples
        assert abs(fast[4600] - 67.0) < 1e-4

    def test_extent_is_infinite_like_reference(self):
        # the reference's _compute_extent returns Extent(None, None)
        # (portamento_pe.py:268-272): the control stream holds the last
        # pitch forever
        pg.set_sample_rate(SR)
        ext = pg.PortamentoPE(self.NOTES).extent()
        assert ext.start is None and ext.end is None


class TestSliceParity:
    def _src(self, m):
        return m.CropPE(m.SinePE(frequency=330.0, amplitude=0.8), 0, 8000)

    def test_plain_slice_reorigins(self):
        assert_parity(
            lambda m: m.SlicePE(self._src(m), 2000, 3000), duration=4000
        )

    def test_fade_in_out(self):
        assert_parity(
            lambda m: m.SlicePE(self._src(m), 1000, 4000,
                                fade_in_seconds=0.02,
                                fade_out_seconds=0.03),
            duration=5000,
        )

    def test_fade_in_samples_edge(self):
        # fades longer than the slice: the reference clamps
        assert_parity(
            lambda m: m.SlicePE(self._src(m), 0, 800,
                                fade_in_seconds=0.05,
                                fade_out_seconds=0.05),
            duration=1000,
        )


class TestSetExtentParity:
    def _src(self, m):
        return m.CropPE(m.IdentityPE(), 100, 200)  # extent [100, 300)

    @pytest.mark.parametrize(
        "mode", ["ZERO", "HOLD_FIRST", "HOLD_LAST", "HOLD_BOTH"]
    )
    def test_extend_modes(self, mode):
        assert_parity(
            lambda m: m.SetExtentPE(
                self._src(m), 0, 600, getattr(m.ExtendMode, mode)
            ),
            duration=700,
        )

    def test_truncation(self):
        assert_parity(
            lambda m: m.SetExtentPE(self._src(m), 150, 100), duration=400
        )

    def test_infinite_extent(self):
        assert_parity(
            lambda m: m.SetExtentPE(self._src(m), None, None,
                                    m.ExtendMode.HOLD_BOTH),
            start=-50, duration=500,
        )


class TestLoopParity:
    def _src(self, m):
        # a 500-sample ramp so seams are visible
        data = np.linspace(0, 1, 500, dtype=np.float32)[:, None]
        return m.ArrayPE(data)

    def test_infinite_loop(self):
        assert_parity(lambda m: m.LoopPE(self._src(m)), duration=2200)

    def test_counted_loop(self):
        assert_parity(
            lambda m: m.LoopPE(self._src(m), count=3), duration=2000
        )

    def test_loop_region(self):
        assert_parity(
            lambda m: m.LoopPE(self._src(m), loop_start=100, loop_end=400),
            duration=1500,
        )

    def test_crossfade_seam(self):
        assert_parity(
            lambda m: m.LoopPE(self._src(m), crossfade_seconds=0.002),
            duration=2200, tol=5e-4,
        )


class TestTriggerRestartParity:
    def test_restart_reorigins_time(self):
        def build(m):
            trig = m.PeriodicTrigger(hz=SR / 700.0)  # every ~700 samples
            src = m.CropPE(m.IdentityPE(), 0, 500)
            return m.TriggerRestartPE(trig, src)

        assert_parity(build, duration=2500)

    def test_restart_stateful_source(self):
        # NB: the stateful node must be the DIRECT child. The
        # reference's reset_state is shallow (processing_element.py:
        # 277-294 calls only the immediate child's _reset_state), so a
        # pass-through wrapper over a stateful source insulates it from
        # the restart there; our engine resets the wrapped subgraph —
        # documented design divergence (deep reset is what the restart
        # semantics intend). A ringing biquad over an impulse has its
        # state at the direct child, where both agree.
        def build(m):
            trig = m.PeriodicTrigger(hz=SR / 900.0)
            ping = m.CropPE(m.DiracPE(), 0, 800)
            src = m.BiquadPE(
                ping, 880.0, 20.0, mode=m.BiquadMode.BANDPASS
            )
            return m.TriggerRestartPE(trig, src)

        # Q=20 ringing amplifies f32-vs-f64 rounding: ~5e-4 worst
        assert_parity(build, duration=2700, tol=1e-3)


class TestRandomSelectBehavior:
    """Design divergence: the reroll RNG differs from the reference, so
    assert the contract rather than samples."""

    def _voices(self):
        return [
            pg.CropPE(pg.ConstantPE(float(v)), 0, 300) for v in (1, 2, 3)
        ]

    def test_output_is_one_of_the_inputs(self):
        pg.set_sample_rate(SR)
        trig = pg.PeriodicTrigger(hz=SR / 400.0)
        sel = pg.RandomSelectPE(trig, self._voices(), seed=3)
        out = np.asarray(sel.render(0, 2000).data)[:, 0]
        vals = set(np.unique(out[np.abs(out) > 0]).round(4))
        assert vals.issubset({1.0, 2.0, 3.0})
        assert len(vals) >= 2  # rerolls actually happen

    def test_seed_reproducible(self):
        pg.set_sample_rate(SR)

        def run():
            trig = pg.PeriodicTrigger(hz=SR / 400.0)
            sel = pg.RandomSelectPE(trig, self._voices(), seed=42)
            return np.asarray(sel.render(0, 2000).data)

        np.testing.assert_array_equal(run(), run())

    def test_weights_bias_selection(self):
        pg.set_sample_rate(SR)
        trig = pg.PeriodicTrigger(hz=SR / 350.0)
        sel = pg.RandomSelectPE(
            trig, self._voices(), weights=[50.0, 1.0, 1.0], seed=0
        )
        out = np.asarray(sel.render(0, 20000).data)[:, 0]
        ones = (np.abs(out - 1.0) < 1e-6).sum()
        others = (np.abs(out - 2.0) < 1e-6).sum() + (
            np.abs(out - 3.0) < 1e-6
        ).sum()
        assert ones > 3 * max(others, 1)

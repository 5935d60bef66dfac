"""Biquad / SVF golden-parity tests against scipy reference filters."""

import numpy as np
import pytest
from scipy import signal

from pygmu2_tpu import (
    ArrayPE,
    BiquadMode,
    BiquadPE,
    ConstantPE,
    DiracPE,
    Extent,
    NoisePE,
    PiecewisePE,
    SVFilterPE,
)

SR = 44100


def rbj_coeffs(mode, freq, q, gain_db, sr=SR):
    """Independent numpy implementation of the RBJ cookbook for testing."""
    w = 2 * np.pi * freq / sr
    sin_w, cos_w = np.sin(w), np.cos(w)
    alpha = sin_w / (2 * q)
    A = 10 ** (gain_db / 40)
    if mode == BiquadMode.LOWPASS:
        b = [(1 - cos_w) / 2, 1 - cos_w, (1 - cos_w) / 2]
        a = [1 + alpha, -2 * cos_w, 1 - alpha]
    elif mode == BiquadMode.HIGHPASS:
        b = [(1 + cos_w) / 2, -(1 + cos_w), (1 + cos_w) / 2]
        a = [1 + alpha, -2 * cos_w, 1 - alpha]
    elif mode == BiquadMode.BANDPASS:
        b = [alpha, 0.0, -alpha]
        a = [1 + alpha, -2 * cos_w, 1 - alpha]
    elif mode == BiquadMode.NOTCH:
        b = [1.0, -2 * cos_w, 1.0]
        a = [1 + alpha, -2 * cos_w, 1 - alpha]
    elif mode == BiquadMode.ALLPASS:
        b = [1 - alpha, -2 * cos_w, 1 + alpha]
        a = [1 + alpha, -2 * cos_w, 1 - alpha]
    elif mode == BiquadMode.PEAKING:
        b = [1 + alpha * A, -2 * cos_w, 1 - alpha * A]
        a = [1 + alpha / A, -2 * cos_w, 1 - alpha / A]
    else:
        raise ValueError(mode)
    b = np.array(b) / a[0]
    a = np.array(a) / a[0]
    return b, a


@pytest.fixture
def noise_sig():
    rng = np.random.default_rng(123)
    return rng.uniform(-1, 1, 4096).astype(np.float32)


class TestBiquadConstant:
    @pytest.mark.parametrize(
        "mode",
        [
            BiquadMode.LOWPASS,
            BiquadMode.HIGHPASS,
            BiquadMode.BANDPASS,
            BiquadMode.NOTCH,
            BiquadMode.ALLPASS,
            BiquadMode.PEAKING,
        ],
    )
    def test_matches_scipy_lfilter(self, noise_sig, mode):
        pe = BiquadPE(ArrayPE(noise_sig), 1000.0, 2.0, mode=mode, gain_db=6.0)
        y = pe.render(0, len(noise_sig)).data[:, 0]
        b, a = rbj_coeffs(mode, 1000.0, 2.0, 6.0)
        expect = signal.lfilter(b, a, noise_sig.astype(np.float64))
        np.testing.assert_allclose(y, expect, atol=2e-4)

    def test_shelf_impulse_dc_gain(self):
        pe = BiquadPE(
            DiracPE(), 500.0, 0.707, mode=BiquadMode.LOWSHELF, gain_db=12.0
        )
        h = pe.render(0, 8192).data[:, 0].astype(np.float64)
        dc = h.sum()  # DC gain of a +12 dB low shelf ≈ 3.98
        np.testing.assert_allclose(dc, 10 ** (12 / 20), rtol=1e-3)

    def test_block_invariance(self, noise_sig):
        one = BiquadPE(ArrayPE(noise_sig), 800.0, 5.0).render(0, 4096).data
        pe = BiquadPE(ArrayPE(noise_sig), 800.0, 5.0)
        parts = [pe.render(i * 1024, 1024).data for i in range(4)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)

    def test_stereo_channels_independent(self):
        sig = np.zeros((64, 2), np.float32)
        sig[0, 0] = 1.0  # impulse only on left
        pe = BiquadPE(ArrayPE(sig), 1000.0, 1.0)
        y = pe.render(0, 64).data
        assert np.abs(y[:, 0]).sum() > 0
        np.testing.assert_allclose(y[:, 1], 0.0, atol=1e-7)

    def test_extent_and_purity(self):
        pe = BiquadPE(ArrayPE(np.ones(10, np.float32)), 100.0, 1.0)
        assert pe.extent() == Extent(0, 10)
        assert pe.is_pure() is False


class TestBiquadModulated:
    def test_swept_filter_matches_per_sample_reference(self, noise_sig):
        n = len(noise_sig)
        sweep = PiecewisePE([(0, 200.0), (n, 8000.0)])
        pe = BiquadPE(ArrayPE(noise_sig), sweep, 2.0, mode=BiquadMode.LOWPASS)
        y = pe.render(0, n).data[:, 0]

        # Per-sample float64 reference (direct form I, coefficients at the
        # output sample — the reference's time-varying convention).
        freqs = 200.0 + (8000.0 - 200.0) * np.arange(n) / n
        x1 = x2 = y1 = y2 = 0.0
        expect = np.zeros(n)
        for i in range(n):
            b, a = rbj_coeffs(BiquadMode.LOWPASS, freqs[i], 2.0, 0.0)
            x = float(noise_sig[i])
            yi = b[0] * x + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2
            x2, x1 = x1, x
            y2, y1 = y1, yi
            expect[i] = yi
        # f32 parallel-scan reassociation vs the f64 serial loop; the
        # binding bound is the reference-oracle parity test (5e-4).
        np.testing.assert_allclose(y, expect, atol=2e-3)

    def test_impure_with_pe_params(self):
        pe = BiquadPE(ConstantPE(0.0), PiecewisePE([(0, 100.0)]), 1.0)
        assert not pe.is_pure()
        assert len(pe.inputs()) == 2


class TestSVF:
    @pytest.mark.parametrize(
        "mode",
        [BiquadMode.LOWPASS, BiquadMode.HIGHPASS, BiquadMode.BANDPASS],
    )
    def test_frequency_response_close_to_biquad(self, mode):
        # SVF and RBJ biquad are different discretizations of the same
        # analog prototype: magnitude responses agree well below Nyquist.
        # The SVF band output convention carries 2× gain (k·band peak; the
        # reference SVF measures the same factor).
        imp = DiracPE()
        n = 16384
        y_svf = SVFilterPE(imp, 1000.0, 2.0, mode=mode).render(0, n).data[:, 0]
        y_bq = BiquadPE(DiracPE(), 1000.0, 2.0, mode=mode).render(0, n).data[:, 0]
        gain = 2.0 if mode == BiquadMode.BANDPASS else 1.0
        H_svf = np.abs(np.fft.rfft(y_svf.astype(np.float64))) / gain
        H_bq = np.abs(np.fft.rfft(y_bq.astype(np.float64)))
        freqs = np.fft.rfftfreq(n, 1 / SR)
        band = (freqs > 100) & (freqs < 5000)
        db_err = 20 * np.log10((H_svf[band] + 1e-9) / (H_bq[band] + 1e-9))
        assert np.abs(db_err).max() < 1.0  # within 1 dB in-band

    def test_allpass_rejected(self):
        with pytest.raises(ValueError):
            SVFilterPE(ConstantPE(0.0), 100.0, 1.0, mode=BiquadMode.ALLPASS)

    def test_block_invariance(self, noise_sig):
        one = SVFilterPE(ArrayPE(noise_sig), 500.0, 3.0).render(0, 4096).data
        pe = SVFilterPE(ArrayPE(noise_sig), 500.0, 3.0)
        parts = [pe.render(i * 512, 512).data for i in range(8)]
        np.testing.assert_allclose(np.concatenate(parts), one, atol=1e-4)

    def test_lowpass_passes_dc_blocks_hf(self):
        lo = SVFilterPE(ConstantPE(1.0), 2000.0, 0.707).render(0, 2000).data
        np.testing.assert_allclose(lo[-1, 0], 1.0, atol=1e-2)


class TestFilteredNoiseGraph:
    def test_autowah_style_graph_runs(self):
        src = NoisePE(seed=5)
        sweep = PiecewisePE([(0, 300.0), (4096, 3000.0)])
        pe = BiquadPE(src, sweep, 5.0, mode=BiquadMode.BANDPASS)
        s = pe.render(0, 2048)
        assert s.duration == 2048
        assert np.isfinite(s.data).all()

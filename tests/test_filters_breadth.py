"""BiquadPE / SVFilterPE behavior breadth.

Mirrors reference tests/test_biquad_pe.py:26-560 and
test_svfilter_pe.py:25-340 beyond test_filters.py's scipy-parity core:
construction surfaces for every mode, scalar-vs-PE parameters,
per-mode frequency-response laws (DC/Nyquist behavior), shelving and
peaking gains, impulse decay, and state continuity.
"""

import numpy as np
import pytest

from pygmu2_tpu import (
    ArrayPE,
    BiquadPE,
    ConstantPE,
    DiracPE,
    SinePE,
    SVFilterPE,
)
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.models.modes import BiquadMode
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


def dc(n=4096, level=1.0):
    return ArrayPE(np.full(n, level, np.float32))


def tone(freq, n=4096, amp=1.0):
    t = np.arange(n) / SR
    return ArrayPE((amp * np.sin(2 * np.pi * freq * t)).astype(np.float32))


def steady_rms(pe, n=4096, skip=2048):
    d = np.asarray(pe.render(0, n).data)[skip:, 0]
    return float(np.sqrt(np.mean(d**2)))


ALL_BIQUAD_MODES = [
    BiquadMode.LOWPASS, BiquadMode.HIGHPASS, BiquadMode.BANDPASS,
    BiquadMode.NOTCH, BiquadMode.ALLPASS, BiquadMode.PEAKING,
    BiquadMode.LOWSHELF, BiquadMode.HIGHSHELF,
]


class TestBiquadPEBasics:
    def test_create_lowpass_default(self):
        pe = BiquadPE(dc(), 1000.0, 0.707)
        assert pe.mode == BiquadMode.LOWPASS

    @pytest.mark.parametrize("mode", ALL_BIQUAD_MODES)
    def test_create_all_modes(self, mode):
        pe = BiquadPE(dc(), 1000.0, 0.707, mode=mode)
        assert pe.mode == mode
        d = np.asarray(pe.render(0, 64).data)
        assert np.isfinite(d).all()

    def test_inputs_constant_params(self):
        src = dc()
        assert BiquadPE(src, 1000.0, 0.707).inputs() == [src]

    def test_inputs_with_pe_frequency(self):
        src, f = dc(), ConstantPE(500.0)
        assert f in BiquadPE(src, f, 0.707).inputs()

    def test_inputs_with_pe_q(self):
        src, q = dc(), ConstantPE(2.0)
        assert q in BiquadPE(src, 440.0, q).inputs()

    def test_inputs_with_both_pe(self):
        src, f, q = dc(), ConstantPE(500.0), ConstantPE(2.0)
        ins = BiquadPE(src, f, q).inputs()
        assert src in ins and f in ins and q in ins

    def test_is_not_pure(self):
        assert BiquadPE(dc(), 1000.0, 0.707).is_pure() is False

    def test_channel_count_passthrough(self):
        stereo = ArrayPE(np.zeros((64, 2), np.float32))
        assert BiquadPE(stereo, 1000.0, 0.707).channel_count() == 2

    def test_extent_from_source(self):
        assert BiquadPE(dc(128), 1000.0, 0.707).extent() == Extent(0, 128)

    def test_repr(self):
        r = repr(BiquadPE(dc(), 1000.0, 0.707, mode=BiquadMode.NOTCH))
        assert "BiquadPE" in r and "notch" in r


class TestBiquadPEResponse:
    def test_lowpass_passes_dc(self):
        pe = BiquadPE(dc(), 1000.0, 0.707, mode=BiquadMode.LOWPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert d[-1] == pytest.approx(1.0, abs=0.01)

    def test_lowpass_attenuates_high_freq(self):
        hf = tone(15000)
        wet = steady_rms(BiquadPE(hf, 500.0, 0.707, mode=BiquadMode.LOWPASS))
        dry = steady_rms(hf)
        assert wet < dry * 0.05

    def test_highpass_blocks_dc(self):
        pe = BiquadPE(dc(), 1000.0, 0.707, mode=BiquadMode.HIGHPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert abs(d[-1]) < 1e-3

    def test_highpass_passes_high_freq(self):
        hf = tone(15000)
        wet = steady_rms(BiquadPE(hf, 500.0, 0.707, mode=BiquadMode.HIGHPASS))
        dry = steady_rms(hf)
        assert wet == pytest.approx(dry, rel=0.1)

    def test_bandpass_blocks_dc(self):
        pe = BiquadPE(dc(), 1000.0, 2.0, mode=BiquadMode.BANDPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert abs(d[-1]) < 1e-3

    def test_bandpass_passes_center(self):
        c = tone(1000)
        wet = steady_rms(BiquadPE(c, 1000.0, 2.0, mode=BiquadMode.BANDPASS))
        dry = steady_rms(c)
        assert wet == pytest.approx(dry, rel=0.15)

    def test_notch_passes_dc(self):
        pe = BiquadPE(dc(), 1000.0, 2.0, mode=BiquadMode.NOTCH)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert d[-1] == pytest.approx(1.0, abs=0.01)

    def test_notch_kills_center(self):
        c = tone(1000)
        wet = steady_rms(BiquadPE(c, 1000.0, 5.0, mode=BiquadMode.NOTCH))
        dry = steady_rms(c)
        assert wet < dry * 0.1

    def test_allpass_preserves_magnitude(self):
        c = tone(3000)
        wet = steady_rms(BiquadPE(c, 1000.0, 0.707, mode=BiquadMode.ALLPASS))
        dry = steady_rms(c)
        assert wet == pytest.approx(dry, rel=0.02)

    def test_impulse_response_decays(self):
        pe = BiquadPE(DiracPE(), 1000.0, 2.0, mode=BiquadMode.LOWPASS)
        d = np.asarray(pe.render(0, 8192).data)[:, 0]
        head = np.abs(d[:512]).max()
        tail = np.abs(d[-512:]).max()
        assert tail < head * 1e-3

    def test_peaking_boost_at_center(self):
        c = tone(1000, amp=0.1)
        wet = steady_rms(
            BiquadPE(c, 1000.0, 1.0, mode=BiquadMode.PEAKING, gain_db=12.0)
        )
        dry = steady_rms(c)
        assert 20 * np.log10(wet / dry) == pytest.approx(12.0, abs=1.0)

    def test_peaking_cut_at_center(self):
        c = tone(1000)
        wet = steady_rms(
            BiquadPE(c, 1000.0, 1.0, mode=BiquadMode.PEAKING, gain_db=-12.0)
        )
        dry = steady_rms(c)
        assert 20 * np.log10(wet / dry) == pytest.approx(-12.0, abs=1.0)

    def test_lowshelf_boosts_dc(self):
        pe = BiquadPE(dc(8192, level=0.1), 1000.0, 0.707,
                      mode=BiquadMode.LOWSHELF, gain_db=6.0)
        d = np.asarray(pe.render(0, 8192).data)[:, 0]
        assert 20 * np.log10(d[-1] / 0.1) == pytest.approx(6.0, abs=0.5)

    def test_highshelf_passes_dc_unchanged(self):
        pe = BiquadPE(dc(8192, level=0.5), 1000.0, 0.707,
                      mode=BiquadMode.HIGHSHELF, gain_db=12.0)
        d = np.asarray(pe.render(0, 8192).data)[:, 0]
        assert d[-1] == pytest.approx(0.5, abs=0.02)

    def test_frequency_sweep_runs_finite(self):
        sweep = ConstantPE(0.0)  # placeholder; real sweep below
        f = ArrayPE(np.linspace(200, 8000, 4096).astype(np.float32))
        pe = BiquadPE(tone(1000), f, 0.707)
        d = np.asarray(pe.render(0, 4096).data)
        assert np.isfinite(d).all()

    def test_q_modulation_runs_finite(self):
        q = ArrayPE(np.linspace(0.5, 8.0, 4096).astype(np.float32))
        pe = BiquadPE(tone(1000), 1000.0, q)
        d = np.asarray(pe.render(0, 4096).data)
        assert np.isfinite(d).all()

    def test_state_persists_across_contiguous_renders(self):
        def make():
            return BiquadPE(tone(300, n=2048), 500.0, 0.707)

        whole = np.asarray(make().render(0, 2048).data)
        pe = make()
        parts = np.concatenate(
            [np.asarray(pe.render(s, 512).data) for s in range(0, 2048, 512)]
        )
        np.testing.assert_allclose(parts, whole, atol=5e-5)

    def test_stereo_channels_filter_independently(self):
        left = np.sin(2 * np.pi * 100 * np.arange(2048) / SR)
        right = np.sin(2 * np.pi * 15000 * np.arange(2048) / SR)
        src = ArrayPE(np.column_stack([left, right]).astype(np.float32))
        pe = BiquadPE(src, 1000.0, 0.707, mode=BiquadMode.LOWPASS)
        d = np.asarray(pe.render(0, 2048).data)[1024:]
        assert np.sqrt((d[:, 0] ** 2).mean()) > 10 * np.sqrt((d[:, 1] ** 2).mean())


class TestSVFilterPEBreadth:
    SUPPORTED = [
        BiquadMode.LOWPASS, BiquadMode.HIGHPASS, BiquadMode.BANDPASS,
        BiquadMode.NOTCH, BiquadMode.PEAKING, BiquadMode.LOWSHELF,
        BiquadMode.HIGHSHELF,
    ]

    def test_create_lowpass_default(self):
        assert SVFilterPE(dc(), 1000.0, 0.707).mode == BiquadMode.LOWPASS

    @pytest.mark.parametrize("mode", SUPPORTED)
    def test_create_all_supported_modes(self, mode):
        pe = SVFilterPE(dc(), 1000.0, 0.707, mode=mode)
        d = np.asarray(pe.render(0, 64).data)
        assert np.isfinite(d).all()

    def test_rejects_allpass(self):
        with pytest.raises(ValueError, match="ALLPASS"):
            SVFilterPE(dc(), 1000.0, 0.707, mode=BiquadMode.ALLPASS)

    def test_pe_frequency_listed_as_input(self):
        f = ConstantPE(500.0)
        assert f in SVFilterPE(dc(), f, 0.707).inputs()

    def test_is_not_pure(self):
        assert SVFilterPE(dc(), 1000.0, 0.707).is_pure() is False

    def test_channel_count_passthrough(self):
        stereo = ArrayPE(np.zeros((64, 2), np.float32))
        assert SVFilterPE(stereo, 1000.0, 0.707).channel_count() == 2

    def test_repr(self):
        assert "SVFilterPE" in repr(SVFilterPE(dc(), 1000.0, 0.707))

    def test_lowpass_passes_dc(self):
        pe = SVFilterPE(dc(), 1000.0, 0.707, mode=BiquadMode.LOWPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert d[-1] == pytest.approx(1.0, abs=0.01)

    def test_lowpass_attenuates_high_freq(self):
        hf = tone(15000)
        wet = steady_rms(SVFilterPE(hf, 500.0, 0.707, mode=BiquadMode.LOWPASS))
        assert wet < steady_rms(hf) * 0.05

    def test_highpass_blocks_dc(self):
        pe = SVFilterPE(dc(), 1000.0, 0.707, mode=BiquadMode.HIGHPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert abs(d[-1]) < 1e-3

    def test_bandpass_blocks_dc(self):
        pe = SVFilterPE(dc(), 1000.0, 2.0, mode=BiquadMode.BANDPASS)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert abs(d[-1]) < 1e-3

    def test_notch_passes_dc(self):
        pe = SVFilterPE(dc(), 1000.0, 2.0, mode=BiquadMode.NOTCH)
        d = np.asarray(pe.render(0, 4096).data)[:, 0]
        assert d[-1] == pytest.approx(1.0, abs=0.01)

    def test_peaking_boost_at_center(self):
        c = tone(1000, amp=0.1)
        wet = steady_rms(
            SVFilterPE(c, 1000.0, 1.0, mode=BiquadMode.PEAKING, gain_db=12.0)
        )
        dry = steady_rms(c)
        assert 20 * np.log10(wet / dry) == pytest.approx(12.0, abs=1.5)

    def test_frequency_sweep_runs_finite(self):
        f = ArrayPE(np.linspace(200, 8000, 4096).astype(np.float32))
        d = np.asarray(SVFilterPE(tone(1000), f, 0.707).render(0, 4096).data)
        assert np.isfinite(d).all()

    def test_q_modulation_runs_finite(self):
        q = ArrayPE(np.linspace(0.5, 8.0, 4096).astype(np.float32))
        d = np.asarray(SVFilterPE(tone(1000), 1000.0, q).render(0, 4096).data)
        assert np.isfinite(d).all()

    def test_state_persists_across_contiguous_renders(self):
        def make():
            return SVFilterPE(tone(300, n=2048), 500.0, 0.707)

        whole = np.asarray(make().render(0, 2048).data)
        pe = make()
        parts = np.concatenate(
            [np.asarray(pe.render(s, 512).data) for s in range(0, 2048, 512)]
        )
        np.testing.assert_allclose(parts, whole, atol=5e-5)

    def test_stereo_channels_filter_independently(self):
        left = np.sin(2 * np.pi * 100 * np.arange(2048) / SR)
        right = np.sin(2 * np.pi * 15000 * np.arange(2048) / SR)
        src = ArrayPE(np.column_stack([left, right]).astype(np.float32))
        pe = SVFilterPE(src, 1000.0, 0.707, mode=BiquadMode.LOWPASS)
        d = np.asarray(pe.render(0, 2048).data)[1024:]
        assert np.sqrt((d[:, 0] ** 2).mean()) > 10 * np.sqrt((d[:, 1] ** 2).mean())

"""BlitSawPE / SuperSawPE behavior breadth — the reference cases not
already covered by test_microedge_oscillators.py (reference:
tests/test_blit_saw_pe.py:24-600, test_super_saw_pe.py:25-460):
PE-valued parameters, cycle counting, negative starts, alternate sample
rates, and detune geometry.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import ArrayPE, BlitSawPE, ConstantPE, CropPE, SuperSawPE
pytestmark = pytest.mark.slow  # breadth/fuzz sweep (minutes); fast set = -m 'not slow'

SR = 44100


def render(pe, start, dur):
    return np.asarray(pe.render(start, dur).data)


class TestBlitSawBreadth:
    def test_render_frequency_cycle_count(self):
        # 100 Hz over 1 s: ~100 upward zero crossings (the band-limited
        # saw has no sharp resets to count — max per-sample drop ~0.22)
        d = render(BlitSawPE(frequency=100.0), 0, SR)[:, 0]
        ups = np.sum((d[:-1] < 0) & (d[1:] >= 0))
        assert ups == pytest.approx(100, abs=3)

    def test_render_negative_start_defined(self):
        d = render(BlitSawPE(frequency=220.0), -1000, 500)
        assert np.isfinite(d).all()
        assert np.abs(d).max() > 0.01

    def test_single_sample(self):
        d = render(BlitSawPE(frequency=220.0), 0, 1)
        assert d.shape == (1, 1)
        assert np.isfinite(d).all()

    def test_frequency_from_pe(self):
        f = ConstantPE(220.0)
        pe = BlitSawPE(frequency=f)
        assert f in pe.inputs()
        d = render(pe, 0, SR // 4)[:, 0]
        ups = np.sum((d[:-1] < 0) & (d[1:] >= 0))
        assert ups == pytest.approx(55, abs=3)

    def test_amplitude_from_pe(self):
        ramp = ArrayPE(np.linspace(0, 1, 2000, dtype=np.float32))
        pe = BlitSawPE(frequency=220.0, amplitude=ramp)
        d = render(pe, 0, 2000)[:, 0]
        head = np.abs(d[:200]).max()
        tail = np.abs(d[-200:]).max()
        assert tail > 4 * head  # amplitude follows the ramp

    def test_m_from_pe_renders(self):
        m = ConstantPE(21.0)
        pe = BlitSawPE(frequency=220.0, m=m)
        assert m in pe.inputs()
        d = render(pe, 0, 1024)
        assert np.isfinite(d).all()

    def test_extent_with_pe_frequency_intersects(self):
        f = CropPE(ConstantPE(220.0), 0, 1000)
        ext = BlitSawPE(frequency=f).extent()
        assert ext.start == 0 and ext.end == 1000

    def test_extent_disjoint_pe_inputs_no_crash(self):
        f = CropPE(ConstantPE(220.0), 0, 100)
        a = CropPE(ConstantPE(0.5), 500, 100)
        pe = BlitSawPE(frequency=f, amplitude=a)
        assert pe.extent().is_empty()
        d = render(pe, 0, 64)
        assert np.isfinite(d).all()

    def test_sample_rate_22050_fundamental(self):
        pg.set_sample_rate(22050)
        try:
            d = render(BlitSawPE(frequency=441.0), 0, 4096)[:, 0]
            freqs = np.fft.rfftfreq(4096, 1 / 22050)
            spec = np.abs(np.fft.rfft(d * np.hanning(4096)))
            lo = spec[(freqs > 350) & (freqs < 530)].max()
            assert lo > 0.3 * spec.max()  # fundamental present at 441
        finally:
            pg.set_sample_rate(SR)

    def test_sawtooth_dc_averages_near_zero(self):
        d = render(BlitSawPE(frequency=220.0), 2000, SR // 2)[:, 0]
        assert abs(d.mean()) < 0.05


class TestSuperSawBreadth:
    def test_detune_ratios_symmetric_about_center(self):
        # detuned voices beat symmetrically: the spectrum around the
        # fundamental is symmetric (upper/lower sideband energies match)
        pe = SuperSawPE(frequency=441.0, voices=7, detune_cents=30.0,
                        seed=1, randomize_phase=False)
        d = render(pe, 0, 1 << 14)[:, 0]
        freqs = np.fft.rfftfreq(1 << 14, 1 / SR)
        spec = np.abs(np.fft.rfft(d * np.hanning(1 << 14)))
        lo = spec[(freqs > 410) & (freqs < 440)].sum()
        hi = spec[(freqs > 442) & (freqs < 472)].sum()
        assert lo == pytest.approx(hi, rel=0.5)

    def test_more_detune_wider_spread(self):
        def spread(cents):
            pe = SuperSawPE(frequency=441.0, voices=7, detune_cents=cents,
                            seed=1)
            d = render(pe, 0, 1 << 14)[:, 0]
            freqs = np.fft.rfftfreq(1 << 14, 1 / SR)
            spec = np.abs(np.fft.rfft(d * np.hanning(1 << 14)))
            band = (freqs > 300) & (freqs < 600)
            p = spec[band] / spec[band].sum()
            f = freqs[band]
            mean = (p * f).sum()
            return np.sqrt((p * (f - mean) ** 2).sum())

        assert spread(50.0) > spread(5.0)

    def test_frequency_from_pe(self):
        f = ConstantPE(220.0)
        pe = SuperSawPE(frequency=f, seed=0)
        assert f in pe.inputs()
        assert np.isfinite(render(pe, 0, 1024)).all()

    def test_amplitude_from_pe(self):
        ramp = ArrayPE(np.linspace(0, 1, 2000, dtype=np.float32))
        pe = SuperSawPE(frequency=220.0, amplitude=ramp, seed=0)
        d = render(pe, 0, 2000)[:, 0]
        assert np.abs(d[-200:]).max() > 4 * np.abs(d[:200]).max()

    def test_extent_with_pe_inputs_intersects(self):
        f = CropPE(ConstantPE(220.0), 0, 800)
        ext = SuperSawPE(frequency=f, seed=0).extent()
        assert ext.start == 0 and ext.end == 800

    def test_extent_disjoint_pe_inputs_no_crash(self):
        f = CropPE(ConstantPE(220.0), 0, 100)
        a = CropPE(ConstantPE(0.5), 500, 100)
        pe = SuperSawPE(frequency=f, amplitude=a, seed=0)
        assert pe.extent().is_empty()
        assert np.isfinite(render(pe, 0, 64)).all()

    def test_sample_rate_22050_renders(self):
        pg.set_sample_rate(22050)
        try:
            d = render(SuperSawPE(frequency=220.0, seed=0), 0, 2048)
            assert np.isfinite(d).all() and np.abs(d).max() > 0.01
        finally:
            pg.set_sample_rate(SR)

    def test_single_sample(self):
        d = render(SuperSawPE(frequency=220.0, seed=0), 0, 1)
        assert d.shape == (1, 1)

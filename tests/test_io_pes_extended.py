"""Extended WavReaderPE / WavWriterPE / AudioReaderPE behavior coverage.

Mirrors the reference's IO test breadth (reference:
tests/test_wav_io.py:50-381, tests/test_audio_reader_pe.py:82-330) in
repo idiom: our codec is utils/wavio (no libsndfile in this image), and
renders go through ``pe.render(start, dur)`` / NullRenderer.
"""

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu import (
    ArrayPE,
    AudioReaderPE,
    ConstantPE,
    MixPE,
    SinePE,
    WavReaderPE,
    WavWriterPE,
)
from pygmu2_tpu.core.renderer import NullRenderer
from pygmu2_tpu.utils import wavio

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


@pytest.fixture
def mono_ramp_wav(tmp_path):
    """Mono float WAV: ramp 0..1 over 1000 frames @ 44100."""
    path = str(tmp_path / "mono.wav")
    data = np.linspace(0.0, 1.0, 1000, dtype=np.float32).reshape(-1, 1)
    wavio.write_wav(path, data, 44100, fmt="float32")
    return path, data


@pytest.fixture
def stereo_wav(tmp_path):
    """Stereo float WAV: L ramps up, R ramps down, 1000 frames."""
    path = str(tmp_path / "stereo.wav")
    left = np.linspace(0.0, 1.0, 1000, dtype=np.float32)
    right = np.linspace(1.0, 0.0, 1000, dtype=np.float32)
    data = np.column_stack([left, right])
    wavio.write_wav(path, data, 44100, fmt="float32")
    return path, data


class TestWavReaderBasics:
    def test_path_property(self, mono_ramp_wav):
        path, _ = mono_ramp_wav
        assert WavReaderPE(path).path == path

    def test_is_pure(self, mono_ramp_wav):
        assert WavReaderPE(mono_ramp_wav[0]).is_pure() is True

    def test_no_inputs(self, mono_ramp_wav):
        assert WavReaderPE(mono_ramp_wav[0]).inputs() == []

    def test_channel_count_mono(self, mono_ramp_wav):
        assert WavReaderPE(mono_ramp_wav[0]).channel_count() == 1

    def test_channel_count_stereo(self, stereo_wav):
        assert WavReaderPE(stereo_wav[0]).channel_count() == 2

    def test_extent_matches_frames(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        ext = WavReaderPE(path).extent()
        assert ext.start == 0
        assert ext.end == len(data)

    def test_file_sample_rate(self, mono_ramp_wav):
        assert WavReaderPE(mono_ramp_wav[0]).file_sample_rate == 44100

    def test_repr_names_class_and_file(self, mono_ramp_wav):
        r = repr(WavReaderPE(mono_ramp_wav[0]))
        assert "WavReaderPE" in r and "mono.wav" in r

    def test_rate_mismatch_is_nonfatal_lenient(self, tmp_path):
        path = str(tmp_path / "odd_rate.wav")
        wavio.write_wav(path, np.zeros((10, 1), np.float32), 22050)
        pg.set_error_mode(pg.ErrorMode.LENIENT)

        try:
            reader = WavReaderPE(path)
            assert reader.channel_count() == 1  # decodes despite mismatch
        finally:
            pg.set_error_mode(pg.ErrorMode.STRICT)


class TestWavReaderRender:
    def test_render_full_file(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = WavReaderPE(path).render(0, 1000)
        assert s.start == 0 and s.duration == 1000
        np.testing.assert_allclose(s.data, data, atol=1e-6)

    def test_render_partial(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = WavReaderPE(path).render(100, 200)
        assert s.start == 100 and s.duration == 200
        np.testing.assert_allclose(s.data, data[100:300], atol=1e-6)

    def test_render_stereo_channels_independent(self, stereo_wav):
        path, data = stereo_wav
        s = WavReaderPE(path).render(0, 1000)
        np.testing.assert_allclose(s.data, data, atol=1e-6)
        assert s.data[0, 0] == pytest.approx(0.0, abs=1e-6)
        assert s.data[0, 1] == pytest.approx(1.0, abs=1e-6)

    def test_render_before_extent_is_zeros(self, mono_ramp_wav):
        s = WavReaderPE(mono_ramp_wav[0]).render(-500, 100)
        np.testing.assert_array_equal(np.asarray(s.data), 0.0)

    def test_render_after_extent_is_zeros(self, mono_ramp_wav):
        s = WavReaderPE(mono_ramp_wav[0]).render(5000, 100)
        np.testing.assert_array_equal(np.asarray(s.data), 0.0)

    def test_render_spanning_start(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = WavReaderPE(path).render(-50, 100)
        np.testing.assert_array_equal(np.asarray(s.data[:50]), 0.0)
        np.testing.assert_allclose(s.data[50:], data[:50], atol=1e-6)

    def test_render_spanning_end(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = WavReaderPE(path).render(950, 100)
        np.testing.assert_allclose(s.data[:50], data[950:], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(s.data[50:]), 0.0)

    def test_render_is_repeatable(self, mono_ramp_wav):
        reader = WavReaderPE(mono_ramp_wav[0])
        a = np.asarray(reader.render(100, 300).data)
        b = np.asarray(reader.render(100, 300).data)
        np.testing.assert_array_equal(a, b)

    def test_render_without_renderer_works(self, mono_ramp_wav):
        # No NullRenderer lifecycle at all — lazy decode on first pull.
        path, data = mono_ramp_wav
        s = WavReaderPE(path).render(0, 10)
        np.testing.assert_allclose(s.data, data[:10], atol=1e-6)

    def test_render_under_renderer_lifecycle(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        reader = WavReaderPE(path)
        renderer = NullRenderer(sample_rate=44100)
        renderer.set_source(reader)
        with renderer:
            renderer.start()
            s = reader.render(0, 100)
            np.testing.assert_allclose(s.data, data[:100], atol=1e-6)

    def test_missing_file_raises(self, tmp_path):
        reader = WavReaderPE(str(tmp_path / "nope.wav"))
        with pytest.raises((FileNotFoundError, OSError)):
            reader.channel_count()


class TestWavWriterBasics:
    def test_path_property(self, tmp_path):
        w = WavWriterPE(ConstantPE(0.5), str(tmp_path / "o.wav"))
        assert w.path.endswith("o.wav")

    def test_has_one_input(self, tmp_path):
        src = ConstantPE(0.5)
        w = WavWriterPE(src, str(tmp_path / "o.wav"))
        assert w.inputs() == [src]
        assert w.source is src

    def test_is_not_pure(self, tmp_path):
        assert WavWriterPE(ConstantPE(0.5), str(tmp_path / "o.wav")).is_pure() is False

    def test_channel_count_follows_source(self, tmp_path):
        src = ArrayPE(np.zeros((10, 3), np.float32))
        assert WavWriterPE(src, str(tmp_path / "o.wav")).channel_count() == 3

    def test_extent_follows_source(self, tmp_path):
        src = ArrayPE(np.zeros(77, np.float32))
        assert WavWriterPE(src, str(tmp_path / "o.wav")).extent().end == 77

    def test_repr(self, tmp_path):
        r = repr(WavWriterPE(ConstantPE(0.5), str(tmp_path / "o.wav")))
        assert "WavWriterPE" in r and "o.wav" in r


def _run_writer(writer, spans, sample_rate=44100):
    renderer = NullRenderer(sample_rate=sample_rate)
    renderer.set_source(writer)
    with renderer:
        renderer.start()
        for start, dur in spans:
            renderer.render(start, dur)


class TestWavWriterRender:
    def test_write_constant(self, tmp_path):
        path = str(tmp_path / "c.wav")
        writer = WavWriterPE(ConstantPE(0.25), path, subtype="FLOAT")
        _run_writer(writer, [(0, 100)])
        out, sr = wavio.read_wav(path)
        assert sr == 44100
        np.testing.assert_allclose(out, 0.25, atol=1e-6)

    def test_write_stereo(self, tmp_path):
        path = str(tmp_path / "st.wav")
        data = np.column_stack(
            [np.linspace(0, 1, 50), np.linspace(1, 0, 50)]
        ).astype(np.float32)
        writer = WavWriterPE(ArrayPE(data), path, subtype="FLOAT")
        _run_writer(writer, [(0, 50)])
        out, _ = wavio.read_wav(path)
        assert out.shape == (50, 2)
        np.testing.assert_allclose(out, data, atol=1e-6)

    @pytest.mark.parametrize(
        "subtype,atol",
        [("PCM_16", 1 / 32768), ("PCM_24", 1 / 8388608), ("PCM_32", 1e-6), ("FLOAT", 1e-7)],
    )
    def test_write_subtypes_roundtrip(self, tmp_path, subtype, atol):
        path = str(tmp_path / f"{subtype}.wav")
        data = np.linspace(-0.9, 0.9, 64, dtype=np.float32)
        writer = WavWriterPE(ArrayPE(data), path, subtype=subtype)
        _run_writer(writer, [(0, 64)])
        out, _ = wavio.read_wav(path)
        np.testing.assert_allclose(out[:, 0], data, atol=atol)

    def test_write_multiple_renders_appends(self, tmp_path):
        path = str(tmp_path / "m.wav")
        data = np.linspace(0, 1, 300, dtype=np.float32)
        writer = WavWriterPE(ArrayPE(data), path, subtype="FLOAT")
        _run_writer(writer, [(0, 100), (100, 100), (200, 100)])
        assert writer.frames_written == 300
        out, _ = wavio.read_wav(path)
        np.testing.assert_allclose(out[:, 0], data, atol=1e-6)

    def test_write_sine_energy(self, tmp_path):
        path = str(tmp_path / "s.wav")
        writer = WavWriterPE(SinePE(frequency=441, amplitude=0.5), path, subtype="FLOAT")
        _run_writer(writer, [(0, 4410)])
        out, _ = wavio.read_wav(path)
        rms = float(np.sqrt(np.mean(out**2)))
        assert rms == pytest.approx(0.5 / np.sqrt(2), rel=0.01)

    def test_custom_output_sample_rate(self, tmp_path):
        path = str(tmp_path / "sr.wav")
        writer = WavWriterPE(ConstantPE(0.1), path, sample_rate=22050, subtype="FLOAT")
        _run_writer(writer, [(0, 10)])
        _, sr = wavio.read_wav(path)
        assert sr == 22050

    def test_read_write_chain(self, mono_ramp_wav, tmp_path):
        src_path, data = mono_ramp_wav
        out_path = str(tmp_path / "copy.wav")
        writer = WavWriterPE(WavReaderPE(src_path), out_path, subtype="FLOAT")
        _run_writer(writer, [(0, 1000)])
        out, _ = wavio.read_wav(out_path)
        np.testing.assert_allclose(out, data, atol=1e-6)

    def test_mix_and_write(self, mono_ramp_wav, tmp_path):
        src_path, data = mono_ramp_wav
        out_path = str(tmp_path / "mix.wav")
        mixed = MixPE(WavReaderPE(src_path), ConstantPE(0.1))
        writer = WavWriterPE(mixed, out_path, subtype="FLOAT")
        _run_writer(writer, [(0, 1000)])
        out, _ = wavio.read_wav(out_path)
        np.testing.assert_allclose(out[:, 0], data[:, 0] + 0.1, atol=1e-5)

    def test_no_write_before_stop_flush(self, tmp_path):
        import os

        path = str(tmp_path / "late.wav")
        writer = WavWriterPE(ConstantPE(0.5), path, subtype="FLOAT")
        renderer = NullRenderer(sample_rate=44100)
        renderer.set_source(writer)
        with renderer:
            renderer.start()
            renderer.render(0, 10)
            assert not os.path.exists(path)  # finalized on stop
        assert os.path.exists(path)


class TestAudioReaderPE:
    def test_path_property(self, mono_ramp_wav):
        assert AudioReaderPE(mono_ramp_wav[0]).path == mono_ramp_wav[0]

    def test_is_pure(self, mono_ramp_wav):
        assert AudioReaderPE(mono_ramp_wav[0]).is_pure() is True

    def test_no_inputs(self, mono_ramp_wav):
        assert AudioReaderPE(mono_ramp_wav[0]).inputs() == []

    def test_repr_plain(self, mono_ramp_wav):
        r = repr(AudioReaderPE(mono_ramp_wav[0]))
        assert "AudioReaderPE" in r and "max_level_db" not in r

    def test_repr_includes_max_level_db_when_set(self, mono_ramp_wav):
        r = repr(AudioReaderPE(mono_ramp_wav[0], max_level_db=-6.0))
        assert "max_level_db=-6.0" in r

    def test_channel_count(self, stereo_wav):
        assert AudioReaderPE(stereo_wav[0]).channel_count() == 2

    def test_file_sample_rate(self, mono_ramp_wav):
        assert AudioReaderPE(mono_ramp_wav[0]).file_sample_rate == 44100

    def test_extent_matches_frames_same_rate(self, mono_ramp_wav):
        assert AudioReaderPE(mono_ramp_wav[0]).extent().end == 1000

    def test_extent_scaled_when_rates_differ(self, tmp_path):
        # 22050 Hz file under a 44100 Hz session: resampled 2x.
        path = str(tmp_path / "half_rate.wav")
        wavio.write_wav(path, np.zeros((500, 1), np.float32), 22050)
        reader = AudioReaderPE(path)
        assert reader.extent().end == 1000
        assert reader.file_sample_rate == 22050

    def test_resample_preserves_tone(self, tmp_path):
        # A 441 Hz tone at 22050 must stay 441 Hz at 44100.
        path = str(tmp_path / "tone.wav")
        t = np.arange(2205) / 22050.0
        wavio.write_wav(
            path, np.sin(2 * np.pi * 441 * t).astype(np.float32), 22050, fmt="float32"
        )
        out = np.asarray(AudioReaderPE(path).render(100, 4000).data)[:, 0]
        # dominant FFT bin == 441 Hz at the session rate
        freqs = np.fft.rfftfreq(out.size, 1 / 44100.0)
        assert freqs[np.argmax(np.abs(np.fft.rfft(out * np.hanning(out.size))))] == (
            pytest.approx(441, abs=15)
        )

    def test_render_values_match_file(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = AudioReaderPE(path).render(0, 1000)
        np.testing.assert_allclose(s.data, data, atol=1e-6)

    def test_render_partial_window(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = AudioReaderPE(path).render(250, 100)
        np.testing.assert_allclose(s.data, data[250:350], atol=1e-6)

    def test_render_before_extent_is_zeros(self, mono_ramp_wav):
        s = AudioReaderPE(mono_ramp_wav[0]).render(-200, 100)
        np.testing.assert_array_equal(np.asarray(s.data), 0.0)

    def test_render_past_end_is_zeros(self, mono_ramp_wav):
        s = AudioReaderPE(mono_ramp_wav[0]).render(2000, 50)
        np.testing.assert_array_equal(np.asarray(s.data), 0.0)

    def test_render_is_repeatable(self, mono_ramp_wav):
        reader = AudioReaderPE(mono_ramp_wav[0])
        a = np.asarray(reader.render(0, 500).data)
        b = np.asarray(reader.render(0, 500).data)
        np.testing.assert_array_equal(a, b)

    def test_max_level_db_none_leaves_data(self, mono_ramp_wav):
        path, data = mono_ramp_wav
        s = AudioReaderPE(path, max_level_db=None).render(0, 1000)
        np.testing.assert_allclose(s.data, data, atol=1e-6)

    def test_max_level_db_zero_normalizes_to_full_scale(self, tmp_path):
        path = str(tmp_path / "quiet.wav")
        wavio.write_wav(
            path, (0.1 * np.sin(np.linspace(0, 20, 500))).astype(np.float32), 44100,
            fmt="float32",
        )
        s = AudioReaderPE(path, max_level_db=0.0).render(0, 500)
        assert float(np.max(np.abs(np.asarray(s.data)))) == pytest.approx(1.0, rel=1e-4)

    def test_max_level_db_negative_sets_headroom(self, tmp_path):
        path = str(tmp_path / "quiet2.wav")
        wavio.write_wav(
            path, (0.3 * np.sin(np.linspace(0, 20, 500))).astype(np.float32), 44100,
            fmt="float32",
        )
        s = AudioReaderPE(path, max_level_db=-6.0).render(0, 500)
        assert float(np.max(np.abs(np.asarray(s.data)))) == pytest.approx(
            10 ** (-6 / 20), rel=1e-3
        )

    def test_max_level_db_silence_does_not_raise(self, tmp_path):
        path = str(tmp_path / "silence.wav")
        wavio.write_wav(path, np.zeros((100, 1), np.float32), 44100, fmt="float32")
        s = AudioReaderPE(path, max_level_db=0.0).render(0, 100)
        np.testing.assert_array_equal(np.asarray(s.data), 0.0)

    def test_non_wav_without_miniaudio_raises(self, tmp_path):
        path = str(tmp_path / "x.mp3")
        with open(path, "wb") as f:
            f.write(b"\xff\xfb\x00\x00")
        reader = AudioReaderPE(path)
        try:
            import miniaudio  # noqa: F401 — if present, decode may fail differently
        except ImportError:
            with pytest.raises(RuntimeError, match="miniaudio"):
                reader.channel_count()

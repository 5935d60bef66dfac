"""WAV codec + reader/writer PE round-trip tests
(mirrors reference tests/test_wav_io.py:25-31 structure)."""

import numpy as np

import pygmu2_tpu as pg
from pygmu2_tpu import ArrayPE, WavReaderPE, WavWriterPE
from pygmu2_tpu.core.renderer import NullRenderer
from pygmu2_tpu.utils import wavio
from pygmu2_tpu.utils.playback import render_to_file


class TestWavCodec:
    def test_float32_roundtrip(self, tmp_path):
        path = str(tmp_path / "f32.wav")
        data = np.linspace(-1, 1, 1000, dtype=np.float32).reshape(-1, 2)
        wavio.write_wav(path, data, 44100, fmt="float32")
        out, sr = wavio.read_wav(path)
        assert sr == 44100
        np.testing.assert_array_equal(out, data)

    def test_pcm16_roundtrip(self, tmp_path):
        path = str(tmp_path / "p16.wav")
        data = np.linspace(-0.9, 0.9, 500, dtype=np.float32)
        wavio.write_wav(path, data, 48000, fmt="pcm16")
        out, sr = wavio.read_wav(path)
        assert sr == 48000
        assert out.shape == (500, 1)
        np.testing.assert_allclose(out[:, 0], data, atol=1.0 / 32768)

    def test_pcm24_roundtrip(self, tmp_path):
        path = str(tmp_path / "p24.wav")
        data = np.linspace(-0.5, 0.5, 300, dtype=np.float32).reshape(-1, 3)
        wavio.write_wav(path, data, 44100, fmt="pcm24")
        out, sr = wavio.read_wav(path)
        np.testing.assert_allclose(out, data, atol=1.0 / 8388608)

    def test_pcm32_roundtrip(self, tmp_path):
        path = str(tmp_path / "p32.wav")
        data = np.linspace(-0.25, 0.25, 64, dtype=np.float32)
        wavio.write_wav(path, data, 44100, fmt="pcm32")
        out, _ = wavio.read_wav(path)
        np.testing.assert_allclose(out[:, 0], data, atol=1e-6)


class TestWavPEs:
    def test_render_to_file_and_read_back(self, tmp_path):
        path = str(tmp_path / "ramp.wav")
        ramp = np.linspace(0, 1, 2000, dtype=np.float32)
        render_to_file(ArrayPE(ramp), path)
        reader = WavReaderPE(path)
        assert reader.channel_count() == 1
        assert reader.extent().end == 2000
        assert reader.file_sample_rate == 44100
        s = reader.render(0, 2000)
        np.testing.assert_allclose(s.data[:, 0], ramp, atol=1e-7)

    def test_reader_zero_fill_outside(self, tmp_path):
        path = str(tmp_path / "short.wav")
        wavio.write_wav(path, np.ones((10, 1), np.float32), 44100)
        reader = WavReaderPE(path)
        s = reader.render(-5, 20)
        np.testing.assert_allclose(s.data[:5, 0], 0.0)
        np.testing.assert_allclose(s.data[5:15, 0], 1.0)
        np.testing.assert_allclose(s.data[15:, 0], 0.0)

    def test_writer_tap_through_renderer(self, tmp_path):
        path = str(tmp_path / "tap.wav")
        src = ArrayPE(np.linspace(0, 1, 100, dtype=np.float32))
        writer = WavWriterPE(src, path, subtype="FLOAT")
        renderer = NullRenderer(sample_rate=44100)
        renderer.set_source(writer)
        with renderer:
            renderer.start()
            renderer.render(0, 50)
            renderer.render(50, 50)
        out, _ = wavio.read_wav(path)
        assert writer.frames_written == 100
        np.testing.assert_allclose(
            out[:, 0], np.linspace(0, 1, 100, dtype=np.float32), atol=1e-7
        )

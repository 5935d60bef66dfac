"""utils/wavio codec error-path and edge coverage.

The repo's own RIFF codec (no libsndfile in this image) is the only
decode path for WavReaderPE/AudioReaderPE/KEMAR assets — malformed
files must fail loudly, odd-but-legal files must decode. Mirrors the
error-path breadth the reference gets for free from soundfile's test
matrix.
"""

import struct

import numpy as np
import pytest

from pygmu2_tpu.utils import wavio


def riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def fmt_chunk(tag=1, channels=1, rate=44100, bits=16):
    block = channels * bits // 8
    return struct.pack(
        "<HHIIHH", tag, channels, rate, rate * block, block, bits
    )


@pytest.fixture
def wav_path(tmp_path):
    return str(tmp_path / "t.wav")


class TestReadErrors:
    def test_not_riff(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(b"garbage data that is not a wav")
        with pytest.raises(ValueError, match="RIFF"):
            wavio.read_wav(wav_path)

    def test_riff_but_not_wave(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
        with pytest.raises(ValueError, match="RIFF"):
            wavio.read_wav(wav_path)

    def test_missing_fmt_chunk(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(riff([(b"data", b"\x00\x00")]))
        with pytest.raises(ValueError, match="fmt or data"):
            wavio.read_wav(wav_path)

    def test_missing_data_chunk(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(riff([(b"fmt ", fmt_chunk())]))
        with pytest.raises(ValueError, match="fmt or data"):
            wavio.read_wav(wav_path)

    def test_unsupported_format_tag(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(riff([
                (b"fmt ", fmt_chunk(tag=0x55)),  # MP3-in-WAV
                (b"data", b"\x00\x00"),
            ]))
        with pytest.raises(ValueError, match="format tag"):
            wavio.read_wav(wav_path)

    def test_unsupported_bit_depth(self, wav_path):
        with open(wav_path, "wb") as f:
            f.write(riff([
                (b"fmt ", fmt_chunk(bits=12)),
                (b"data", b"\x00\x00"),
            ]))
        with pytest.raises(ValueError, match="bit depth"):
            wavio.read_wav(wav_path)

    def test_empty_file(self, wav_path):
        open(wav_path, "wb").close()
        with pytest.raises(ValueError):
            wavio.read_wav(wav_path)


class TestReadEdges:
    def test_unknown_chunks_skipped(self, wav_path):
        # LIST/INFO metadata chunks before fmt/data must be ignored
        pcm = struct.pack("<4h", 0, 16384, -16384, 32767)
        with open(wav_path, "wb") as f:
            f.write(riff([
                (b"LIST", b"INFOIART" + struct.pack("<I", 4) + b"test"),
                (b"fmt ", fmt_chunk()),
                (b"junk", b"\x01\x02\x03"),
                (b"data", pcm),
            ]))
        data, sr = wavio.read_wav(wav_path)
        assert sr == 44100
        assert data.shape == (4, 1)
        np.testing.assert_allclose(data[1, 0], 0.5, atol=1e-3)

    def test_odd_sized_chunk_padding(self, wav_path):
        # a 3-byte chunk is padded to 4; the following data must parse
        pcm = struct.pack("<2h", 100, -100)
        with open(wav_path, "wb") as f:
            f.write(riff([
                (b"junk", b"\x01\x02\x03"),  # odd length → pad byte
                (b"fmt ", fmt_chunk()),
                (b"data", pcm),
            ]))
        data, sr = wavio.read_wav(wav_path)
        assert data.shape == (2, 1)

    def test_extensible_float_format(self, wav_path):
        # WAVE_FORMAT_EXTENSIBLE wrapping IEEE float
        samples = np.array([0.25, -0.5], np.float32)
        # 16-byte subformat GUID whose first 2 bytes are the real tag (3)
        guid = b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        ext = (
            fmt_chunk(tag=0xFFFE, bits=32)
            + struct.pack("<H", 22)        # cbSize
            + struct.pack("<HI", 32, 3)    # valid bits, channel mask
            + guid
        )
        with open(wav_path, "wb") as f:
            f.write(riff([
                (b"fmt ", ext),
                (b"data", samples.tobytes()),
            ]))
        data, sr = wavio.read_wav(wav_path)
        np.testing.assert_allclose(data[:, 0], samples, atol=1e-7)

    def test_multichannel_interleave(self, wav_path):
        frames = np.array(
            [[0.1, 0.2, 0.3], [-0.1, -0.2, -0.3]], np.float32
        )
        wavio.write_wav(wav_path, frames, 48000, fmt="float32")
        data, sr = wavio.read_wav(wav_path)
        assert sr == 48000
        np.testing.assert_allclose(data, frames, atol=1e-7)

    def test_zero_frame_file_roundtrip(self, wav_path):
        wavio.write_wav(wav_path, np.zeros((0, 2), np.float32), 44100)
        data, sr = wavio.read_wav(wav_path)
        assert data.shape[0] == 0

    def test_wav_info_reports_without_decoding(self, wav_path):
        wavio.write_wav(
            wav_path, np.zeros((123, 2), np.float32), 22050, fmt="pcm16"
        )
        info = wavio.wav_info(wav_path)
        assert info.sample_rate == 22050
        assert info.channels == 2
        assert info.frames == 123

    def test_pcm16_full_scale_bounds(self, wav_path):
        wavio.write_wav(
            wav_path, np.array([1.0, -1.0], np.float32), 44100, fmt="pcm16"
        )
        data, _ = wavio.read_wav(wav_path)
        assert data.max() <= 1.0 and data.min() >= -1.0
        np.testing.assert_allclose(np.abs(data[:, 0]), 1.0, atol=2e-4)


class TestWriteErrors:
    def test_unsupported_format_rejected(self, wav_path):
        with pytest.raises(ValueError, match="unsupported format"):
            wavio.write_wav(
                wav_path, np.zeros(4, np.float32), 44100, fmt="pcm8"
            )

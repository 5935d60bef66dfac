"""Compressed-audio decode path (reference: audio_reader_pe.py:40-161).

The reference decodes MP3/FLAC/OGG via the miniaudio C library; this
image has no codec library, so the package ships its own FLAC codec
(pygmu2_tpu/utils/flacio.py). Covered here:

- encoder -> decoder round trips (bit-exact int16 PCM), mono/stereo,
  multiple block sizes, constant and noisy content
- hand-built bitstreams for the decoder branches our encoder never
  emits: LPC subframes, left-side / right-side / mid-side stereo,
  escape partitions, wasted bits, 8-bit block-size codes
- corruption detection (CRC-8 / CRC-16 / bad magic)
- AudioReaderPE end-to-end: decode + resample-to-global-rate + peak
  normalization (the reference contract), plus the miniaudio glue
  branch exercised through a fake module.
"""

import struct
import sys
import types

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.utils import flacio
from pygmu2_tpu.utils.flacio import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    flac_info,
    read_flac,
    write_flac,
)


def _sine_pcm(frames, nch, sr, freq=220.0, amp=0.7, seed=None):
    t = np.arange(frames) / sr
    base = amp * np.sin(2 * np.pi * freq * t)
    chans = [base * (0.5 + 0.5 * c) for c in range(nch)]
    data = np.stack(chans, axis=1).astype(np.float32)
    if seed is not None:
        rng = np.random.default_rng(seed)
        data += rng.uniform(-0.01, 0.01, data.shape).astype(np.float32)
    return data


def _as_i16(x):
    return np.clip(np.round(np.asarray(x) * 32768.0), -32768, 32767).astype(
        np.int32
    )


# --------------------------------------------------------------------------
# round trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "frames,nch,blocksize",
    [(1000, 1, 4096), (4097, 2, 4096), (700, 2, 256), (1, 1, 4096)],
)
def test_flac_roundtrip_bit_exact(tmp_path, frames, nch, blocksize):
    data = _sine_pcm(frames, nch, 22050, seed=1)
    p = tmp_path / "t.flac"
    write_flac(str(p), data, 22050, blocksize=blocksize)
    out, sr = read_flac(str(p))
    assert sr == 22050
    assert out.shape == (frames, nch)
    np.testing.assert_array_equal(_as_i16(out), _as_i16(data))


def test_flac_roundtrip_constant_and_silence(tmp_path):
    data = np.concatenate(
        [np.zeros((500, 1)), np.full((500, 1), 0.25)], axis=0
    ).astype(np.float32)
    p = tmp_path / "c.flac"
    write_flac(str(p), data, 8000)
    out, sr = read_flac(str(p))
    assert sr == 8000
    np.testing.assert_array_equal(_as_i16(out), _as_i16(data))


def test_flac_info_fields(tmp_path):
    data = _sine_pcm(2500, 2, 44100)
    p = tmp_path / "i.flac"
    write_flac(str(p), data, 44100)
    info = flac_info(str(p))
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 2500


def test_flac_compresses_tonal_content(tmp_path):
    """The fixed-predictor + rice path must actually compress (this is a
    codec, not a container)."""
    data = _sine_pcm(44100, 1, 44100, freq=110.0)
    p = tmp_path / "z.flac"
    write_flac(str(p), data, 44100)
    raw_bytes = 44100 * 2
    assert p.stat().st_size < 0.8 * raw_bytes


# --------------------------------------------------------------------------
# hand-built streams: decoder branches the encoder never emits
# --------------------------------------------------------------------------


def _streaminfo(sr, nch, bps, total, blocksize=4096):
    si = bytearray()
    si += struct.pack(">HH", 16, blocksize)
    si += (0).to_bytes(3, "big") * 2
    packed = (sr << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += bytes(16)
    return b"fLaC" + struct.pack(">I", (1 << 31) | len(si)) + bytes(si)


def _frame_header(nch_code, n, fi=0, bps_code=4, bs_code=7):
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(bs_code, 4)
    bw.write(0, 4)
    bw.write(nch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    for b in _utf8_number(fi):
        bw.write(b, 8)
    if bs_code == 7:
        bw.write(n - 1, 16)
    elif bs_code == 6:
        bw.write(n - 1, 8)
    bw.pad_to_byte()
    hdr = bw.getvalue()
    return hdr + bytes([_crc8(hdr)])


def _verbatim_subframe(bw, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x:
        bw.write(int(v), bps)


def _finish_frame(hdr, bw):
    bw.pad_to_byte()
    frame = hdr + bw.getvalue()
    return frame + struct.pack(">H", _crc16(frame))


def _decode_bytes(tmp_path, blob, name="hand.flac"):
    p = tmp_path / name
    p.write_bytes(blob)
    return read_flac(str(p))


def test_flac_decodes_lpc_subframe(tmp_path):
    """LPC order 2, coefficients [3, -1], shift 1: x[i] =
    ((3*x[i-1] - x[i-2]) >> 1) + r[i]."""
    n = 64
    warm = [100, 103]
    resid = [((-1) ** i) * (i % 5) for i in range(n - 2)]
    x = list(warm)
    for r in resid:
        x.append(((3 * x[-1] - 1 * x[-2]) >> 1) + r)

    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(32 + 1, 6)  # LPC, order 2 (code = 31 + order)
    bw.write(0, 1)
    for w in warm:
        bw.write(w, 16)
    bw.write(4 - 1, 4)  # precision 4 bits
    bw.write(1, 5)  # shift 1
    bw.write(3, 4)  # coeff 3
    bw.write(-1, 4)  # coeff -1
    bw.write(0, 2)  # rice method 0
    bw.write(0, 4)  # partition order 0
    bw.write(2, 4)  # rice param 2
    for r in resid:
        u = (r << 1) ^ (r >> 63)
        bw.write_unary(u >> 2)
        bw.write(u, 2)

    blob = _streaminfo(8000, 1, 16, n) + _finish_frame(
        _frame_header(0, n), bw
    )
    out, sr = _decode_bytes(tmp_path, blob)
    assert sr == 8000
    np.testing.assert_array_equal(
        np.round(out[:, 0] * 32768.0).astype(np.int64), np.array(x)
    )


@pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
def test_flac_stereo_decorrelation(tmp_path, mode):
    n = 48
    rng = np.random.default_rng(5)
    left = rng.integers(-3000, 3000, n).astype(np.int64)
    right = rng.integers(-3000, 3000, n).astype(np.int64)
    side = left - right
    bw = _BitWriter()
    if mode == "left-side":
        code = 8
        _verbatim_subframe(bw, left, 16)
        _verbatim_subframe(bw, side, 17)
    elif mode == "right-side":
        code = 9
        _verbatim_subframe(bw, side, 17)
        _verbatim_subframe(bw, right, 16)
    else:
        code = 10
        mid = (left + right) >> 1
        _verbatim_subframe(bw, mid, 16)
        _verbatim_subframe(bw, side, 17)
    blob = _streaminfo(8000, 2, 16, n) + _finish_frame(
        _frame_header(code, n), bw
    )
    out, _ = _decode_bytes(tmp_path, blob)
    got = np.round(out * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_flac_escape_partition_and_wasted_bits(tmp_path):
    n = 32
    vals = [(i - n // 2) * 4 for i in range(n)]  # all multiples of 4
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(8, 6)  # FIXED order 0
    bw.write(1, 1)  # wasted-bits flag
    bw.write_unary(1)  # wasted = 2
    # residual == samples (order 0), shifted right by wasted bits
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0xF, 4)  # escape
    bw.write(9, 5)  # 9 raw bits each
    for v in vals:
        bw.write(v >> 2, 9)
    blob = _streaminfo(8000, 1, 16, n) + _finish_frame(
        _frame_header(0, n), bw
    )
    out, _ = _decode_bytes(tmp_path, blob)
    np.testing.assert_array_equal(
        np.round(out[:, 0] * 32768.0).astype(np.int64), np.array(vals)
    )


def test_flac_8bit_blocksize_code(tmp_path):
    n = 20
    vals = list(range(n))
    bw = _BitWriter()
    _verbatim_subframe(bw, vals, 16)
    blob = _streaminfo(8000, 1, 16, n) + _finish_frame(
        _frame_header(0, n, bs_code=6), bw
    )
    out, _ = _decode_bytes(tmp_path, blob)
    np.testing.assert_array_equal(
        np.round(out[:, 0] * 32768.0).astype(np.int64), np.array(vals)
    )


# --------------------------------------------------------------------------
# corruption detection
# --------------------------------------------------------------------------


def test_flac_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaX" + bytes(64))
    with pytest.raises(ValueError, match="fLaC"):
        read_flac(str(p))


@pytest.mark.parametrize("where", ["header", "body"])
def test_flac_detects_crc_mismatch(tmp_path, where):
    data = _sine_pcm(600, 1, 8000)
    p = tmp_path / "ok.flac"
    write_flac(str(p), data, 8000)
    blob = bytearray(p.read_bytes())
    # STREAMINFO is 4 + 4 + 34 bytes; frame starts at 42
    off = 44 if where == "header" else len(blob) - 40
    blob[off] ^= 0x10
    p2 = tmp_path / "corrupt.flac"
    p2.write_bytes(bytes(blob))
    with pytest.raises((ValueError, EOFError)):
        read_flac(str(p2))


# --------------------------------------------------------------------------
# AudioReaderPE end-to-end (the reference decode contract)
# --------------------------------------------------------------------------


def test_audio_reader_flac_resample_and_normalize(tmp_path):
    """Decode + resample-to-global-rate + peak normalize, mirroring the
    reference (audio_reader_pe.py:40-161)."""
    file_sr = 22050
    data = _sine_pcm(file_sr // 2, 2, file_sr, freq=441.0, amp=0.3)
    p = tmp_path / "clip.flac"
    write_flac(str(p), data, file_sr)

    pe = pg.AudioReaderPE(str(p), max_level_db=-3.0)
    assert pe.file_sample_rate == file_sr
    assert pe.channel_count() == 2
    ext = pe.extent()
    # resampled to 44100: twice the frames
    assert ext.end == pytest.approx(data.shape[0] * 2, abs=2)
    out = np.asarray(pe.render(0, int(ext.end)).data)
    peak = float(np.abs(out).max())
    assert peak == pytest.approx(10 ** (-3.0 / 20.0), rel=1e-4)
    # the resampled waveform still correlates with a 441 Hz sine
    t = np.arange(out.shape[0]) / 44100.0
    ref = np.sin(2 * np.pi * 441.0 * t)
    corr = float(
        np.abs(np.dot(out[:, 0], ref))
        / (np.linalg.norm(out[:, 0]) * np.linalg.norm(ref) + 1e-9)
    )
    assert corr > 0.95


def test_audio_reader_flac_no_resample_no_normalize(tmp_path):
    data = _sine_pcm(4000, 1, 44100, amp=0.5)
    p = tmp_path / "clip44.flac"
    write_flac(str(p), data, 44100)
    pe = pg.AudioReaderPE(str(p))
    out = np.asarray(pe.render(0, 4000).data)
    np.testing.assert_allclose(out[:, 0], data[:, 0], atol=1.0 / 32768.0)


def test_audio_reader_unsupported_format_error(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb" + bytes(64))
    pe = pg.AudioReaderPE(str(p))
    with pytest.raises(RuntimeError, match="miniaudio"):
        pe.channel_count()


def test_audio_reader_miniaudio_glue(tmp_path, monkeypatch):
    """Execute the actual miniaudio branch of AudioReaderPE._decode with
    a fake module shaped like miniaudio's DecodedSoundFile (int16 interleaved
    samples + nchannels + sample_rate)."""
    file_sr = 22050
    frames = 1000
    rng = np.random.default_rng(9)
    pcm = rng.integers(-20000, 20000, (frames, 2)).astype(np.int16)

    calls = []

    def decode_file(path):
        calls.append(path)
        return types.SimpleNamespace(
            samples=pcm.reshape(-1),  # interleaved, like miniaudio
            nchannels=2,
            sample_rate=file_sr,
        )

    fake = types.ModuleType("miniaudio")
    fake.decode_file = decode_file
    monkeypatch.setitem(sys.modules, "miniaudio", fake)

    p = tmp_path / "clip.mp3"
    p.write_bytes(b"\x00")  # never read by the fake
    pe = pg.AudioReaderPE(str(p))
    assert pe.file_sample_rate == file_sr
    assert pe.channel_count() == 2
    assert calls == [str(p)]
    ext = pe.extent()
    assert ext.end == pytest.approx(frames * 2, abs=2)  # resampled 2x
    out = np.asarray(pe.render(0, int(ext.end)).data)
    assert out.shape[1] == 2
    assert np.isfinite(out).all()
    # resampling preserves energy scale of the int16/32768 signal
    rms_in = float(np.sqrt(np.mean((pcm / 32768.0) ** 2)))
    rms_out = float(np.sqrt(np.mean(out**2)))
    assert rms_out == pytest.approx(rms_in, rel=0.1)


def test_flacio_import_does_not_require_jax_device():
    """flacio is host-only: importing and using it must not touch jax."""
    assert "jax" not in flacio.__dict__

"""File I/O processing elements.

TPU-native rebuilds of:
- WavReaderPE  (reference: src/pygmu2/wav_reader_pe.py:20) — WAV source,
  finite extent (0, frames), zero-fill outside.
- WavWriterPE  (reference: src/pygmu2/wav_writer_pe.py:21) — passthrough
  tap writing to a WAV file; impure.
- AudioReaderPE (reference: src/pygmu2/audio_reader_pe.py:40) — decodes at
  start, resamples to the global rate, optional peak normalization.

Design: readers decode the whole file into a device-resident array at
first use (audio assets are tiny next to HBM) and render as a fused
gather — streaming per block from disk would serialize the jitted
program. The writer publishes each block through the engine's state
pytree and a host-side block hook (``_eng_on_block``), so taps work in
both the block-render and lax.scan render paths — including on
remote-attached devices, where a device-side host callback would
deadlock. This image has no libsndfile/miniaudio, so WAV
decoding is our own RIFF codec (utils/wavio.py) and FLAC decoding is our
own spec-subset decoder (utils/flacio.py); other compressed formats
(mp3/ogg) use ``miniaudio`` when present.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.config import handle_error
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.logger import get_logger
from pygmu2_tpu.core.processing_element import ProcessingElement, SourcePE
from pygmu2_tpu.utils import wavio

_log = get_logger(__name__)


class _DecodedSource(SourcePE):
    """Shared render logic for sources backed by a decoded buffer."""

    _buffer: np.ndarray | None = None  # (frames, channels) float32

    def _ensure_data(self) -> None:
        raise NotImplementedError

    def _trace(self, ctx):
        self._ensure_data()
        table = jnp.asarray(self._buffer)
        n = table.shape[0]
        t = ctx.times()
        idx = jnp.clip(t, 0, n - 1).astype(jnp.int32)
        # Engine masks outside the extent, so clamped edges never leak.
        return table[idx]


class WavReaderPE(_DecodedSource):
    """WAV file source. Extent is ``(0, frames)``; zeros outside."""

    def __init__(self, path: str):
        self._path = str(path)
        self._frame_count: int | None = None
        self._channels: int | None = None
        self._file_sample_rate: int | None = None
        self._buffer = None

    @property
    def path(self) -> str:
        return self._path

    @property
    def file_sample_rate(self) -> int | None:
        self._ensure_data()
        return self._file_sample_rate

    @property
    def sample_rate(self) -> int | None:
        if self._sample_rate is not None:
            return self._sample_rate
        return self.file_sample_rate

    def _ensure_data(self) -> None:
        if self._buffer is None:
            data, sr = wavio.read_wav(self._path)
            self._buffer = np.ascontiguousarray(data, dtype=np.float32)
            self._frame_count = data.shape[0]
            self._channels = data.shape[1]
            self._file_sample_rate = sr
            if self._sample_rate is not None and sr != self._sample_rate:
                handle_error(
                    f"WavReaderPE: file rate {sr} != global rate "
                    f"{self._sample_rate}; playing at the wrong speed.",
                    fatal=False,
                )

    def _on_start(self) -> None:
        self._ensure_data()

    def channel_count(self) -> int:
        self._ensure_data()
        return int(self._channels)

    def _compute_extent(self) -> Extent:
        self._ensure_data()
        return Extent(0, int(self._frame_count))

    def __repr__(self) -> str:
        return f"WavReaderPE(path='{self._path}')"


class AudioReaderPE(_DecodedSource):
    """Multi-format reader: decodes fully at start, resamples to the global
    rate, optionally normalizes peaks to ``max_level_db``."""

    def __init__(self, path: str, max_level_db: float | None = None):
        self._path = str(path)
        self._max_level_db = max_level_db
        self._buffer = None
        self._file_sample_rate: int | None = None

    @property
    def path(self) -> str:
        return self._path

    @property
    def file_sample_rate(self) -> int:
        self._ensure_data()
        return int(self._file_sample_rate)

    def channel_count(self) -> int:
        self._ensure_data()
        return self._buffer.shape[1]

    def _compute_extent(self) -> Extent:
        self._ensure_data()
        return Extent(0, self._buffer.shape[0])

    def _on_start(self) -> None:
        self._ensure_data()

    def _decode(self) -> tuple[np.ndarray, int]:
        lower = self._path.lower()
        if lower.endswith(".wav"):
            return wavio.read_wav(self._path)
        try:
            import miniaudio
        except ImportError:
            miniaudio = None
        # A module without decode_file is not a usable codec — treat it
        # as absent (the reference-parity oracle injects bare stub
        # modules for the reference's optional deps, tests/ref_oracle.py).
        if miniaudio is not None and not hasattr(miniaudio, "decode_file"):
            miniaudio = None
        if miniaudio is not None:
            decoded = miniaudio.decode_file(self._path)
            data = np.asarray(decoded.samples, dtype=np.float32) / 32768.0
            data = data.reshape(-1, decoded.nchannels)
            return data, decoded.sample_rate
        if lower.endswith(".flac"):
            # no codec library in this image: the built-in decoder
            # (utils/flacio.py) covers FLAC natively.
            from pygmu2_tpu.utils import flacio

            return flacio.read_flac(self._path)
        raise RuntimeError(
            f"AudioReaderPE: decoding {self._path} requires the "
            "'miniaudio' package (not installed); WAV and FLAC files "
            "work without it."
        )

    def _ensure_data(self) -> None:
        if self._buffer is not None:
            return
        data, sr = self._decode()
        self._file_sample_rate = sr
        target = self._sample_rate
        if target is not None and sr != target:
            from scipy.signal import resample_poly
            from math import gcd

            g = gcd(int(target), int(sr))
            data = resample_poly(data, int(target) // g, int(sr) // g, axis=0)
        if self._max_level_db is not None:
            peak = float(np.max(np.abs(data))) if data.size else 0.0
            if peak > 0:
                data = data * (10.0 ** (self._max_level_db / 20.0) / peak)
        self._buffer = np.ascontiguousarray(data, dtype=np.float32)

    def __repr__(self) -> str:
        if self._max_level_db is not None:
            return (
                f"AudioReaderPE(path='{self._path}', "
                f"max_level_db={self._max_level_db})"
            )
        return f"AudioReaderPE(path='{self._path}')"


class WavWriterPE(ProcessingElement):
    """Passthrough tap that appends every rendered block to a WAV file.

    Impure (file side effect). The write happens through an ordered host
    callback, so it fires in file order even inside a scanned render. The
    file opens on start and is finalized on stop.
    """

    _SUBTYPE_MAP = {
        "PCM_16": "pcm16",
        "PCM_24": "pcm24",
        "PCM_32": "pcm32",
        "FLOAT": "float32",
    }

    def __init__(
        self,
        source: ProcessingElement,
        path: str,
        sample_rate: int | None = None,
        subtype: str = "PCM_16",
    ):
        self._source = source
        self._path = str(path)
        self._output_sample_rate = sample_rate
        self._subtype = subtype
        self._fmt = self._SUBTYPE_MAP.get(subtype, "float32")
        self._chunks: list[np.ndarray] = []
        self._frames_written = 0
        self._open = False

    @property
    def path(self) -> str:
        return self._path

    @property
    def frames_written(self) -> int:
        return self._frames_written

    @property
    def source(self) -> ProcessingElement:
        return self._source

    def inputs(self) -> list[ProcessingElement]:
        return [self._source]

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int | None:
        return self._source.channel_count()

    def _compute_extent(self) -> Extent:
        return self._source.extent()

    def _on_start(self) -> None:
        self._chunks = []
        self._frames_written = 0
        self._open = True

    def _on_stop(self) -> None:
        if self._open:
            self._flush()
        self._open = False

    def _flush(self) -> None:
        data = (
            np.concatenate(self._chunks, axis=0)
            if self._chunks
            else np.zeros((0, self.channel_count() or 1), np.float32)
        )
        sr = self._output_sample_rate or self.sample_rate or 44100
        wavio.write_wav(self._path, data, sr, fmt=self._fmt)

    def _eng_on_block(self, block) -> None:
        """Engine block hook: append one rendered block (host side)."""
        block = np.asarray(block)
        if self._open:
            self._chunks.append(block.copy())
            self._frames_written += block.shape[0]

    def _trace(self, ctx):
        x = ctx.pull(self._source)
        # Publish the block through the state pytree; the engine's
        # host-side hook (`_eng_on_block`, see engine.Program.
        # _fire_block_hooks / render_scan's tap ys) appends it after the
        # block lands on host. The previous design — an ordered
        # io_callback in the traced program — deadlocks on remote-
        # attached devices (axon tunnel), where the device cannot call
        # back into this process mid-program.
        ctx.state(self, init=lambda: jnp.zeros_like(x))
        ctx.set_state(self, x)
        return x

    def __repr__(self) -> str:
        return f"WavWriterPE(source={type(self._source).__name__}, path='{self._path}')"

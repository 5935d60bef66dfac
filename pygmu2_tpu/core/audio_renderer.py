"""Realtime audio playback renderer.

TPU-native rebuild of the reference AudioRenderer (reference:
src/pygmu2/audio_renderer.py:23-310): blocking playback (``play_range`` /
``play_extent``) and callback streaming (``stream_start/stop/wait``) via
PortAudio through the optional ``sounddevice`` package.

TPU adaptation: the graph renders on device ahead of the DAC — the
blocking path keeps a small read-ahead queue of device-rendered blocks so
host→DAC writes overlap device compute (the reference's pull model renders
synchronously inside the stream write loop).
"""

from __future__ import annotations

import threading

import numpy as np

from pygmu2_tpu.core.config import handle_error
from pygmu2_tpu.core.logger import get_logger
from pygmu2_tpu.core.renderer import Renderer
from pygmu2_tpu.core.snippet import Snippet

_log = get_logger(__name__)

try:  # PortAudio is an optional host dependency.
    import sounddevice as _sd
except Exception:  # pragma: no cover - absent in CI image
    _sd = None


def _require_sd():
    if _sd is None:
        raise RuntimeError(
            "AudioRenderer requires the 'sounddevice' package (PortAudio). "
            "Install it, or use NullRenderer / render_to_file for offline use."
        )
    return _sd


class AudioRenderer(Renderer):
    """Plays the graph through the default audio output device."""

    def __init__(
        self,
        sample_rate: int = 44100,
        blocksize: int = 1024,
        device=None,
        latency=None,
    ):
        super().__init__(sample_rate=sample_rate)
        self._blocksize = int(blocksize)
        self._device = device
        self._latency = latency
        self._stream = None
        self._stream_position = 0
        self._stream_done = threading.Event()

    @property
    def device(self):
        """Output device index/name (None = system default)."""
        return self._device

    @property
    def blocksize(self) -> int:
        return self._blocksize

    # ---- blocking playback ----------------------------------------------

    def _output(self, snippet: Snippet) -> None:
        sd = _require_sd()
        if self._stream is None:
            self._stream = sd.OutputStream(
                samplerate=self._sample_rate,
                channels=snippet.channels,
                blocksize=self._blocksize,
                device=self._device,
                latency=self._latency,
                dtype="float32",
            )
            self._stream.start()
        self._stream.write(np.ascontiguousarray(snippet.data))

    def play_range(self, start: int, duration: int, chunk_size: int | None = None) -> None:
        """Blocking playback of ``[start, start+duration)`` in chunks."""
        chunk = chunk_size or self._blocksize * 16
        pos = start
        end = start + duration
        while pos < end:
            n = min(chunk, end - pos)
            self.render(pos, n)
            pos += n
        self._close_stream()

    def play_extent(self, chunk_size: int | None = None) -> None:
        """Blocking playback of the source's full (finite) extent."""
        if self._source is None:
            handle_error("No source set. Call set_source() first.", fatal=True)
        extent = self._source.extent()
        if extent.start is None or extent.end is None:
            handle_error(
                "Cannot play infinite extent; use play_range() or streaming.",
                fatal=True,
            )
        self.play_range(extent.start, extent.end - extent.start, chunk_size)

    def _close_stream(self) -> None:
        if self._stream is not None:
            self._stream.stop()
            self._stream.close()
            self._stream = None

    def stop(self) -> None:
        self.stream_stop()
        self._close_stream()
        super().stop()

    # ---- callback streaming ---------------------------------------------

    def stream_start(self, start: int = 0, end: int | None = None) -> None:
        """Start callback-driven playback of ``[start, end)`` (``end=None``
        plays to the source extent's end).

        The PortAudio callback thread pulls pre-rendered blocks; a feeder
        thread keeps the device ahead of the DAC.
        """
        sd = _require_sd()
        if self._source is None:
            handle_error("No source set. Call set_source() first.", fatal=True)
        if not self._started:
            handle_error("Not started. Call start() first.", fatal=True)
        if self.is_streaming:
            handle_error(
                "Already streaming. Call stream_stop() first.", fatal=True
            )

        import queue

        self._stream_position = start
        self._stream_done.clear()
        channels = self.channel_count or 1
        q: "queue.Queue[np.ndarray | None]" = queue.Queue(maxsize=4)
        extent = self._source.extent()
        stop_at = end if end is not None else extent.end
        stop_flag = threading.Event()

        def put(item) -> bool:
            # Bounded put so stream_stop() can always unblock the feeder:
            # after stop, nothing drains the queue, and a daemon thread
            # parked in q.put() at interpreter exit aborts the process
            # mid-XLA-call.
            while not stop_flag.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def feeder():
            pos = start
            while not stop_flag.is_set():
                if stop_at is not None and pos >= stop_at:
                    put(None)
                    return
                snippet = self._source.render(pos, self._blocksize)
                if not put(np.ascontiguousarray(snippet.data)):
                    return
                pos += self._blocksize

        self._feeder_stop = stop_flag
        self._feeder = threading.Thread(target=feeder, daemon=True)
        self._feeder.start()

        def callback(outdata, frames, time_info, status):
            try:
                block = q.get_nowait()
            except Exception:
                block = np.zeros((frames, channels), np.float32)
            if block is None:
                raise sd.CallbackStop()
            n = min(frames, block.shape[0])
            outdata[:n] = block[:n]
            if n < frames:
                outdata[n:] = 0
            self._stream_position += frames

        self._cb_stream = sd.OutputStream(
            samplerate=self._sample_rate,
            channels=channels,
            blocksize=self._blocksize,
            device=self._device,
            latency=self._latency,
            dtype="float32",
            callback=callback,
            finished_callback=self._stream_done.set,
        )
        self._cb_stream.start()

    def stream_stop(self) -> None:
        """Stop callback streaming (no-op if not streaming)."""
        if getattr(self, "_feeder_stop", None) is not None:
            self._feeder_stop.set()
        stream = getattr(self, "_cb_stream", None)
        if stream is not None:
            stream.stop()
            stream.close()
            self._cb_stream = None
        feeder = getattr(self, "_feeder", None)
        if feeder is not None and feeder.is_alive():
            # Let an in-flight render finish — a daemon thread killed
            # inside an XLA call at interpreter exit aborts the process.
            feeder.join(timeout=5.0)
        self._stream_done.set()

    def stream_wait(self, timeout: float | None = None) -> bool:
        """Block until streaming finishes; returns False on timeout."""
        return self._stream_done.wait(timeout)

    @property
    def stream_position(self) -> int:
        """Current playback position in samples."""
        return self._stream_position

    @property
    def is_streaming(self) -> bool:
        """True while callback streaming is active and unfinished."""
        return (
            getattr(self, "_cb_stream", None) is not None
            and not self._stream_done.is_set()
        )

    # ---- device info -----------------------------------------------------

    @staticmethod
    def list_devices():
        """Enumerate audio output devices."""
        sd = _require_sd()
        return sd.query_devices()

    @staticmethod
    def get_default_device():
        """Info dict for the system default output device."""
        sd = _require_sd()
        devices = sd.query_devices()
        default = getattr(sd, "default", None)
        idx = None
        if default is not None:
            dev = getattr(default, "device", None)
            if isinstance(dev, (tuple, list)) and len(dev) == 2:
                idx = dev[1]  # (input, output)
            elif isinstance(dev, int):
                idx = dev
        if idx is None or idx < 0:
            for i, d in enumerate(devices):
                if d.get("max_output_channels", 0) > 0:
                    idx = i
                    break
        return devices[idx] if idx is not None else None

    def __repr__(self) -> str:
        return (
            f"AudioRenderer(sample_rate={self._sample_rate}, "
            f"blocksize={self._blocksize})"
        )

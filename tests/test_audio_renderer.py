"""AudioRenderer logic driven headless through a fake PortAudio backend.

The reference leaves AudioRenderer untested by CI (SURVEY §4.7: "no
audio-device tests"); here a fake sounddevice module exercises both the
blocking write loop and the callback streaming path end to end."""

import threading
import time

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core import audio_renderer as ar_mod


class FakeCallbackStop(Exception):
    pass


class FakeOutputStream:
    def __init__(self, samplerate, channels, blocksize, device=None,
                 latency=None, dtype="float32", callback=None,
                 finished_callback=None):
        self.samplerate = samplerate
        self.channels = channels
        self.blocksize = blocksize
        self.callback = callback
        self.finished_callback = finished_callback
        self.writes = []
        self.closed = False
        self._thread = None
        self._stop = threading.Event()

    def start(self):
        if self.callback is None:
            return

        def run():  # pretend DAC: fire the callback at a fast rate
            while not self._stop.is_set():
                out = np.zeros((self.blocksize, self.channels), np.float32)
                try:
                    self.callback(out, self.blocksize, None, None)
                except FakeCallbackStop:
                    break
                self.writes.append(out.copy())
                time.sleep(0.001)
            if self.finished_callback:
                self.finished_callback()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def write(self, data):
        self.writes.append(np.asarray(data).copy())

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def close(self):
        self.closed = True


class FakeSD:
    OutputStream = FakeOutputStream
    CallbackStop = FakeCallbackStop

    @staticmethod
    def query_devices():
        return [{"name": "fake", "max_output_channels": 2}]


@pytest.fixture
def fake_sd(monkeypatch):
    monkeypatch.setattr(ar_mod, "_sd", FakeSD)
    return FakeSD


def _graph(samples=4096):
    return pg.CropPE(pg.SinePE(frequency=440.0, amplitude=0.5), 0, samples)


def test_blocking_play_range(fake_sd):
    r = pg.AudioRenderer(blocksize=256)
    r.set_source(_graph())
    r.start()
    stream_box = []
    orig_output = r._output

    def capture(snippet):
        orig_output(snippet)
        stream_box.append(r._stream)

    r._output = capture
    r.play_range(0, 2048, chunk_size=512)
    r.stop()
    stream = stream_box[0]
    total = sum(w.shape[0] for w in stream.writes)
    assert total == 2048
    expected = _graph().render(0, 2048).data
    np.testing.assert_allclose(
        np.concatenate(stream.writes), expected, atol=1e-6
    )
    assert stream.closed


def test_play_extent_infinite_raises(fake_sd):
    r = pg.AudioRenderer()
    r.set_source(pg.SinePE(frequency=440.0))  # infinite extent
    r.start()
    with pytest.raises(Exception):
        r.play_extent()
    r.stop()


def test_callback_streaming_to_end(fake_sd):
    r = pg.AudioRenderer(blocksize=512)
    r.set_source(_graph(samples=2048))
    r.start()
    r.stream_start(0)
    assert r.stream_wait(timeout=10.0), "stream did not finish"
    stream = getattr(r, "_cb_stream", None)
    writes = list(stream.writes) if stream else []
    r.stream_stop()
    r.stop()
    assert r.stream_position >= 2048
    # The fake DAC runs faster than the feeder, so underruns interleave
    # zero blocks (the renderer's documented fallback). The *real* blocks
    # must still arrive in order and reproduce the piece.
    real = [w for w in writes if np.abs(w).max() > 0]
    assert real, "no audio blocks reached the DAC"
    played = np.concatenate(real)
    expected = _graph(2048).render(0, played.shape[0]).data
    np.testing.assert_allclose(played, expected, atol=1e-6)


def test_list_devices(fake_sd):
    assert pg.AudioRenderer.list_devices()[0]["name"] == "fake"

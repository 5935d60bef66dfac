"""Measure the live-path block-render latencies for LATENCY.md."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import pygmu2_tpu as pg

pg.set_sample_rate(44100)
print("backend:", jax.default_backend())

# Live MIDI synth path: MidiInPE (silent) + MeltysynthPE-style graph.
# Use the scanned synthesizer block path like the live demo does.
import struct
from pygmu2_tpu.soundfont import SoundFont, Synthesizer, SynthesizerSettings
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample

font = SoundFont(build_sf2([{"data": make_looped_sample(261.63, harmonics=6),
                             "rate": 44100, "root_key": 60, "loop": True}]))

for bs in (256, 512, 1024):
    synth = Synthesizer(font, SynthesizerSettings(block_size=bs, maximum_polyphony=32))
    # render blocks directly through the synth (the MeltysynthPE path)
    for ch, key in [(0, 60), (0, 64), (0, 67)]:
        synth.process_midi_message(ch, 0x90, key, 100)
    L = np.zeros(bs, np.float32); R = np.zeros(bs, np.float32)
    synth.render(L, R)  # warm/compile
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        synth.render(L, R)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    print(f"synth block={bs}: median {times[10]:.2f} ms, p90 {times[17]:.2f} ms "
          f"(block duration {bs/44.1:.1f} ms)")

# Graph path: a typical live graph block render through the engine
graph = pg.BiquadPE(pg.MixPE(pg.SinePE(frequency=220.0), pg.SinePE(frequency=330.0)), 2000.0, 1.0)
r = pg.NullRenderer(44100); r.set_source(pg.CropPE(graph, 0, 10**9)); r.start()
c = r._source if hasattr(r, "_source") else None
for bs in (256, 512, 1024):
    snip = c.render(0, bs)
    np.asarray(snip.data)
    times = []
    pos = bs
    for _ in range(20):
        t0 = time.perf_counter()
        s2 = c.render(pos, bs)
        np.asarray(s2.data)
        pos += bs
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    print(f"graph block={bs}: median {times[10]:.2f} ms, p90 {times[17]:.2f} ms")
r.stop()

# Sustained streaming throughput: the stream_start feeder path with
# adaptive K-blocks-per-dispatch batching, real device dispatches, and a
# realtime-paced fake DAC (no audio hardware in this environment). The
# number that matters is underruns over a 30 s piece — zero means the
# feeder sustains RTF >= 1 through the tunnel.
import threading
from pygmu2_tpu.core import audio_renderer as ar_mod


class _PacedStream:
    def __init__(self, samplerate, channels, blocksize, device=None,
                 latency=None, dtype="float32", callback=None,
                 finished_callback=None):
        self.samplerate, self.channels = samplerate, channels
        self.blocksize, self.callback = blocksize, callback
        self.finished_callback = finished_callback
        self._stop = threading.Event()
        self._thread = None

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
                except _CBStop:
                    break
                next_t += block_dur
                d = next_t - time.monotonic()
                if d > 0:
                    time.sleep(d)
            if self.finished_callback:
                self.finished_callback()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def write(self, data):
        pass

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def close(self):
        pass


class _CBStop(Exception):
    pass


class _FakeSD:
    OutputStream = _PacedStream
    CallbackStop = _CBStop


ar_mod._sd = _FakeSD
SECONDS = 30.0
for bs in (512, 1024):
    total = int(SECONDS * 44100)
    rend = pg.AudioRenderer(sample_rate=44100, blocksize=bs)
    rend.set_source(pg.CropPE(
        pg.BiquadPE(pg.MixPE(pg.SinePE(frequency=220.0),
                             pg.SinePE(frequency=330.0)), 2000.0, 1.0),
        0, total))
    rend.start()
    t0 = time.monotonic()
    rend.stream_start(0)
    ok = rend.stream_wait(timeout=SECONDS * 3 + 60)
    wall = time.monotonic() - t0
    print(f"stream block={bs}: {SECONDS:.0f} s piece in {wall:.1f} s wall, "
          f"underruns={rend.stream_underruns}, final batch K={rend.stream_batch}, "
          f"finished={ok}")
    rend.stream_stop()
    rend.stop()

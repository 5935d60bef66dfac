"""Measure the live-path block-render latencies for LATENCY.md."""
import time
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

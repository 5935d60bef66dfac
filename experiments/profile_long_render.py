"""Timeline profile of the 60 s large-font offline render.

Decomposes the end-to-end wall of the bench.py long-render stage into
host-visible phases: schedule simulation, flat pack, rows-prep
dispatch, per-segment dispatch returns, per-segment download
completions. Run on the TPU (axon) target; the interesting output is
where the wall clusters — dispatch RTTs vs link stream vs host work.

Usage: python experiments/profile_long_render.py [seconds] [K]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import bench as B
from pygmu2_tpu.soundfont import MidiFile
from pygmu2_tpu.soundfont import offline as off
from pygmu2_tpu.soundfont.offline import render_midi_offline


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    k_override = int(sys.argv[2]) if len(sys.argv) > 2 else None

    synth, _ = B.build_workload(large_font=True)
    midi = MidiFile(B.build_midi_bytes(repeats=max(1, int(seconds // 4))))

    # warm compiles (both wire formats)
    out = render_midi_offline(synth, midi, seconds, wire="int16")
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # ---- e2e wall, min of 3 ----
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        render_midi_offline(synth, midi, seconds, wire="int16",
                            pipeline=k_override)
        walls.append(time.perf_counter() - t0)
    print(f"e2e wall min-of-3: {min(walls)*1e3:.1f} ms "
          f"(all: {[round(w*1e3,1) for w in walls]}) "
          f"-> {seconds/min(walls):.1f}x realtime")

    # ---- phase timeline (one instrumented run) ----
    t0 = time.perf_counter()

    def mark(label):
        print(f"  {label:<42s} +{(time.perf_counter()-t0)*1e3:8.1f} ms")

    par_np, ch_np, snap_idx, n_blocks = synth.build_schedule(midi, seconds)
    mark("schedule (host sim)")
    pf32, pi32, pf64, cf32, chold, flags = off._pack_schedule_np(par_np, ch_np)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    S, P = pf32.shape[1], pf32.shape[2]
    flat = off._pack_flat(pf32, pi32, pf64, cf32, chold, snap_idx)
    mark("pack (host)")

    N = synth.block_size
    wave = wave_ext if win_w is not None else synth._wave
    l_ext = int(wave_ext.shape[0]) if win_w is not None else 0
    rows = off._prep_rows_flat_jit(
        flat, synth._wave, N, float(synth.master_volume), flags,
        int(synth._minimum_voice_duration), float(synth.sample_rate),
        S, P, int(n_blocks), win_w, l_ext,
    )
    mark("rows-prep dispatch returned")

    K = k_override or max(
        off.PIPELINE_SEGMENTS, min(16, int(n_blocks) // 200)
    )
    base, rem = divmod(int(n_blocks), K)
    st = np.zeros((4, P), np.float32)
    outs = []
    b0 = 0
    for k in range(K):
        sb = base + (1 if k < rem else 0)
        o, st = off._render_rows_seg_jit(
            rows, st, np.int32(b0), wave, N, sb, win_w, "int16", False
        )
        o.copy_to_host_async()
        outs.append(o)
        mark(f"segment {k} dispatch returned ({sb} blocks)")
        b0 += sb
    for k, o in enumerate(outs):
        a = np.asarray(o)
        mark(f"segment {k} downloaded ({a.nbytes/1e6:.2f} MB)")
    synth.reset()


if __name__ == "__main__":
    main()

"""A/B: small font through the resident fused kernel vs forced through
the windowed-DMA kernel.

Motivation (round 3, late): the resident kernel's oscillator is an
R-way masked ``tpu.dynamic_gather`` over the WHOLE table per sub-chunk
(R = W/128 rows — ~11 for the 1.4k-sample bench font), while the
windowed kernel gathers over a span-4 slab of a per-voice window and,
for sustained loops, pays zero steady-state DMA refresh. Once the
window path got prefetched refresh + conditional bounds it measured
FASTER than the resident path on the bench chord (2.18 vs 2.53 ms
amortized) — this experiment measures the comparison cleanly and
checks parity, to decide whether small fonts should route through the
windowed kernel too.

Run on a tunnel-attached TPU: ``python experiments/small_font_windowed.py``
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from pygmu2_tpu.soundfont import offline as _off
from pygmu2_tpu.soundfont import filter_pallas as _fp
from pygmu2_tpu.soundfont.offline import render_midi_offline

SECONDS = 3.0
N_CHAIN = 50


def measure(force_windowed: bool):
    old = _fp.OSC_KERNEL_MAX_WAVE
    if force_windowed:
        _fp.OSC_KERNEL_MAX_WAVE = 0
    try:
        synth, midi = bench.build_workload(large_font=False)
        out = np.asarray(render_midi_offline(synth, midi, SECONDS))
        synth.reset()
        par_np, ch_np, snap_idx, nb = synth.build_schedule(midi, SECONDS)
        wave_ext, win_w = _off._window_args(synth, par_np, ch_np)
        print(f"force_windowed={force_windowed}: win_w={win_w}, "
              f"wave_ext={None if wave_ext is None else wave_ext.shape}")
        # fail loudly if the measurement is mis-routed: _window_args can
        # still return (None, None) (ratio bound past the bucket, or a
        # non-TPU backend), in which case the run below would time the
        # XLA fallback while labeled "windowed" — and vice versa
        if force_windowed:
            assert win_w is not None, (
                "force_windowed run fell back to the XLA path — "
                "measurement would be mislabeled"
            )
        else:
            assert win_w is None and wave_ext is None, (
                "resident run unexpectedly routed to the windowed kernel"
            )
        packed = _off._pack_schedule(par_np, ch_np)
        si = jnp.asarray(snap_idx)

        @jax.jit
        def _chain(pf32, pi32, pf64, cf32, chold_):
            def body(_k, acc):
                r = _off._render_fused(
                    pf32 + acc * 1e-30, pi32, pf64, cf32, chold_, si,
                    synth._wave, synth.block_size,
                    float(synth.master_volume), packed[5],
                    int(synth._minimum_voice_duration),
                    float(synth.sample_rate), wave_ext, win_w,
                )
                return acc + r[0, 0] * 1e-30
            return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        jax.block_until_ready(_chain(*packed[:5]))  # compile
        compile_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        jax.block_until_ready(_chain(*packed[:5]))
        amort = (time.perf_counter() - t1) / N_CHAIN
        return out, amort, compile_s
    finally:
        _fp.OSC_KERNEL_MAX_WAVE = old


def main():
    out_res, t_res, c_res = measure(force_windowed=False)
    out_win, t_win, c_win = measure(force_windowed=True)
    err = float(np.abs(out_res - out_win).max())
    peak = float(np.abs(out_res).max())
    print(f"resident : {1e3*t_res:.2f} ms amortized "
          f"({SECONDS/t_res:.0f}x RTF), compile {c_res:.0f}s")
    print(f"windowed : {1e3*t_win:.2f} ms amortized "
          f"({SECONDS/t_win:.0f}x RTF), compile {c_win:.0f}s")
    print(f"parity   : max |diff| = {err:.2e} (peak {peak:.3f})")
    assert err <= 1e-4 * max(peak, 1.0), "parity violated"


if __name__ == "__main__":
    main()

"""Device-compute decomposition of the 60 s large-font render.

Times (a) the control+rows prep pass and (b) the fused audio kernel
separately, each amortized over a chained jitted loop (OPTIMIZING.md
rule 1 — per-call dispatch pays the tunnel RTT). The sum is the
device_compute_ms term of the north-star accounting.

Usage: python experiments/device_split_60s.py [seconds] [n_chain]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

import bench as B
from pygmu2_tpu.soundfont import MidiFile
from pygmu2_tpu.soundfont import offline as off


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    n_chain = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    synth, _ = B.build_workload(large_font=True)
    midi = MidiFile(B.build_midi_bytes(repeats=max(1, int(seconds // 4))))

    par_np, ch_np, snap_idx, n_blocks = synth.build_schedule(midi, seconds)
    pf32, pi32, pf64, cf32, chold, flags = off._pack_schedule_np(par_np, ch_np)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)
    S, P = pf32.shape[1], pf32.shape[2]
    flat_np = off._pack_flat(pf32, pi32, pf64, cf32, chold, snap_idx)
    flat = jnp.asarray(flat_np)  # device-resident for chained timing
    N = synth.block_size
    wave = wave_ext if win_w is not None else synth._wave
    l_ext = int(wave_ext.shape[0]) if win_w is not None else 0
    args = (
        synth._wave, N, float(synth.master_volume), flags,
        int(synth._minimum_voice_duration), float(synth.sample_rate),
        S, P, int(n_blocks), win_w, l_ext,
    )

    # Rule 1b (OPTIMIZING.md): until the process performs one D2H,
    # block_until_ready returns on ENQUEUE and every timing is fiction.
    # Pull a scalar to host first, and materialize every timed result
    # with float(...) inside the timed region.
    float(jnp.sum(flat[:8]))

    # ---- (a) control + rows prep, chained ----
    @jax.jit
    def chain_prep(f):
        def body(_k, acc):
            rows = off._prep_rows_flat(f + acc * 1e-30, *args)
            # depend on EVERY row plane so XLA cannot dead-code any of
            # the prep (a single-element dependency lets it slice the
            # whole pass down to one lane)
            dep = sum(
                v.astype(jnp.float32).sum() for v in rows.values()
            )
            return acc + dep * 1e-30
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

    float(chain_prep(flat))  # compile + warm
    t0 = time.perf_counter()
    float(chain_prep(flat))
    prep_ms = (time.perf_counter() - t0) / n_chain * 1e3

    # ---- (b) fused audio kernel over the whole piece, chained ----
    rows = off._prep_rows_flat_jit(flat, *args)
    rows = {k: jnp.asarray(v) for k, v in rows.items()}

    @jax.jit
    def chain_audio(rws):
        def body(_k, acc):
            st = jnp.zeros((4, P), jnp.float32)
            r2 = {k: (v + acc * 1e-30 if v.dtype == jnp.float32 else v)
                  for k, v in rws.items()}
            out, _st = off._render_rows_seg(
                r2, st, jnp.int32(0), wave, N, int(n_blocks), win_w,
                "int16", False,
            )
            # the LAST sample depends on every kernel chunk through the
            # carried filter state — nothing can be dead-coded
            return acc + out[-1, -1].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n_chain, body, jnp.float32(0.0))

    float(chain_audio(rows))  # compile + warm
    t0 = time.perf_counter()
    float(chain_audio(rows))
    audio_ms = (time.perf_counter() - t0) / n_chain * 1e3

    total = prep_ms + audio_ms
    print(f"blocks={n_blocks} S={S} P={P} win_w={win_w}")
    print(f"control+rows prep: {prep_ms:8.1f} ms")
    print(f"fused audio kernel:{audio_ms:8.1f} ms")
    print(f"device total:      {total:8.1f} ms  -> {seconds*1e3/total:.0f}x device RTF")


if __name__ == "__main__":
    main()

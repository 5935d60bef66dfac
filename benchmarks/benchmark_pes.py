#!/usr/bin/env python
"""Per-PE throughput benchmark suite.

TPU-native rebuild of the reference harness (reference:
benchmarks/benchmark_pes.py:37-200): auto-discovers PE configurations,
renders one second of audio per run, and reports mean/std/min/max wall
time, samples/s, and the realtime ratio vs 44.1 kHz.

TPU adaptation: each config is measured through ``engine.render_scan``
(one compiled launch), with a warm-up run excluded so compile time
doesn't pollute the statistics. Run with ``--cpu`` to force the CPU
backend.

Usage:
    python benchmarks/benchmark_pes.py [--seconds 1.0] [--runs 5] [--cpu]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_configs(pg):
    """One benchmark configuration per exported concrete PE (name →
    builder), mirroring the reference's auto-discovery (reference:
    benchmarks/benchmark_pes.py:75-105). Variant rows (``_swept``,
    ``_mod``, …) cover compiled paths a default config would miss.
    ``tests/test_benchmark_coverage.py`` asserts every exported
    renderable PE has a row here, so new PEs can't silently dodge perf
    regression."""
    import os

    import numpy as np

    sr = 44100
    wav = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)

    def arr():
        return pg.ArrayPE(wav)

    ir = (np.random.default_rng(0).uniform(-1, 1, 2048) * np.exp(-np.arange(2048) / 400)).astype(np.float32)

    def tmp_wav():
        path = "/tmp/bench_pes_in.wav"
        if not os.path.exists(path):
            from pygmu2_tpu.utils.wavio import write_wav

            write_wav(path, wav[:, None], sr)
        return path

    def tmp_flac():
        path = "/tmp/bench_pes_in.flac"
        if not os.path.exists(path):
            from pygmu2_tpu.utils.flacio import write_flac

            write_flac(path, wav[:, None], sr)
        return path

    def melty():
        font = "/tmp/bench_pes_font.sf2"
        if not os.path.exists(font):
            from pygmu2_tpu.soundfont.build import (
                build_sf2,
                make_looped_sample,
            )

            with open(font, "wb") as f:
                f.write(
                    build_sf2(
                        [
                            {
                                "data": make_looped_sample(261.63),
                                "rate": sr,
                                "root_key": 60,
                                "loop": True,
                            }
                        ]
                    )
                )
        pe = pg.MeltysynthPE(font, block_size=64)
        pe._ensure_synth()
        pe.synthesizer.process_midi_message(0, 0x90, 60, 100)
        return pe

    return {
        "SinePE": lambda: pg.SinePE(frequency=440.0),
        "SinePE_fm": lambda: pg.SinePE(frequency=pg.MixPE(pg.ConstantPE(440.0), pg.SinePE(frequency=5.0, amplitude=30.0))),
        "NoisePE_white": lambda: pg.NoisePE(seed=1),
        "NoisePE_pink": lambda: pg.NoisePE(seed=1, mode=pg.NoiseMode.PINK),
        "BlitSawPE": lambda: pg.BlitSawPE(frequency=220.0),
        "SuperSawPE_7": lambda: pg.SuperSawPE(110.0, voices=7, seed=1),
        "AnalogOscPE": lambda: pg.AnalogOscPE(frequency=220.0),
        "FunctionGenPE": lambda: pg.FunctionGenPE(frequency=220.0),
        "KarplusStrongPE": lambda: pg.KarplusStrongPE(220.0, seed=1),
        "GainPE": lambda: pg.GainPE(arr(), 0.5),
        "MixPE_8": lambda: pg.MixPE(*[pg.SinePE(frequency=100.0 * (i + 1), amplitude=0.1) for i in range(8)]),
        "DelayPE_int": lambda: pg.DelayPE(arr(), 1000),
        "DelayPE_mod": lambda: pg.DelayPE(arr(), pg.MixPE(pg.ConstantPE(100.0), pg.SinePE(frequency=1.0, amplitude=50.0)), max_delay=256),
        "BiquadPE": lambda: pg.BiquadPE(arr(), 1000.0, 2.0),
        "BiquadPE_swept": lambda: pg.BiquadPE(arr(), pg.PiecewisePE([(0, 200.0), (sr, 8000.0)]), 2.0),
        "SVFilterPE": lambda: pg.SVFilterPE(arr(), 1000.0, 2.0),
        "LadderPE": lambda: pg.LadderPE(arr(), 2000.0, resonance=0.5),
        "CombPE": lambda: pg.CombPE(arr(), frequency=220.0, feedback=0.8),
        "EnvelopePE": lambda: pg.EnvelopePE(arr(), attack=0.01, release=0.1),
        "CompressorPE": lambda: pg.CompressorPE(arr(), threshold=-20.0, ratio=4.0),
        "ConvolvePE_2k": lambda: pg.ConvolvePE(arr(), pg.ArrayPE(ir)),
        "ReverbPE": lambda: pg.ReverbPE(arr(), pg.ArrayPE(ir), mix=0.3),
        "SpatialHRTF": lambda: pg.SpatialPE(arr(), method=pg.SpatialHRTF(azimuth=45.0)),
        "WindowPE_rms": lambda: pg.WindowPE(arr(), window=0.01, mode=pg.WindowMode.RMS),
        "TimeWarpPE": lambda: pg.TimeWarpPE(arr(), rate=1.5),
        "ReversePitchEchoPE": lambda: pg.ReversePitchEchoPE(arr(), block_seconds=0.05, feedback=0.5, max_delay_seconds=0.1),
        "AdsrGatedPE": lambda: pg.AdsrGatedPE(pg.PeriodicGate(frequency=2.0), 0.01, 0.05, 0.6, 0.1),
        "AdsrTriggeredPE": lambda: pg.AdsrTriggeredPE(pg.PeriodicTrigger(hz=2.0), 0.01, 0.05, 0.2, 0.6, 0.1),
        "PiecewisePE": lambda: pg.PiecewisePE([(i * 100, float(i % 7)) for i in range(100)]),
        "WavetablePE": lambda: pg.WavetablePE(pg.ArrayPE(wav[:1024]), pg.TransformPE(pg.IdentityPE(), lambda x: x * 3.7), out_of_bounds=pg.OutOfBoundsMode.WRAP),
        "WavetablePE_cubic": lambda: pg.WavetablePE(pg.ArrayPE(wav[:1024]), pg.TransformPE(pg.IdentityPE(), lambda x: x * 3.7), interpolation=pg.InterpolationMode.CUBIC, out_of_bounds=pg.OutOfBoundsMode.WRAP),
        "TralfamPE": lambda: pg.TralfamPE(arr(), seed=1),
        # --- sources / control ------------------------------------------
        "ConstantPE": lambda: pg.ConstantPE(0.5),
        "IdentityPE": lambda: pg.IdentityPE(),
        "DiracPE": lambda: pg.DiracPE(),
        "ArrayPE": arr,
        "NoisePE_brown": lambda: pg.NoisePE(seed=1, mode=pg.NoiseMode.BROWN),
        "ParamPE": lambda: pg.ParamPE("bench", default=0.5),
        "ControlPE": lambda: pg.ControlPE(0.3),
        "RandomPE_walk": lambda: pg.RandomPE(rate=8.0, seed=1, mode=pg.RandomMode.WALK),
        "PortamentoPE": lambda: pg.PortamentoPE([(60.0 + (i % 12), i * 2205, 2205) for i in range(20)]),
        "PeriodicGate": lambda: pg.PeriodicGate(frequency=4.0),
        "PeriodicTrigger": lambda: pg.PeriodicTrigger(hz=4.0),
        "FunctionGenPE_saw": lambda: pg.FunctionGenPE(frequency=220.0, waveform="sawtooth"),
        # --- routing / structure ----------------------------------------
        "GainPE_modulated": lambda: pg.GainPE(arr(), pg.SinePE(frequency=2.0, amplitude=0.5)),
        "TransformPE": lambda: pg.TransformPE(arr(), lambda x: x * x * 0.5, name="square"),
        "CachePE": lambda: pg.CachePE(arr()),
        "CropPE": lambda: pg.CropPE(arr(), 100, sr - 200),
        "SetExtentPE": lambda: pg.SetExtentPE(arr(), 0, sr, extend_mode=pg.ExtendMode.HOLD_BOTH),
        "SlicePE": lambda: pg.SlicePE(arr(), 1000, sr - 2000, fade_in_seconds=0.01, fade_out_seconds=0.01),
        "LoopPE": lambda: pg.LoopPE(pg.CropPE(arr(), 0, 4410), 0, 4410, crossfade_seconds=0.01),
        "SequencePE": lambda: pg.SequencePE((pg.CropPE(arr(), 0, sr // 2), 0), (pg.CropPE(arr(), 0, sr // 2), sr // 2)),
        "TriggerPE": lambda: pg.TriggerPE(pg.PeriodicGate(frequency=2.0), pg.CropPE(arr(), 0, 8000)),
        "TriggerRestartPE": lambda: pg.TriggerRestartPE(pg.PeriodicTrigger(hz=2.0), pg.CropPE(pg.BlitSawPE(frequency=220.0), 0, 8000)),
        "RandomSelectPE": lambda: pg.RandomSelectPE(pg.PeriodicTrigger(hz=4.0), [pg.CropPE(pg.SinePE(frequency=220.0), 0, 8000), pg.CropPE(pg.SinePE(frequency=330.0), 0, 8000), pg.CropPE(pg.SinePE(frequency=440.0), 0, 8000)], seed=1),
        "ResetPE": lambda: pg.ResetPE(pg.CropPE(pg.BlitSawPE(frequency=220.0), 0, sr), pg.PeriodicTrigger(hz=2.0)),
        # --- holds / smoothing -------------------------------------------
        "SampleHoldPE": lambda: pg.SampleHoldPE(pg.NoisePE(seed=1), pg.PeriodicTrigger(hz=100.0)),
        "TrackHoldPE": lambda: pg.TrackHoldPE(pg.NoisePE(seed=1), pg.PeriodicGate(frequency=10.0)),
        "SlewLimiterPE": lambda: pg.SlewLimiterPE(pg.NoisePE(seed=1), rise_rate=10.0, fall_rate=5.0),
        # --- filters / dynamics variants ----------------------------------
        "SVFilterPE_swept": lambda: pg.SVFilterPE(arr(), pg.PiecewisePE([(0, 200.0), (sr, 8000.0)]), 2.0),
        "DynamicsPE": lambda: pg.DynamicsPE(arr(), pg.EnvelopePE(pg.CachePE(arr()), attack=0.01, release=0.1), threshold=-20.0, ratio=4.0),
        "LimiterPE": lambda: pg.LimiterPE(arr(), ceiling=-1.0),
        "ExpanderPE": lambda: pg.ExpanderPE(arr(), threshold=-40.0),
        "WindowPE_mean": lambda: pg.WindowPE(arr(), window=0.01, mode=pg.WindowMode.MEAN),
        # --- spatial variants ---------------------------------------------
        "SpatialLinear": lambda: pg.SpatialPE(arr(), method=pg.SpatialLinear(azimuth=30.0)),
        "SpatialConstantPower": lambda: pg.SpatialPE(arr(), method=pg.SpatialConstantPower(azimuth=30.0)),
        # --- host-I/O-backed sources (decode at start; per-block host
        # callbacks for the live synth/MIDI rows — on a remote device the
        # callback round-trip IS the workload) ------------------------------
        "WavReaderPE": lambda: pg.WavReaderPE(tmp_wav()),
        "AudioReaderPE_flac": lambda: pg.AudioReaderPE(tmp_flac()),
        "WavWriterPE": lambda: pg.WavWriterPE(arr(), "/tmp/bench_pes_out.wav"),
        "MidiInPE": lambda: pg.MidiInPE(require_mido=False),
        "MeltysynthPE": melty,
    }


# Rows whose render path runs ordered host callbacks (io_callback /
# queue drains): excluded from the chained device-only measurement —
# see the comment at the call site.
HOST_ONLY_ROWS = {"WavWriterPE", "MidiInPE", "MeltysynthPE"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=1.0)
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--only", type=str, default=None)
    parser.add_argument(
        "--write-md",
        action="store_true",
        help="regenerate the per-PE table in BENCHMARKS.md from this "
        "run (full row set on a non-CPU backend only)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pygmu2_tpu as pg
    from pygmu2_tpu.core import engine

    pg.set_sample_rate(44100)
    total = int(args.seconds * 44100)
    configs = build_configs(pg)
    if args.only:
        pats = [p for p in args.only.split(",") if p]
        configs = {k: v for k, v in configs.items() if any(p in k for p in pats)}

    import numpy as _np

    # Calibrate the host<->device link so the device-only column can
    # subtract it: D2H time per second-of-audio (the dev tunnel is
    # ~25 MB/s; on a host-attached chip this is negligible).
    import jax.numpy as jnp

    link_per_s = 0.0
    if not args.cpu and jax.default_backend() != "cpu":
        a1 = jnp.zeros((44100, 1), jnp.float32) + 1.0
        a4 = jnp.zeros((4 * 44100, 1), jnp.float32) + 1.0
        jax.block_until_ready((a1, a4))
        _np.asarray(a1)
        t0 = time.perf_counter(); _np.asarray(a1); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); _np.asarray(a4); d4 = time.perf_counter() - t0
        link_per_s = max((d4 - d1) / 3.0, 0.0) * 1e3  # ms per 1 s audio

    print(f"backend={jax.default_backend()}  samples/run={total}  "
          f"runs={args.runs}  link≈{link_per_s:.1f} ms/s-audio")
    print(f"{'PE':<22} {'mean ms':>9} {'std':>7} {'min':>8} {'max':>8} "
          f"{'Msmp/s':>9} {'xRT':>8} {'dev Msmp/s':>11} {'xRT_dev':>8}")
    print("-" * 100)

    def timed_render(pe, n, runs):
        times = []
        for _ in range(runs):
            # Reuse the same instance: re-rendering from 0 is a
            # non-contiguous request, so the engine auto-resets the
            # carried state; rebuilding would re-trace per run.
            t0 = time.perf_counter()
            out = engine.render_scan(pe, 0, n, 16384)
            _np.asarray(out)  # render-to-host is the real workload
            times.append((time.perf_counter() - t0) * 1e3)
        return times

    from pygmu2_tpu.core import prec
    from pygmu2_tpu.core.engine import render_functional

    def device_ms_per_render(pe, n, block=16384, k1=4, k2=28):
        """True on-chip time per render: chain the purely-functional
        render inside ONE jitted fori_loop (dynamic trip count: one
        compile) and difference two trip counts, which cancels the
        dispatch round-trip and every other per-call fixed cost — the
        BASELINE.json Msamples/s/chip methodology. The accumulator
        threads into the next render's start index (still 0 after the
        1e-30 scaling) so iterations can't be CSE'd, and the full-sum
        dependency keeps XLA from slicing the render to one lane. The
        chain result is pulled to host via float() (block_until_ready is
        enqueue-only before the first D2H — OPTIMIZING.md rule 1b)."""

        @jax.jit
        def chain(k):
            def body(_k, acc):
                start = (acc * 1e-30).astype(prec.INDEX)
                out = render_functional(pe, start, n, block)
                return acc + out.astype(jnp.float32).sum() * 1e-30

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(chain(jnp.int32(2)))  # compile + warm

        def measure(k_lo, k_hi):
            t1s, t2s = [], []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(jnp.int32(k_lo)))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(chain(jnp.int32(k_hi)))
                t2s.append(time.perf_counter() - t0)
            return min(t2s) - min(t1s)

        # Escalate the trip count until the differenced total clears the
        # tunnel jitter floor (~20 ms) — a PE at thousands of Msmp/s
        # costs only ~10 us per render, invisible at 24 extra trips.
        for k_hi in (k2, 252, 2044):
            diff_s = measure(k1, k_hi)
            if diff_s >= 0.02:
                break
        return diff_s / (k_hi - k1) * 1e3

    header = (
        f"{'PE':<22} {'mean ms':>9} {'std':>7} {'min':>8} {'max':>8} "
        f"{'Msmp/s':>9} {'xRT':>8} {'dev Msmp/s':>11} {'xRT_dev':>8}"
    )
    lines, dev_rtfs = [], {}
    for name, build in configs.items():
        try:
            pe = build()
            out = engine.render_scan(pe, 0, total, 16384)  # warm-up/compile
            # second warm-up: the first call compiled the stateless
            # first-block program; a re-render from 0 compiles the
            # carried-state step/scan variant, which would otherwise
            # pollute the first timed run.
            out = engine.render_scan(pe, 0, total, 16384)
            # Force a device->host transfer before timing: on remote
            # targets block_until_ready() alone returns at enqueue until
            # the process has performed one D2H (see OPTIMIZING.md 1b),
            # which silently fakes the numbers.
            _np.asarray(out)
            times = timed_render(pe, total, args.runs)
            mean = statistics.mean(times)
            std = statistics.stdev(times) if len(times) > 1 else 0.0
            msps = total / (mean / 1e3) / 1e6
            xrt = (total / 44100) / (mean / 1e3)
            if name in HOST_ONLY_ROWS:
                # Host-I/O-backed PEs (ordered io_callback file writers,
                # live-MIDI queue drains, the block-callback Meltysynth
                # synth) must not be chained on-device: an ordered host
                # callback inside the jitted fori_loop either hangs the
                # remote compiler or pays one tunnel RTT per trip. Their
                # e2e columns ARE the workload.
                dev_ms = None
            else:
                try:
                    dev_ms = device_ms_per_render(pe, total)
                except Exception:
                    dev_ms = None
            if dev_ms is None:
                dev_msps_str, dev_rtf_str = "host", "host"
            elif dev_ms <= 0.0:  # differenced mins can go negative in noise
                dev_msps_str, dev_rtf_str = "noise", "noise"
            else:
                dev_msps_str = f"{total / (dev_ms / 1e3) / 1e6:.0f}"
                dev_rtf_str = f"{(total / 44100) / (dev_ms / 1e3):.0f}"
            line = (
                f"{name:<22} {mean:>9.2f} {std:>7.2f} {min(times):>8.2f} "
                f"{max(times):>8.2f} {msps:>9.1f} {xrt:>8.1f} "
                f"{dev_msps_str:>11} {dev_rtf_str:>8}"
            )
            if dev_rtf_str not in ("noise", "host"):
                dev_rtfs[name] = float(dev_rtf_str)
            print(line)
            lines.append(line)
        except Exception as exc:  # keep the suite running
            line = f"{name:<22} FAILED: {type(exc).__name__}: {exc}"
            print(line)
            lines.append(line)

    if args.write_md:
        if args.only or jax.default_backend() == "cpu":
            print("--write-md skipped: needs the full row set on the "
                  "device backend")
        else:
            meta = (f"backend={jax.default_backend()}  samples/run={total}  "
                    f"runs={args.runs}  link≈{link_per_s:.1f} ms/s-audio")
            write_md(meta, header, lines, dev_rtfs)
    return 0


def write_md(meta, header, lines, dev_rtfs, path=None):
    """Regenerate the per-PE table between the BENCH:PERPE markers in
    BENCHMARKS.md from this very run (one capture of record — the same
    discipline bench.py applies to the headline section). The prose
    below the table is DERIVED from the measured numbers, so it cannot
    contradict them."""
    md = Path(path or Path(__file__).resolve().parents[1] / "BENCHMARKS.md")
    try:
        text = md.read_text()
    except OSError:
        return
    begin = "<!-- BENCH:PERPE:BEGIN (regenerated by benchmark_pes.py --write-md; do not edit by hand) -->"
    end = "<!-- BENCH:PERPE:END -->"
    if begin not in text or end not in text:
        return
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    slow = sorted(
        ((n, r) for n, r in dev_rtfs.items() if r < 1000),
        key=lambda kv: kv[1],
    )
    if slow:
        names = ", ".join(f"{n} ({r:.0f}x)" for n, r in slow)
        prose = (
            f"Reading the table: {len(dev_rtfs) - len(slow)} of "
            f"{len(dev_rtfs)} measured rows are >=1000x realtime "
            f"on-chip; below the bar this run: {names}. Host-I/O-backed "
            "rows (readers/writers, live MIDI, the block-callback "
            "Meltysynth synth) measure the host round-trip by design."
        )
    else:
        prose = (
            f"Reading the table: all {len(dev_rtfs)} measured rows are "
            ">=1000x realtime on-chip this run."
        )
    table = "\n".join(["```", meta, header, "-" * 100, *lines, "```"])
    body = f"\nCapture: `python benchmarks/benchmark_pes.py --write-md`, {stamp}.\n\n{table}\n\n{prose}\n"
    new = (
        text[: text.index(begin) + len(begin)]
        + body
        + text[text.index(end):]
    )
    md.write_text(new)


if __name__ == "__main__":
    sys.exit(main())

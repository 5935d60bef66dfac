"""Multi-chip sharding on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine
from pygmu2_tpu.parallel.render import (
    default_mesh,
    render_midi_sharded,
    render_time_sharded,
    render_time_sharded_affine,
    render_time_sharded_stateful,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_mesh
class TestTimeSharded:
    def test_matches_single_device(self):
        graph = pg.GainPE(pg.SinePE(frequency=441.0), 0.5)
        mesh = default_mesh(8, axis="t")
        total = 44100
        sharded = render_time_sharded(graph, 0, total, mesh, block=2048)
        single = np.asarray(engine.render_scan(graph, 0, total, 2048))
        np.testing.assert_allclose(sharded, single, atol=1e-6)

    def test_stateful_rejected(self):
        mesh = default_mesh(8, axis="t")
        with pytest.raises(ValueError):
            render_time_sharded(pg.NoisePE(seed=1, mode=pg.NoiseMode.PINK), 0, 100, mesh)


@needs_mesh
class TestTimeShardedStateful:
    def _graph(self):
        # a stateful chain: two cascaded biquads over a modulated sine
        # (the modulated path carries a phase accumulator)
        src = pg.SinePE(frequency=pg.ConstantPE(220.0), amplitude=0.7)
        return pg.BiquadPE(pg.BiquadPE(src, 3000.0, 1.2), 800.0, 0.9)

    def test_exact_relay_matches_single_device(self):
        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_stateful(
            self._graph(), 0, total, mesh, block=1024
        )
        engine.reset_graph_states(self._graph())
        single = np.asarray(
            engine.render_scan(self._graph(), 0, total, 1024)
        )
        # The relay is EXACT in its state chain (device d starts from
        # precisely the state d-1 ended with); outputs match the
        # single-device render up to XLA's fp instruction scheduling,
        # which legally differs between the shard_map program and the
        # plain block scan (fma formation — observed <=3e-6 on this
        # resonant chain; round 5, see parallel/render.py docstring).
        np.testing.assert_allclose(sharded, single, atol=2e-5)

    def test_halo_mode_converges(self):
        # halo mode requires *decaying* state only: a pure source (the
        # scalar-frequency sine has closed-form phase) into IIR filters.
        # A phase accumulator (modulated sine) would never converge —
        # its phase depends on where rendering started.
        def graph():
            src = pg.SinePE(frequency=220.0, amplitude=0.7)
            return pg.BiquadPE(pg.BiquadPE(src, 3000.0, 1.2), 800.0, 0.9)

        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_stateful(
            graph(), 0, total, mesh, block=1024, halo=4096
        )
        single = np.asarray(engine.render_scan(graph(), 0, total, 1024))
        # the cold-start transient lives only in the first device's span
        # (its halo pre-rolls t < 0 where the sine is still defined);
        # compare beyond it
        np.testing.assert_allclose(
            sharded[2048:], single[2048:], atol=1e-5
        )

    def test_halo_rejects_non_decaying_state(self):
        # a modulated sine carries a phase accumulator: its state
        # depends on where rendering started and never converges in a
        # warm-up. The gate must refuse rather than silently diverge.
        mesh = default_mesh(8, axis="t")
        with pytest.raises(ValueError, match="non-decaying.*SinePE"):
            render_time_sharded_stateful(
                self._graph(), 0, 8 * 2048, mesh, block=1024, halo=4096
            )

    def test_halo_rejects_brown_noise_accepts_pink(self):
        mesh = default_mesh(8, axis="t")
        brown = pg.BiquadPE(
            pg.NoisePE(seed=3, mode=pg.NoiseMode.BROWN), 2000.0, 0.8
        )
        with pytest.raises(ValueError, match="NoisePE"):
            render_time_sharded_stateful(
                brown, 0, 8 * 2048, mesh, block=1024, halo=4096
            )
        pink = pg.BiquadPE(
            pg.NoisePE(seed=3, mode=pg.NoiseMode.PINK), 2000.0, 0.8
        )
        out = render_time_sharded_stateful(
            pink, 0, 8 * 2048, mesh, block=1024, halo=4096
        )
        assert np.isfinite(out).all()

    def test_halo_rejects_random_walk_accepts_clocked(self):
        # RandomPE WALK carries a non-converging walk value; the clocked
        # modes are pure functions of absolute time.
        mesh = default_mesh(8, axis="t")
        walk = pg.GainPE(
            pg.SinePE(frequency=440.0),
            pg.RandomPE(rate=100.0, mode=pg.RandomMode.WALK, seed=1),
        )
        with pytest.raises(ValueError, match="RandomPE"):
            render_time_sharded_stateful(
                walk, 0, 8 * 2048, mesh, block=1024, halo=4096
            )
        clocked = pg.GainPE(
            pg.SinePE(frequency=440.0),
            pg.RandomPE(rate=100.0, mode=pg.RandomMode.SMOOTH, seed=1),
        )
        out = render_time_sharded_stateful(
            clocked, 0, 8 * 2048, mesh, block=1024, halo=4096
        )
        assert np.isfinite(out).all()

    def test_exact_relay_unaffected_by_gate(self):
        # halo=0 (exact mode) must keep accepting non-decaying state
        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_stateful(
            self._graph(), 0, total, mesh, block=1024, halo=0
        )
        assert np.isfinite(sharded).all()


@needs_mesh
class TestTimeShardedAffine:
    """Parallel-EXACT time sharding for affine-state graphs: the span
    maps compose across the mesh instead of serializing on a ring."""

    def _graph(self):
        # pure source into a cascade of linear filters (affine state)
        src = pg.SinePE(frequency=220.0, amplitude=0.7)
        return pg.BiquadPE(pg.BiquadPE(src, 3000.0, 1.2), 800.0, 0.9)

    def test_matches_single_device(self):
        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_affine(
            self._graph(), 0, total, mesh, block=1024
        )
        single = np.asarray(engine.render_scan(self._graph(), 0, total, 1024))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_swept_filter_matches(self):
        # time-varying coefficients stay affine in STATE (the sweep
        # comes from a parameter subgraph, not from the filter state)
        def graph():
            sweep = pg.PiecewisePE([(0, 500.0), (8 * 2048, 4000.0)])
            return pg.BiquadPE(
                pg.SinePE(frequency=220.0, amplitude=0.7), sweep, 2.0
            )

        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_affine(graph(), 0, total, mesh, block=1024)
        single = np.asarray(engine.render_scan(graph(), 0, total, 1024))
        # resonance sweeps amplify the f32 probe rounding; hold the
        # golden-parity budget (1e-4) rather than the const-coeff 1e-5
        np.testing.assert_allclose(sharded, single, atol=1e-4)

    def test_svf_and_stereo_matches(self):
        def graph():
            src = pg.SpatialPE(
                pg.SinePE(frequency=330.0, amplitude=0.5),
                method=pg.SpatialLinear(0.3),
            )
            return pg.SVFilterPE(src, 1200.0, 1.5)

        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_affine(graph(), 0, total, mesh, block=1024)
        single = np.asarray(engine.render_scan(graph(), 0, total, 1024))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_convolve_matches(self):
        def graph():
            ir = pg.ArrayPE(np.exp(-np.arange(300) / 40.0).astype(np.float32))
            return pg.ConvolvePE(pg.SinePE(frequency=220.0, amplitude=0.5), ir)

        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_affine(graph(), 0, total, mesh, block=1024)
        single = np.asarray(engine.render_scan(graph(), 0, total, 1024))
        # D = len(fir) - 1 probe columns sum in the correction, each with
        # its own FFT rounding — hold the 1e-4 golden budget here
        np.testing.assert_allclose(sharded, single, atol=1e-4)

    def test_nonaffine_rejected(self):
        # LadderPE's tanh feedback is nonlinear in state: must refuse.
        mesh = default_mesh(8, axis="t")
        graph = pg.LadderPE(pg.SinePE(frequency=220.0), 2000.0, 0.3)
        with pytest.raises(ValueError, match="affine"):
            render_time_sharded_affine(graph, 0, 8 * 2048, mesh, block=1024)

    def test_nonzero_start_matches(self):
        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        start = 5000
        sharded = render_time_sharded_affine(
            self._graph(), start, total, mesh, block=1024
        )
        single = np.asarray(
            engine.render_scan(self._graph(), start, total, 1024)
        )
        np.testing.assert_allclose(sharded, single, atol=1e-5)


@needs_mesh
class TestTimeShardedAuto:
    """Strategy selection: callers go through render_time_sharded_auto,
    which picks pure / affine / relay from the graph's purity, state
    declarations, and float-state dimension D vs the mesh size (the
    affine basis probe is D+1 span renders; the relay is n_dev serial
    span rounds — affine wins iff D + 1 <= n_dev)."""

    def test_selects_pure(self):
        from pygmu2_tpu.parallel.render import select_time_sharding

        mesh = default_mesh(8, axis="t")
        graph = pg.GainPE(pg.SinePE(frequency=441.0), 0.5)
        assert select_time_sharding(graph, mesh) == ("pure", 0)

    def test_selects_affine_for_small_filter_state(self):
        from pygmu2_tpu.parallel.render import select_time_sharding

        mesh = default_mesh(8, axis="t")
        src = pg.SinePE(frequency=220.0, amplitude=0.7)
        # one biquad: D = 4 (x1,x2,y1,y2) -> 5-wide basis beats 8 serial
        # relay rounds; a two-biquad cascade (D = 8) already crosses over
        graph = pg.BiquadPE(src, 3000.0, 1.2)
        mode, D = select_time_sharding(graph, mesh, block=1024)
        assert (mode, D) == ("affine", 4)
        cascade = pg.BiquadPE(pg.BiquadPE(src, 3000.0, 1.2), 800.0, 0.9)
        assert select_time_sharding(cascade, mesh, block=1024) == ("relay", 8)

    def test_selects_relay_for_long_fir_history(self):
        from pygmu2_tpu.parallel.render import select_time_sharding

        mesh = default_mesh(8, axis="t")
        ir = pg.ArrayPE(np.exp(-np.arange(300) / 40.0).astype(np.float32))
        graph = pg.ConvolvePE(pg.SinePE(frequency=220.0, amplitude=0.5), ir)
        mode, D = select_time_sharding(graph, mesh, block=1024)
        assert mode == "relay"
        assert D + 1 > 8  # the basis fan-out the crossover must avoid

    def test_selects_relay_for_nonaffine_state(self):
        from pygmu2_tpu.parallel.render import select_time_sharding

        mesh = default_mesh(8, axis="t")
        graph = pg.LadderPE(pg.SinePE(frequency=220.0), 2000.0, 0.3)
        mode, D = select_time_sharding(graph, mesh, block=1024)
        assert mode == "relay"
        assert D == -1  # dimension not probed for non-affine graphs

    def test_affine_max_basis_override(self):
        from pygmu2_tpu.parallel.render import select_time_sharding

        mesh = default_mesh(8, axis="t")
        src = pg.SinePE(frequency=220.0, amplitude=0.7)
        graph = pg.BiquadPE(src, 3000.0, 1.2)
        mode, _ = select_time_sharding(
            graph, mesh, block=1024, affine_max_basis=1
        )
        assert mode == "relay"

    @pytest.mark.parametrize(
        "build",
        [
            lambda: pg.GainPE(pg.SinePE(frequency=441.0), 0.5),
            lambda: pg.BiquadPE(
                pg.SinePE(frequency=220.0, amplitude=0.7), 3000.0, 1.2
            ),
            lambda: pg.ConvolvePE(
                pg.SinePE(frequency=220.0, amplitude=0.5),
                pg.ArrayPE(
                    np.exp(-np.arange(300) / 40.0).astype(np.float32)
                ),
            ),
        ],
        ids=["pure", "affine", "relay"],
    )
    def test_auto_matches_single_device(self, build):
        from pygmu2_tpu.parallel.render import render_time_sharded_auto

        mesh = default_mesh(8, axis="t")
        total = 8 * 2048
        sharded = render_time_sharded_auto(build(), 0, total, mesh, block=1024)
        single = np.asarray(engine.render_scan(build(), 0, total, 1024))
        np.testing.assert_allclose(sharded, single, atol=1e-4)


@needs_mesh
class TestVoiceSharded:
    def test_matches_single_device(self):
        import struct

        from pygmu2_tpu.soundfont import (
            MidiFile,
            SoundFont,
            Synthesizer,
            SynthesizerSettings,
        )
        from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample

        font_bytes = build_sf2(
            [{"data": make_looped_sample(261.63), "rate": 44100, "root_key": 60, "loop": True}]
        )

        def varint(v):
            out = [v & 0x7F]
            v >>= 7
            while v:
                out.append(0x80 | (v & 0x7F))
                v >>= 7
            return bytes(reversed(out))

        res = 480
        tps = res * 120 / 60.0
        events = [(0.0, 0x90, k, 100) for k in (60, 64, 67, 72)]
        events += [(0.5, 0x80, k, 0) for k in (60, 64, 67, 72)]
        body, last = b"", 0
        for t, st, d1, d2 in events:
            tick = int(round(t * tps))
            body += varint(tick - last) + bytes([st, d1, d2])
            last = tick
        body += varint(0) + b"\xff\x2f\x00"
        midi_bytes = (
            b"MThd" + struct.pack(">ihhh", 6, 0, 1, res)
            + b"MTrk" + struct.pack(">i", len(body)) + body
        )

        synth1 = Synthesizer(
            SoundFont(font_bytes),
            SynthesizerSettings(block_size=256, maximum_polyphony=16),
        )
        single = synth1.render_midi_schedule(MidiFile(midi_bytes), 1.0)

        synth2 = Synthesizer(
            SoundFont(font_bytes),
            SynthesizerSettings(block_size=256, maximum_polyphony=16),
        )
        mesh = default_mesh(8, axis="v")
        sharded = render_midi_sharded(synth2, MidiFile(midi_bytes), 1.0, mesh)

        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_offline_sharded_matches(self):
        import struct

        from pygmu2_tpu.parallel.render import render_midi_offline_sharded
        from pygmu2_tpu.soundfont import (
            MidiFile,
            SoundFont,
            Synthesizer,
            SynthesizerSettings,
        )
        from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
        from pygmu2_tpu.soundfont.offline import render_midi_offline

        font_bytes = build_sf2(
            [{"data": make_looped_sample(261.63), "rate": 44100,
              "root_key": 60, "loop": True}]
        )

        def varint(v):
            out = [v & 0x7F]
            v >>= 7
            while v:
                out.append(0x80 | (v & 0x7F))
                v >>= 7
            return bytes(reversed(out))

        res = 480
        body = b""
        for k in (60, 64, 67):
            body += varint(0) + bytes([0x90, k, 100])
        body += varint(res) + bytes([0x80, 60, 0])
        body += varint(0) + b"\xff\x2f\x00"
        midi_bytes = (
            b"MThd" + struct.pack(">ihhh", 6, 0, 1, res)
            + b"MTrk" + struct.pack(">i", len(body)) + body
        )

        mk = lambda: Synthesizer(
            SoundFont(font_bytes),
            SynthesizerSettings(block_size=128, maximum_polyphony=16),
        )
        single = render_midi_offline(mk(), MidiFile(midi_bytes), 0.6)
        mesh = default_mesh(8, axis="v")
        sharded = render_midi_offline_sharded(mk(), MidiFile(midi_bytes), 0.6, mesh)
        np.testing.assert_allclose(sharded, single, atol=1e-5)

"""Jog/shuttle player core, driven headless (VERDICT r3 item 10).

The reference ships its jog/shuttle player as an untested Qt script
(reference: scripts/jogshuttle.py:1-747). Here the transport/scrub/
shuttle logic lives in a toolkit-independent ``JogShuttleCore`` that
these tests drive through the real ``AudioRenderer`` over the same
fake-PortAudio harness as tests/test_audio_renderer.py — plus the
``TimeWarpPE.seek()`` engine hook the scrubbing rides on.
"""

import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core import audio_renderer as ar_mod
from pygmu2_tpu.core import engine
from pygmu2_tpu.utils.wavio import write_wav

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import jogshuttle as js  # noqa: E402

from tests.test_audio_renderer import FakeSD  # noqa: E402  (fake PortAudio)


SR = 44100


@pytest.fixture
def wav_file(tmp_path):
    t = np.arange(SR) / SR  # 1 s, 220 Hz, mono — deterministic content
    data = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    write_wav(str(path), data[:, None], SR)
    return str(path)


@pytest.fixture
def core(monkeypatch, wav_file):
    monkeypatch.setattr(ar_mod, "_sd", FakeSD)
    c = js.JogShuttleCore()
    c.load_file(wav_file)
    yield c
    c.close()


# ---- pure helpers ----------------------------------------------------------


def test_rate_curve_roundtrip_and_endpoints():
    for rate in [-8.0, -1.0, -0.25, 0.0, 0.1, 1.0, 4.0, 8.0]:
        assert js.slider_to_rate(js.rate_to_slider(rate)) == pytest.approx(rate)
    assert js.slider_to_rate(js.SHUTTLE_MAX) == js.SHUTTLE_MAX
    assert js.slider_to_rate(-js.SHUTTLE_MAX) == -js.SHUTTLE_MAX
    # power curve: half deflection is gentler than half rate
    assert abs(js.slider_to_rate(js.SHUTTLE_MAX / 2)) < js.SHUTTLE_MAX / 2


def test_compute_peaks_bins_min_max(wav_file):
    peaks = js.compute_peaks(wav_file, target_width=100)
    assert peaks.shape == (100, 2)
    assert np.all(peaks[:, 0] <= peaks[:, 1])
    # full-scale bins of a 0.5-amp sine (441 samples/bin >> one period)
    assert np.allclose(peaks[:, 1], 0.5, atol=0.02)
    assert np.allclose(peaks[:, 0], -0.5, atol=0.02)


# ---- TimeWarpPE.seek (the engine hook) -------------------------------------


def test_timewarp_seek_jumps_tape_between_blocks():
    ramp = pg.IdentityPE()  # source value == source index
    tw = pg.TimeWarpPE(pg.CropPE(ramp, 0, 10_000), rate=pg.ControlPE(1.0),
                       max_rate=8.0)
    prog = engine.get_program(tw, 64)
    b0 = np.asarray(prog.run(0))
    assert b0[0, 0] == pytest.approx(0.0) and b0[-1, 0] == pytest.approx(63.0)
    tw.seek(5000.0)
    assert tw.position == pytest.approx(5000.0)
    b1 = np.asarray(prog.run(64))  # contiguous block: no gap reset
    assert b1[0, 0] == pytest.approx(5000.0, abs=1e-3)
    assert tw.position == pytest.approx(5064.0)


def test_seek_during_inflight_block_is_not_clobbered():
    """Live-control-wins: a seek landing while a block render is in
    flight must survive the engine's post-render state scatter
    (engine.Program.run version guard) — otherwise a single scrub click
    from a UI thread can be silently swallowed."""
    tw = pg.TimeWarpPE(pg.CropPE(pg.IdentityPE(), 0, 10_000),
                       rate=pg.ControlPE(1.0), max_rate=8.0)
    prog = engine.get_program(tw, 64)
    prog.run(0)
    orig = prog._fn_step

    def step_then_seek(start, states):  # seek lands "mid-render"
        out = orig(start, states)
        tw.seek(5000.0)
        return out

    prog._fn_step = step_then_seek
    prog.run(64)
    prog._fn_step = orig
    assert tw.position == pytest.approx(5000.0), "seek was clobbered"
    b = np.asarray(prog.run(128))
    assert b[0, 0] == pytest.approx(5000.0, abs=1e-3)


def test_timewarp_seek_before_first_render_sets_initial_position():
    ramp = pg.CropPE(pg.IdentityPE(), 0, 10_000)
    tw = pg.TimeWarpPE(ramp, rate=pg.ControlPE(1.0), max_rate=8.0)
    tw.seek(1234.0)
    out = np.asarray(engine.get_program(tw, 32).run(0))
    assert out[0, 0] == pytest.approx(1234.0, abs=1e-3)


# ---- transport through the real AudioRenderer ------------------------------


def _wait_for(cond, timeout=30.0):  # generous: compiles under CI load
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.01)
    return False


def test_play_advances_and_pause_holds(core):
    assert core.total_frames == SR and not core.playing
    core.play()
    assert core.playing and core.rate == 1.0
    assert _wait_for(lambda: core.position > 2048), "tape never advanced"
    core.pause()
    time.sleep(0.05)  # in-flight feeder blocks drain
    held = core.position
    time.sleep(0.15)
    # rate 0: the continuous stream keeps running but the tape holds
    assert core.position == pytest.approx(held, abs=1.0)
    assert not core.playing


def test_shuttle_curve_drives_rate_and_snap(core):
    val = core.shuttle_changed(4.0)
    assert val == 4.0 and core.rate == pytest.approx(js.slider_to_rate(4.0))
    val = core.shuttle_changed(0.2)  # inside the snap-to-zero band
    assert val == 0.0 and core.rate == 0.0
    val = core.shuttle_changed(-8.0)
    assert core.rate == pytest.approx(-8.0)


def test_spring_back_converges_to_rest(core):
    core.shuttle_rest = 1.0
    core.shuttle_value = js.SHUTTLE_MAX
    for _ in range(100):
        if core.spring_tick():
            break
    assert core.shuttle_value == pytest.approx(js.rate_to_slider(1.0))
    core.shuttle_released()
    assert core.rate == 1.0


def test_scrub_seeks_and_restores_stopped_state(core):
    assert not core.playing
    core.scrub_start(0.5)
    assert core.playing  # audible scrub from stopped
    assert core.position == pytest.approx(0.5 * SR, abs=4096)
    core.scrub_move(0.25)
    core.scrub_end()
    assert not core.playing  # back to stopped after the scrub


def test_poll_auto_stops_at_end(core):
    core.play()
    core.seek(core.total_frames - 512)
    assert _wait_for(
        lambda: core.poll()["playing"] is False
    ), "never auto-stopped at the end"
    st = core.poll()
    assert st["pos"] <= core.total_frames and st["rate"] == 0.0


def test_stop_rewinds(core):
    core.play()
    _wait_for(lambda: core.position > 1024)
    core.stop()
    time.sleep(0.1)  # in-flight blocks at rate 0 don't move the tape
    assert core.position == pytest.approx(0.0, abs=1.0)
    assert core.poll()["time"] == "00:00.000"


def test_reverse_rate_plays_backwards(core):
    core.seek(0.5 * SR)
    core.set_rate(-2.0)
    start = 0.5 * SR
    assert _wait_for(lambda: core.position < start - 2048), (
        "tape never moved backwards"
    )
    core.pause()


def test_format_time():
    c = js.JogShuttleCore()
    c.sample_rate = SR
    assert c.format_time(0) == "00:00.000"
    assert c.format_time(SR * 61.5) == "01:01.500"

"""Voice-allocation priority cache: exactness of the memoized path.

``Synthesizer._host_priorities`` (reference: meltysynth
synth/voice_collection.py priority-based stealing) is memoized per
block, with ``_write_slot`` patching only the written row via the
scalar ``_priority_of``. A chord strike allocates up to P voices inside
one block, so without the cache the full vector recomputes per steal —
that pass dominated ``build_schedule`` on long scores (224 ms of a 60 s
/ 1920-event piece; ~4 ms after). These tests pin that the cache is
*exact*, not approximate:

- the scalar replica is bitwise-equal to the vector computation over
  randomized envelope/gain/release states;
- a steal-heavy ``build_schedule`` produces identical snapshots with
  the cache defeated (every ``_write_slot`` invalidating instead of
  patching).
"""

import numpy as np
import pytest

from pygmu2_tpu.soundfont import (
    MidiFile,
    SoundFont,
    Synthesizer,
    SynthesizerSettings,
)
from pygmu2_tpu.soundfont.build import build_sf2, make_looped_sample
from pygmu2_tpu.soundfont.synthesizer import _NO_RELEASE
from tests.test_soundfont import build_midi


def _make_synth(poly=16, block=64):
    font = build_sf2(
        [{"data": make_looped_sample(261.63, harmonics=3), "rate": 44100,
          "root_key": 60, "loop": True, "attack_tc": -9000,
          "release_tc": -5000}]
    )
    return Synthesizer(
        SoundFont(font),
        SynthesizerSettings(block_size=block, maximum_polyphony=poly),
    )


def _randomize_state(synth, rng):
    """Random but plausible voice-field state covering every stage."""
    p = synth._par
    P = p["note_gain"].shape[0]
    synth._host_active[:] = rng.random(P) < 0.8
    synth._host_voice_blocks[:] = rng.integers(0, 400, P)
    p["note_gain"][:] = np.where(
        rng.random(P) < 0.15, 1e-4, rng.random(P).astype(np.float32)
    )
    # envelope knots in seconds: 0 <= att <= hold <= dec
    att = rng.random(P).astype(np.float32) * 0.05
    hold = att + rng.random(P).astype(np.float32) * 0.05
    dec = hold + rng.random(P).astype(np.float32) * 0.3
    p["v_att_start"][:] = att
    p["v_hold_start"][:] = hold
    p["v_dec_start"][:] = dec
    p["v_att_slope"][:] = (rng.random(P) * 50).astype(np.float32)
    p["v_dec_slope"][:] = (-rng.random(P) * 30 - 0.01).astype(np.float32)
    p["v_sustain"][:] = rng.random(P).astype(np.float32)
    rel = rng.integers(0, 44100 // 2, P).astype(np.int32)
    p["release_req"][:] = np.where(rng.random(P) < 0.5, _NO_RELEASE, rel)


class TestScalarVsVector:
    @pytest.mark.parametrize("seed", range(8))
    def test_bitwise_equal(self, seed):
        synth = _make_synth(poly=32)
        rng = np.random.default_rng(seed)
        _randomize_state(synth, rng)
        synth._invalidate_pri()
        vec = synth._host_priorities().copy()
        scalar = np.array(
            [synth._priority_of(i) for i in range(32)], dtype=vec.dtype
        )
        np.testing.assert_array_equal(scalar, vec)

    def test_stage_boundaries(self):
        """t exactly at each envelope knot picks the same branch."""
        synth = _make_synth(poly=8, block=441)  # block/sr = 0.01 s exactly
        p = synth._par
        synth._host_active[:] = True
        p["note_gain"][:] = 0.5
        p["v_att_start"][:] = 0.01
        p["v_hold_start"][:] = 0.02
        p["v_dec_start"][:] = 0.03
        p["v_att_slope"][:] = 10.0
        p["v_dec_slope"][:] = -5.0
        p["v_sustain"][:] = 0.25
        p["release_req"][:] = _NO_RELEASE
        synth._host_voice_blocks[:] = np.arange(8)  # t = 0.00 .. 0.07 s
        synth._invalidate_pri()
        vec = synth._host_priorities().copy()
        scalar = np.array(
            [synth._priority_of(i) for i in range(8)], dtype=vec.dtype
        )
        np.testing.assert_array_equal(scalar, vec)
        # stage bonuses: delay(4), attack(3), sustain-hold(2), decay(1..)
        assert vec[0] == 4.0
        assert vec[1] == pytest.approx(3.0, abs=1e-6)


class TestCacheCoherence:
    def test_write_slot_patch_matches_recompute(self):
        synth = _make_synth(poly=16)
        midi = MidiFile(build_midi([(0.0, 0x90, 60 + k, 100) for k in range(12)]))
        synth.build_schedule(midi, 0.2)
        synth.reset()
        # storm of note-ons to fill and steal
        for k in range(40):
            synth.note_on(0, 40 + (k % 50), 100)
            if synth._pri_cache is not None:
                cached = synth._pri_cache.copy()
                synth._invalidate_pri()
                np.testing.assert_array_equal(cached, synth._host_priorities())

    def test_schedule_identical_with_cache_defeated(self, monkeypatch):
        """Steal-heavy score: build_schedule with the cache patched out
        (every _write_slot invalidates) is snapshot-identical."""
        # 3 strikes of 16 notes onto 8 slots -> 8 steals per strike,
        # plus staggered note-offs so release/decay stages participate.
        # (Two fresh synths: `epoch` deliberately survives reset().)
        events = []
        for rep in range(3):
            t0 = rep * 0.3
            for k in range(16):
                events.append((t0 + 0.001 * k, 0x90, 40 + k + rep, 90 + (k % 20)))
            for k in range(0, 16, 2):
                events.append((t0 + 0.15, 0x80, 40 + k + rep, 0))
        midi = MidiFile(build_midi(events))

        ref_par, ref_ch, ref_idx, _nb = _make_synth(poly=8, block=64).build_schedule(midi, 1.0)

        orig_write = Synthesizer._write_slot

        def defeating_write(self, slot, vp):
            orig_write(self, slot, vp)
            self._invalidate_pri()

        monkeypatch.setattr(Synthesizer, "_write_slot", defeating_write)
        got_par, got_ch, got_idx, _nb2 = _make_synth(poly=8, block=64).build_schedule(midi, 1.0)

        np.testing.assert_array_equal(ref_idx, got_idx)
        for k in ref_par:
            np.testing.assert_array_equal(ref_par[k], got_par[k], err_msg=k)
        for k in ref_ch:
            np.testing.assert_array_equal(ref_ch[k], got_ch[k], err_msg=k)

    def test_indexed_note_off_matches_vector_scan(self, monkeypatch):
        """The (channel, key)->slots index is a pure lookup structure:
        note_off through it must mutate exactly what the original
        4-mask vector scan mutated, including voices restruck into the
        same / different slots and double note-offs."""

        def vector_note_off(self, channel, key):
            mask = (
                self._host_active
                & (self._par["channel"] == channel)
                & (self._par["key"] == key)
                & (self._par["release_req"] == _NO_RELEASE)
            )
            vt = self._host_voice_blocks * self._block_size
            self._par["release_req"][mask] = np.maximum(
                vt[mask], self._minimum_voice_duration
            )
            self._invalidate_pri()

        rng = np.random.default_rng(3)
        events = []
        t = 0.0
        for _ in range(200):
            t += float(rng.random()) * 0.02
            ch = int(rng.integers(0, 4))
            key = int(rng.integers(50, 58))  # few keys -> heavy reuse
            if rng.random() < 0.45:
                events.append((t, 0x80 | ch, key, 0))
            else:
                events.append((t, 0x90 | ch, key, int(rng.integers(30, 120))))
        midi = MidiFile(build_midi(events))

        ref = _make_synth(poly=8, block=64)
        monkeypatch.setattr(Synthesizer, "note_off", vector_note_off)
        ref_par, _rc, ref_idx, _ = ref.build_schedule(midi, t + 0.3)
        monkeypatch.undo()
        got = _make_synth(poly=8, block=64)
        got_par, _gc, got_idx, _ = got.build_schedule(midi, t + 0.3)

        np.testing.assert_array_equal(ref_idx, got_idx)
        for k in ref_par:
            np.testing.assert_array_equal(ref_par[k], got_par[k], err_msg=k)

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

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


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

    def test_batched_note_on_matches_sequential(self, monkeypatch):
        """Randomized chordal scores: build_schedule with the batched
        note-on/off paths (default) is bitwise-identical to the
        sequential loop — planes, snapshot indices, memoized priorities,
        and the (channel, key) index. Covers free-slot fills, steals
        from released/decayed voices, duplicate keys inside a burst,
        multi-channel bursts, and interleaved controller events."""
        rng = np.random.default_rng(11)
        events = []
        t = 0.0
        for burst in range(6):
            t += 0.25
            n = int(rng.integers(8, 28))
            for j in range(n):
                ch = int(rng.integers(0, 3))
                key = int(rng.integers(45, 70))  # duplicates likely
                events.append((t, 0x90 | ch, key, int(rng.integers(40, 127))))
            if burst % 2:
                events.append((t, 0xB0, 0x07, int(rng.integers(40, 127))))
            for j in range(n // 2):
                events.append(
                    (t + 0.12, 0x80 | int(rng.integers(0, 3)),
                     int(rng.integers(45, 70)), 0)
                )
        midi = MidiFile(build_midi(events))

        def run(defeat: bool):
            synth = _make_synth(poly=16, block=64)
            if defeat:
                monkeypatch.setattr(
                    Synthesizer, "note_on_batch",
                    lambda self, notes: [
                        self.note_on(c, k, v) for c, k, v in notes
                    ],
                )
                monkeypatch.setattr(
                    Synthesizer, "note_off_batch",
                    lambda self, offs: [
                        self.note_off(c, k) for c, k in offs
                    ],
                )
            par, ch, idx, _ = synth.build_schedule(midi, t + 0.3)
            pri = synth._host_priorities().copy()
            cki = {k: v[:] for k, v in synth._ck_index.items() if v}
            if defeat:
                monkeypatch.undo()
            return par, ch, idx, pri, cki

        g_par, g_ch, g_idx, g_pri, g_cki = run(False)
        r_par, r_ch, r_idx, r_pri, r_cki = run(True)
        np.testing.assert_array_equal(r_idx, g_idx)
        for k in r_par:
            np.testing.assert_array_equal(r_par[k], g_par[k], err_msg=k)
        for k in r_ch:
            np.testing.assert_array_equal(r_ch[k], g_ch[k], err_msg=k)
        np.testing.assert_array_equal(r_pri, g_pri)
        assert r_cki == g_cki

    def test_batched_steal_guard_falls_back(self, monkeypatch):
        """A burst of 2P note-ons in one block: the second P voices must
        steal slots written moments earlier in the same burst (attack
        priority >= any candidate), so the batch guard rejects and the
        sequential path runs — output identical to pure sequential."""
        events = [
            (0.0, 0x90, 30 + k, 100) for k in range(16)
        ]  # poly 8 -> 8 free fills + 8 steals of in-burst writes
        midi = MidiFile(build_midi(events))

        seen = {"fallback": False}
        orig_alloc = Synthesizer._allocate_slot

        def spy_alloc(self, params):
            seen["fallback"] = True
            return orig_alloc(self, params)

        monkeypatch.setattr(Synthesizer, "_allocate_slot", spy_alloc)
        g_par, _gc, g_idx, _ = _make_synth(poly=8, block=64).build_schedule(
            midi, 0.3
        )
        assert seen["fallback"], "guard should reject in-burst steals"
        monkeypatch.setattr(
            Synthesizer, "note_on_batch",
            lambda self, notes: [self.note_on(c, k, v) for c, k, v in notes],
        )
        r_par, _rc, r_idx, _ = _make_synth(poly=8, block=64).build_schedule(
            midi, 0.3
        )
        np.testing.assert_array_equal(r_idx, g_idx)
        for k in r_par:
            np.testing.assert_array_equal(r_par[k], g_par[k], err_msg=k)

    def test_note_off_batch_duplicates_and_misses(self):
        """Duplicate (channel, key) pairs and unknown keys in one
        batch: same result as sequential note_offs (idempotent
        release marks, misses ignored)."""
        synth = _make_synth(poly=8, block=64)
        for k in range(4):
            synth.note_on(0, 60 + k, 100)
        synth._host_voice_blocks[:] = 7
        ref = _make_synth(poly=8, block=64)
        for k in range(4):
            ref.note_on(0, 60 + k, 100)
        ref._host_voice_blocks[:] = 7
        synth.note_off_batch(
            [(0, 60), (0, 60), (0, 99), (3, 61), (0, 62)]
        )
        for c, k in [(0, 60), (0, 60), (0, 99), (3, 61), (0, 62)]:
            ref.note_off(c, k)
        np.testing.assert_array_equal(
            synth._par["release_req"], ref._par["release_req"]
        )
        np.testing.assert_array_equal(
            synth._host_priorities(), ref._host_priorities()
        )

    def test_batch_pri0_matches_scalar_patch(self):
        """After a batched chord strike, the memoized priority vector
        equals a from-scratch recompute (the bundled t=0 priorities
        must be bitwise what _priority_of would have patched)."""
        synth = _make_synth(poly=16, block=64)
        synth._host_priorities()  # materialize the cache
        synth.note_on_batch([(0, 50 + k, 30 + 6 * k) for k in range(12)])
        assert synth._pri_cache is not None
        cached = synth._pri_cache.copy()
        synth._invalidate_pri()
        np.testing.assert_array_equal(cached, synth._host_priorities())

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

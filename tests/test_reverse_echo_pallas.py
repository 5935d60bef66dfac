"""Reverse-echo Mosaic kernel vs the lax.scan path (interpret mode)."""

import numpy as np

import jax.numpy as jnp

import pygmu2_tpu as pg
from pygmu2_tpu.ops.reverse_echo_pallas import reverse_echo_scan_pallas

import pytest

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)

SR = 8000  # small rate keeps the interpret-mode run affordable


def _run_kernel(x, blk, ratio, fb, alt, cap, chunks=(None,)):
    """Drive the kernel exactly as ReversePitchEchoPE._trace does,
    optionally split into chunks with full state carry."""
    T, C = x.shape
    plen = max(2, int(SR / 60))
    misc = np.zeros(9, np.float32)
    init_block = float(min(max(blk * SR, 64), cap - 1))
    misc[0] = 1  # cur_is_a
    misc[5] = init_block  # smoothed
    misc[6] = int(init_block)  # cur_block
    misc[8] = 1  # reverse
    ba = jnp.zeros((cap, C), jnp.float32)
    bb = jnp.zeros((cap, C), jnp.float32)
    pb = jnp.zeros((plen, C), jnp.float32)
    misc = jnp.asarray(misc)
    outs = []
    bounds = [0] + [c for c in chunks if c] + [T]
    for s, e in zip(bounds, bounds[1:]):
        n = e - s
        wet, ba, bb, pb, misc = reverse_echo_scan_pallas(
            jnp.asarray(x[s:e]),
            jnp.full((n,), blk, jnp.float32),
            jnp.full((n,), ratio, jnp.float32),
            jnp.full((n,), fb, jnp.float32),
            jnp.full((n,), alt, jnp.float32),
            ba, bb, pb, misc,
            sr=float(SR), plen=plen, cap=cap, min_block=64,
            max_block=cap - 1, smooth_alpha=1 / 2400, chunk=128,
            interpret=True,
        )
        outs.append(np.asarray(wet))
    return np.concatenate(outs)


def _run_scan_pe(x, blk, ratio, fb, alt, max_delay_s):
    pg.set_sample_rate(SR)
    pe = pg.ReversePitchEchoPE(
        pg.ArrayPE(x), block_seconds=blk, pitch_ratio=ratio, feedback=fb,
        alternate_direction=alt, max_delay_seconds=max_delay_s,
    )
    return np.asarray(pg.render_to_array(pg.CropPE(pe, 0, len(x))))


def test_kernel_matches_scan_path():
    rng = np.random.default_rng(3)
    T = 700
    x = (rng.standard_normal((T, 1)) * 0.3).astype(np.float32)
    blk, ratio, fb, alt = 0.02, 1.0, 0.6, 0.0  # 160-sample blocks
    cap = int(0.05 * SR)
    ref = _run_scan_pe(x, blk, ratio, fb, alt, 0.05)
    got = _run_kernel(x, blk, ratio, fb, alt, cap)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert np.abs(ref).max() > 1e-3  # echo actually fired


def test_kernel_pitch_shift_and_alternate():
    rng = np.random.default_rng(4)
    T = 700
    x = (rng.standard_normal((T, 1)) * 0.3).astype(np.float32)
    blk, ratio, fb, alt = 0.02, 1.5, 0.5, 1.0
    cap = int(0.05 * SR)
    ref = _run_scan_pe(x, blk, ratio, fb, alt, 0.05)
    got = _run_kernel(x, blk, ratio, fb, alt, cap)
    np.testing.assert_allclose(got, ref, atol=2e-5)

    assert np.abs(ref).max() > 1e-3


def test_kernel_chunked_state_carry():
    rng = np.random.default_rng(5)
    T = 700
    x = (rng.standard_normal((T, 2)) * 0.3).astype(np.float32)  # stereo
    blk, ratio, fb, alt = 0.02, 1.0, 0.7, 0.0
    cap = int(0.05 * SR)
    one = _run_kernel(x, blk, ratio, fb, alt, cap)
    two = _run_kernel(x, blk, ratio, fb, alt, cap, chunks=(333,))
    np.testing.assert_allclose(two, one, atol=1e-6)


def test_kernel_modulated_params_match_scan():
    """feedback and pitch ratio as per-sample vectors (PE-modulated)."""
    rng = np.random.default_rng(6)
    T = 700
    x = (rng.standard_normal((T, 1)) * 0.3).astype(np.float32)
    cap = int(0.05 * SR)
    plen = max(2, int(SR / 60))
    t = np.arange(T, dtype=np.float32)
    ratio = (1.0 + 0.5 * np.sin(t / 97.0)).astype(np.float32)
    fb = (0.4 + 0.3 * np.sin(t / 131.0)).astype(np.float32)
    blk = np.full(T, 0.02, np.float32)
    alt = np.zeros(T, np.float32)

    import jax

    misc = np.zeros(9, np.float32)
    init_block = float(min(max(0.02 * SR, 64), cap - 1))
    misc[0], misc[5], misc[6], misc[8] = 1, init_block, int(init_block), 1

    def run_scan():
        # drive the PE's lax.scan path directly on CPU by rendering a
        # graph with modulated params
        pg.set_sample_rate(SR)
        pe = pg.ReversePitchEchoPE(
            pg.ArrayPE(x),
            block_seconds=0.02,
            pitch_ratio=pg.ArrayPE(ratio[:, None]),
            feedback=pg.ArrayPE(fb[:, None]),
            max_delay_seconds=0.05,
        )
        return np.asarray(pg.render_to_array(pg.CropPE(pe, 0, T)))

    ref = run_scan()
    # kernel path: same pre-processed control vectors as _trace builds
    fb_k = np.clip(np.nan_to_num(fb), -0.995, 0.995)
    ratio_k = np.maximum(ratio, 0.001)
    wet, *_ = reverse_echo_scan_pallas(
        jnp.asarray(x), jnp.asarray(blk), jnp.asarray(ratio_k),
        jnp.asarray(fb_k), jnp.asarray(alt),
        jnp.zeros((cap, 1), jnp.float32), jnp.zeros((cap, 1), jnp.float32),
        jnp.zeros((plen, 1), jnp.float32), jnp.asarray(misc),
        sr=float(SR), plen=plen, cap=cap, min_block=64,
        max_block=cap - 1, smooth_alpha=1 / 2400, chunk=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(wet), ref, atol=2e-5)
    assert np.abs(ref).max() > 1e-3

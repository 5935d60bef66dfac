"""Reverse-echo Mosaic kernel vs the lax.scan path (interpret mode)."""

import numpy as np

import jax.numpy as jnp

import pygmu2_tpu as pg
from pygmu2_tpu.ops.reverse_echo_pallas import reverse_echo_scan_pallas

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

"""ConstantPE / TransformPE / WindowPE / WavetablePE behavior breadth.

Mirrors reference tests/test_constant_pe.py:17-125,
test_transform_pe.py:25-300, test_window_pe.py:25-380,
test_wavetable_pe.py:26-440 in repo idiom.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pygmu2_tpu import (
    ArrayPE,
    ConstantPE,
    CropPE,
    IdentityPE,
    SinePE,
    TransformPE,
    WavetablePE,
    WindowPE,
)
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.snippet import Snippet
from pygmu2_tpu.models.modes import (
    InterpolationMode,
    OutOfBoundsMode,
    WindowMode,
)

pytestmark = pytest.mark.slow  # heavy sweep (fast set = -m 'not slow'; contract/parity files stay fast)


class TestConstantPE:
    def test_create_stores_value(self):
        assert ConstantPE(0.75).value == 0.75

    def test_create_with_channels(self):
        assert ConstantPE(0.5, channels=4).channel_count() == 4

    def test_infinite_extent(self):
        ext = ConstantPE(1.0).extent()
        assert ext.start is None and ext.end is None

    def test_is_pure(self):
        assert ConstantPE(1.0).is_pure() is True

    def test_no_inputs(self):
        assert ConstantPE(1.0).inputs() == []

    def test_repr(self):
        assert repr(ConstantPE(0.3)) == "ConstantPE(value=0.3, channels=1)"

    def test_render_returns_snippet(self):
        s = ConstantPE(0.5).render(0, 32)
        assert isinstance(s, Snippet)
        assert s.start == 0 and s.duration == 32

    def test_render_correct_value(self):
        np.testing.assert_allclose(
            np.asarray(ConstantPE(0.7).render(0, 16).data), 0.7, atol=1e-7
        )

    def test_render_stereo(self):
        d = np.asarray(ConstantPE(0.2, channels=2).render(0, 8).data)
        assert d.shape == (8, 2)
        np.testing.assert_allclose(d, 0.2, atol=1e-7)

    def test_render_negative_value(self):
        np.testing.assert_allclose(
            np.asarray(ConstantPE(-0.8).render(0, 8).data), -0.8, atol=1e-7
        )

    def test_render_zero(self):
        np.testing.assert_array_equal(
            np.asarray(ConstantPE(0.0).render(0, 8).data), 0.0
        )

    def test_render_negative_start(self):
        s = ConstantPE(0.4).render(-100, 8)
        assert s.start == -100
        np.testing.assert_allclose(np.asarray(s.data), 0.4, atol=1e-7)


    def test_render_large_value(self):
        np.testing.assert_allclose(
            np.asarray(ConstantPE(1e6).render(0, 4).data), 1e6, rtol=1e-6
        )


class TestTransformPEBasics:
    def test_create_with_numpy_style_func(self):
        pe = TransformPE(ConstantPE(-1.0), jnp.abs)
        assert pe.func is jnp.abs

    def test_create_with_lambda(self):
        f = lambda x: x * 2  # noqa: E731
        assert TransformPE(ConstantPE(1.0), f).func is f

    def test_custom_name_in_repr(self):
        pe = TransformPE(ConstantPE(1.0), lambda x: x, name="doubler")
        assert pe.name == "doubler"
        assert "func=doubler" in repr(pe)

    def test_default_name_from_func(self):
        def soft_clip(x):
            return jnp.tanh(x)

        assert "soft_clip" in repr(TransformPE(ConstantPE(1.0), soft_clip))

    def test_inputs(self):
        src = ConstantPE(1.0)
        assert TransformPE(src, jnp.abs).inputs() == [src]

    def test_is_pure(self):
        assert TransformPE(ConstantPE(1.0), jnp.abs).is_pure() is True

    def test_channel_count_passthrough(self):
        src = ConstantPE(1.0, channels=3)
        assert TransformPE(src, jnp.abs).channel_count() == 3

    def test_extent_from_source(self):
        src = ArrayPE(np.zeros(50, np.float32))
        assert TransformPE(src, jnp.abs).extent() == Extent(0, 50)


class TestTransformPEFunctions:
    def test_abs(self):
        src = ArrayPE(np.array([-1, 2, -3, 4], np.float32))
        d = np.asarray(TransformPE(src, jnp.abs).render(0, 4).data)[:, 0]
        np.testing.assert_array_equal(d, [1, 2, 3, 4])

    def test_square(self):
        src = ArrayPE(np.array([1, 2, 3], np.float32))
        d = np.asarray(TransformPE(src, jnp.square).render(0, 3).data)[:, 0]
        np.testing.assert_array_equal(d, [1, 4, 9])

    def test_sqrt(self):
        src = ArrayPE(np.array([1, 4, 9], np.float32))
        d = np.asarray(TransformPE(src, jnp.sqrt).render(0, 3).data)[:, 0]
        np.testing.assert_allclose(d, [1, 2, 3], atol=1e-6)

    def test_tanh_soft_clip_bounded(self):
        src = ArrayPE(np.array([-10, -1, 0, 1, 10], np.float32))
        d = np.asarray(TransformPE(src, jnp.tanh).render(0, 5).data)[:, 0]
        assert np.all(np.abs(d) <= 1.0)  # f32 tanh(10) rounds to 1.0
        np.testing.assert_allclose(d, np.tanh([-10, -1, 0, 1, 10]), atol=1e-6)

    def test_lambda_scale_offset(self):
        src = ArrayPE(np.arange(4, dtype=np.float32))
        d = np.asarray(
            TransformPE(src, lambda x: 2 * x + 1).render(0, 4).data
        )[:, 0]
        np.testing.assert_array_equal(d, [1, 3, 5, 7])

    def test_pitch_to_freq_transform(self):
        # MIDI pitch -> Hz on a control signal
        src = ConstantPE(69.0)
        pe = TransformPE(src, lambda p: 440.0 * 2 ** ((p - 69.0) / 12.0))
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 4).data), 440.0, rtol=1e-6
        )

    def test_varying_pitch_to_freq(self):
        src = ArrayPE(np.array([57.0, 69.0, 81.0], np.float32))
        pe = TransformPE(src, lambda p: 440.0 * 2 ** ((p - 69.0) / 12.0))
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 3).data)[:, 0], [220, 440, 880], rtol=1e-5
        )

    def test_stereo_elementwise(self):
        data = np.column_stack([[1, -2], [-3, 4]]).astype(np.float32)
        d = np.asarray(TransformPE(ArrayPE(data), jnp.abs).render(0, 2).data)
        np.testing.assert_array_equal(d, np.abs(data))

    def test_chained_transforms(self):
        src = ArrayPE(np.array([-2, -1, 0], np.float32))
        pe = TransformPE(TransformPE(src, jnp.abs), jnp.square)
        d = np.asarray(pe.render(0, 3).data)[:, 0]
        np.testing.assert_array_equal(d, [4, 1, 0])

    def test_shape_change_rejected(self):
        pe = TransformPE(ConstantPE(1.0), lambda x: x[:1])
        with pytest.raises(ValueError, match="changed shape"):
            pe.render(0, 8)


class TestWindowPEBasics:
    def test_create_default(self):
        pe = WindowPE(ConstantPE(1.0))
        assert pe.window == 0.05
        assert pe.mode == WindowMode.MAX
        assert pe.rectify is True

    def test_create_with_params(self):
        pe = WindowPE(
            ConstantPE(1.0), window=0.2, mode=WindowMode.RMS, rectify=False
        )
        assert pe.window == 0.2
        assert pe.mode == WindowMode.RMS
        assert pe.rectify is False

    def test_negative_window_clamped(self):
        assert WindowPE(ConstantPE(1.0), window=-1.0).window == 0.0

    def test_inputs(self):
        src = ConstantPE(1.0)
        assert WindowPE(src).inputs() == [src]

    def test_is_pure(self):
        assert WindowPE(ConstantPE(1.0)).is_pure() is True

    def test_channel_count_passthrough(self):
        assert WindowPE(ConstantPE(1.0, channels=2)).channel_count() == 2

    def test_extent_from_source(self):
        src = ArrayPE(np.zeros(64, np.float32))
        assert WindowPE(src).extent() == Extent(0, 64)

    def test_repr(self):
        r = repr(WindowPE(ConstantPE(1.0), window=0.1, mode=WindowMode.MEAN))
        assert "WindowPE" in r and "0.1" in r and "mean" in r


class TestWindowPEModes:
    def test_max_of_constant(self):
        d = np.asarray(
            WindowPE(ConstantPE(0.5), window=0.01).render(100, 64).data
        )
        np.testing.assert_allclose(d, 0.5, atol=1e-6)

    def test_max_captures_peak(self):
        sig = np.zeros(500, np.float32)
        sig[250] = 1.0
        pe = WindowPE(ArrayPE(sig), window=0.002, mode=WindowMode.MAX)
        d = np.asarray(pe.render(0, 500).data)[:, 0]
        half = max(1, int(0.002 * 44100 / 2))
        assert np.all(d[250 - half : 250 + half + 1] == 1.0)
        assert d[250 - half - 5] == 0.0

    def test_mean_of_constant(self):
        d = np.asarray(
            WindowPE(ConstantPE(0.25), window=0.01, mode=WindowMode.MEAN)
            .render(100, 64).data
        )
        np.testing.assert_allclose(d, 0.25, atol=1e-6)

    def test_mean_smoothes_impulse(self):
        sig = np.zeros(500, np.float32)
        sig[250] = 1.0
        pe = WindowPE(ArrayPE(sig), window=0.002, mode=WindowMode.MEAN)
        d = np.asarray(pe.render(0, 500).data)[:, 0]
        half = max(1, int(0.002 * 44100 / 2))
        wsize = 2 * half + 1
        np.testing.assert_allclose(d[250], 1.0 / wsize, atol=1e-6)
        assert d.max() < 1.0

    def test_rms_of_constant(self):
        d = np.asarray(
            WindowPE(ConstantPE(0.5), window=0.01, mode=WindowMode.RMS)
            .render(100, 64).data
        )
        np.testing.assert_allclose(d, 0.5, atol=1e-6)

    def test_rms_of_sine_approaches_rt2(self):
        pe = WindowPE(
            SinePE(frequency=441.0, amplitude=1.0), window=0.05,
            mode=WindowMode.RMS,
        )
        d = np.asarray(pe.render(5000, 256).data)[:, 0]
        np.testing.assert_allclose(d, 1 / np.sqrt(2), atol=0.02)

    def test_min_of_constant(self):
        d = np.asarray(
            WindowPE(ConstantPE(0.5), window=0.01, mode=WindowMode.MIN)
            .render(100, 64).data
        )
        np.testing.assert_allclose(d, 0.5, atol=1e-6)

    def test_min_finds_zero_crossing(self):
        pe = WindowPE(
            SinePE(frequency=441.0), window=0.01, mode=WindowMode.MIN
        )
        d = np.asarray(pe.render(5000, 128).data)[:, 0]
        # rectified sine crosses zero every half period; window covers one
        np.testing.assert_allclose(d, 0.0, atol=0.01)

    def test_rectify_true_sees_negative_peaks(self):
        sig = np.zeros(300, np.float32)
        sig[150] = -1.0
        d = np.asarray(
            WindowPE(ArrayPE(sig), window=0.002, rectify=True)
            .render(0, 300).data
        )[:, 0]
        assert d[150] == 1.0

    def test_rectify_false_ignores_negative_peaks(self):
        sig = np.zeros(300, np.float32)
        sig[150] = -1.0
        d = np.asarray(
            WindowPE(ArrayPE(sig), window=0.002, rectify=False)
            .render(0, 300).data
        )[:, 0]
        assert d[150] <= 0.0

    def test_stereo_independent_channels(self):
        left = np.zeros(200, np.float32)
        right = np.zeros(200, np.float32)
        left[50] = 1.0
        right[150] = 1.0
        pe = WindowPE(
            ArrayPE(np.column_stack([left, right])), window=0.001
        )
        d = np.asarray(pe.render(0, 200).data)
        assert d[50, 0] == 1.0 and d[50, 1] == 0.0
        assert d[150, 1] == 1.0 and d[150, 0] == 0.0

    def test_render_window_placement_independent(self):
        # same timeline rendered in two windows == one window (pure PE)
        pe = WindowPE(SinePE(frequency=440.0), window=0.01)
        whole = np.asarray(pe.render(0, 200).data)
        a = np.asarray(pe.render(0, 100).data)
        b = np.asarray(pe.render(100, 100).data)
        np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-6)


def make_table(n=8):
    """Known wavetable: value == index."""
    return ArrayPE(np.arange(n, dtype=np.float32))


class TestWavetablePEBasics:
    def test_create(self):
        wt, idx = make_table(), ConstantPE(0.0)
        pe = WavetablePE(wt, idx)
        assert pe.wavetable is wt and pe.indexer is idx
        assert pe.interpolation == InterpolationMode.LINEAR
        assert pe.out_of_bounds == OutOfBoundsMode.ZERO

    def test_create_with_options(self):
        pe = WavetablePE(
            make_table(), ConstantPE(0.0),
            interpolation=InterpolationMode.CUBIC,
            out_of_bounds=OutOfBoundsMode.WRAP,
        )
        assert pe.interpolation == InterpolationMode.CUBIC
        assert pe.out_of_bounds == OutOfBoundsMode.WRAP

    def test_inputs(self):
        wt, idx = make_table(), ConstantPE(0.0)
        assert WavetablePE(wt, idx).inputs() == [wt, idx]

    def test_is_pure(self):
        assert WavetablePE(make_table(), ConstantPE(0.0)).is_pure() is True

    def test_channel_count_from_wavetable(self):
        wt = ArrayPE(np.zeros((8, 2), np.float32))
        assert WavetablePE(wt, ConstantPE(0.0)).channel_count() == 2

    def test_extent_from_indexer(self):
        idx = ArrayPE(np.zeros(33, np.float32))
        assert WavetablePE(make_table(), idx).extent() == Extent(0, 33)

    def test_infinite_wavetable_rejected(self):
        pe = WavetablePE(IdentityPE(), ConstantPE(0.0))
        with pytest.raises(ValueError, match="finite extent"):
            pe.render(0, 8)

    def test_repr(self):
        r = repr(WavetablePE(make_table(), ConstantPE(0.0)))
        assert "WavetablePE" in r and "linear" in r


class TestWavetablePELookup:
    def test_integer_indices(self):
        idx = ArrayPE(np.array([0, 2, 4, 6], np.float32))
        d = np.asarray(WavetablePE(make_table(), idx).render(0, 4).data)[:, 0]
        np.testing.assert_allclose(d, [0, 2, 4, 6], atol=1e-6)

    def test_fractional_indices_linear(self):
        idx = ArrayPE(np.array([0.5, 2.25, 5.75], np.float32))
        d = np.asarray(WavetablePE(make_table(), idx).render(0, 3).data)[:, 0]
        np.testing.assert_allclose(d, [0.5, 2.25, 5.75], atol=1e-5)

    def test_identity_indexer_reads_table_in_order(self):
        d = np.asarray(
            WavetablePE(make_table(), IdentityPE()).render(0, 8).data
        )[:, 0]
        np.testing.assert_allclose(d, np.arange(8), atol=1e-6)

    def test_stereo_wavetable(self):
        wt = ArrayPE(
            np.column_stack([np.arange(8), -np.arange(8)]).astype(np.float32)
        )
        idx = ArrayPE(np.array([1, 3], np.float32))
        d = np.asarray(WavetablePE(wt, idx).render(0, 2).data)
        np.testing.assert_allclose(d[:, 0], [1, 3], atol=1e-6)
        np.testing.assert_allclose(d[:, 1], [-1, -3], atol=1e-6)

    def test_cubic_integer_indices_exact(self):
        idx = ArrayPE(np.array([1, 3, 5], np.float32))
        pe = WavetablePE(
            make_table(), idx, interpolation=InterpolationMode.CUBIC
        )
        d = np.asarray(pe.render(0, 3).data)[:, 0]
        np.testing.assert_allclose(d, [1, 3, 5], atol=1e-5)

    def test_cubic_reconstructs_smooth_curve_better(self):
        # sample a sine at 8 points, reconstruct between them
        n = 32
        table = np.sin(2 * np.pi * np.arange(n) / n).astype(np.float32)
        fr = np.linspace(4.0, 24.0, 101, dtype=np.float32)
        truth = np.sin(2 * np.pi * fr / n)
        idx = ArrayPE(fr)
        lin = np.asarray(
            WavetablePE(ArrayPE(table), idx).render(0, 101).data
        )[:, 0]
        cub = np.asarray(
            WavetablePE(
                ArrayPE(table), idx, interpolation=InterpolationMode.CUBIC
            ).render(0, 101).data
        )[:, 0]
        assert np.abs(cub - truth).max() < np.abs(lin - truth).max()

    def test_zero_mode_high_oob(self):
        idx = ArrayPE(np.array([3.0, 100.0], np.float32))
        d = np.asarray(WavetablePE(make_table(), idx).render(0, 2).data)[:, 0]
        np.testing.assert_allclose(d, [3.0, 0.0], atol=1e-6)

    def test_zero_mode_negative_oob(self):
        idx = ArrayPE(np.array([-1.0, 2.0], np.float32))
        d = np.asarray(WavetablePE(make_table(), idx).render(0, 2).data)[:, 0]
        np.testing.assert_allclose(d, [0.0, 2.0], atol=1e-6)

    def test_clamp_mode_high(self):
        idx = ArrayPE(np.array([100.0], np.float32))
        pe = WavetablePE(
            make_table(), idx, out_of_bounds=OutOfBoundsMode.CLAMP
        )
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 1).data)[:, 0], [7.0], atol=1e-6
        )

    def test_clamp_mode_low(self):
        idx = ArrayPE(np.array([-100.0], np.float32))
        pe = WavetablePE(
            make_table(), idx, out_of_bounds=OutOfBoundsMode.CLAMP
        )
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 1).data)[:, 0], [0.0], atol=1e-6
        )

    def test_wrap_mode(self):
        idx = ArrayPE(np.array([9.0, 17.0], np.float32))  # 9%8=1, 17%8=1
        pe = WavetablePE(make_table(), idx, out_of_bounds=OutOfBoundsMode.WRAP)
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 2).data)[:, 0], [1.0, 1.0], atol=1e-5
        )

    def test_wrap_mode_negative(self):
        idx = ArrayPE(np.array([-1.0], np.float32))  # -1 % 8 = 7
        pe = WavetablePE(make_table(), idx, out_of_bounds=OutOfBoundsMode.WRAP)
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 1).data)[:, 0], [7.0], atol=1e-5
        )

    def test_offset_wavetable_start(self):
        # wavetable living at [100, 108): index 101 reads table[1]
        wt = CropPE(IdentityPE(), 100, 8)
        idx = ArrayPE(np.array([101.0], np.float32))
        d = np.asarray(WavetablePE(wt, idx).render(0, 1).data)[:, 0]
        np.testing.assert_allclose(d, [101.0], atol=1e-5)

    def test_single_sample_render(self):
        idx = ConstantPE(3.0)
        pe = WavetablePE(make_table(), CropPE(idx, 0, 1))
        np.testing.assert_allclose(
            np.asarray(pe.render(0, 1).data)[:, 0], [3.0], atol=1e-6
        )

    def test_infinite_indexer_extent(self):
        pe = WavetablePE(make_table(), ConstantPE(2.0))
        ext = pe.extent()
        assert ext.start is None and ext.end is None
        np.testing.assert_allclose(
            np.asarray(pe.render(12345, 4).data), 2.0, atol=1e-6
        )

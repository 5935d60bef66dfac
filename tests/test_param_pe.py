"""ParamPE: runtime-bindable parameters (no reference counterpart).

Bindings enter the compiled program as jit ARGUMENTS, which buys three
things the reference's eager interpreter cannot offer: re-binding
without recompilation, differentiability (``jax.grad`` through
``engine.render_functional``), and ``jax.vmap`` over parameter batches.
These tests pin all three plus the basic binding semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine

SR = 44100


@pytest.fixture(autouse=True)
def _sr():
    pg.set_sample_rate(SR)


def _ramp(n=512):
    return pg.ArrayPE(np.linspace(-1, 1, n, dtype=np.float32)[:, None])


class TestBindingSemantics:
    def test_unbound_renders_default(self):
        out = pg.render_to_array(pg.CropPE(pg.ParamPE("x", default=0.25), 0, 64))
        np.testing.assert_array_equal(out, np.full((64, 1), 0.25, np.float32))

    def test_bound_value_overrides_default(self):
        g = pg.CropPE(pg.ParamPE("x", default=0.25), 0, 64)
        out = pg.render_to_array(g, bindings={"x": 0.75})
        np.testing.assert_array_equal(out, np.full((64, 1), 0.75, np.float32))

    def test_param_in_gain_slot_matches_constant(self):
        n = 512
        ref = pg.render_to_array(pg.GainPE(_ramp(n), 0.3))
        got = pg.render_to_array(
            pg.GainPE(_ramp(n), pg.ParamPE("g", default=1.0)),
            bindings={"g": 0.3},
        )
        np.testing.assert_allclose(got, ref, atol=1e-7)

    def test_param_frequency_matches_constant_pe(self):
        """Bound SinePE frequency takes the same modulated path as a
        ConstantPE frequency — outputs must match exactly."""
        n = 1024
        ref = pg.render_to_array(
            pg.CropPE(pg.SinePE(frequency=pg.ConstantPE(330.0)), 0, n)
        )
        got = pg.render_to_array(
            pg.CropPE(pg.SinePE(frequency=pg.ParamPE("f", default=110.0)), 0, n),
            bindings={"f": 330.0},
        )
        np.testing.assert_allclose(got, ref, atol=1e-7)

    def test_shared_param_multi_sink(self):
        """One ParamPE feeding two consumers (pure => fan-out legal)."""
        p = pg.ParamPE("a", default=1.0)
        g = pg.MixPE(pg.GainPE(_ramp(), p), pg.GainPE(_ramp(), p))
        out = pg.render_to_array(g, bindings={"a": 0.5})
        ref = pg.render_to_array(pg.GainPE(_ramp(), 1.0))
        np.testing.assert_allclose(out, ref, atol=1e-7)

    def test_multichannel_binding(self):
        g = pg.CropPE(pg.ParamPE("pan", default=0.0, channels=2), 0, 16)
        out = pg.render_to_array(g, bindings={"pan": jnp.asarray([0.25, 0.75])})
        np.testing.assert_array_equal(out[:, 0], np.full(16, 0.25, np.float32))
        np.testing.assert_array_equal(out[:, 1], np.full(16, 0.75, np.float32))

    def test_wrong_width_binding_raises(self):
        g = pg.CropPE(pg.ParamPE("v", default=0.0, channels=2), 0, 16)
        with pytest.raises(ValueError, match="2 channels"):
            pg.render_to_array(g, bindings={"v": jnp.asarray([1.0, 2.0, 3.0])})

    def test_empty_name_raises(self):
        with pytest.raises(ValueError):
            pg.ParamPE("")


class TestNoRetrace:
    def test_rebinding_does_not_retrace(self, monkeypatch):
        calls = {"n": 0}
        orig = pg.ParamPE._trace

        def counting(self, ctx):
            calls["n"] += 1
            return orig(self, ctx)

        monkeypatch.setattr(pg.ParamPE, "_trace", counting)
        g = pg.CropPE(pg.GainPE(_ramp(), pg.ParamPE("g", default=1.0)), 0, 512)
        for v in (0.1, 0.2, 0.3, 0.4):
            out = pg.render_to_array(g, bindings={"g": v})
            assert abs(float(out[-1, 0]) - v) < 1e-6
        # one trace for the jitted program; later renders reuse it
        assert calls["n"] == 1


class TestDifferentiable:
    def test_grad_matches_analytic(self):
        """d/dg mean((g*x)^2) = 2*g*mean(x^2)."""
        n = 512
        x = np.linspace(-1, 1, n, dtype=np.float32)[:, None]
        g = pg.CropPE(pg.GainPE(pg.ArrayPE(x), pg.ParamPE("g", default=1.0)), 0, n)

        def loss(b):
            out = engine.render_functional(g, 0, n, 128, b)
            return jnp.mean(out**2)

        gval = 0.8
        grad = jax.grad(loss)({"g": jnp.float32(gval)})["g"]
        analytic = 2.0 * gval * float(np.mean(x**2))
        assert abs(float(grad) - analytic) < 1e-5

    def test_gradient_descent_recovers_gain(self):
        n = 256
        x = np.sin(np.arange(n, dtype=np.float32) * 0.1)[:, None]
        target = 0.37 * x
        g = pg.CropPE(pg.GainPE(pg.ArrayPE(x), pg.ParamPE("g", default=0.0)), 0, n)

        def loss(b):
            out = engine.render_functional(g, 0, n, 64, b)
            return jnp.mean((out - target) ** 2)

        val_and_grad = jax.jit(jax.value_and_grad(loss))
        b = {"g": jnp.float32(0.0)}
        # curvature of the quadratic is 2*mean(x^2) ~= 1.0 -> lr 0.9
        for _ in range(80):
            v, gr = val_and_grad(b)
            b = {"g": b["g"] - 0.9 * gr["g"]}
        assert abs(float(b["g"]) - 0.37) < 1e-3

    def test_grad_through_stateful_filter_scan(self):
        """Gradient flows through a stateful scan path (biquad sweep)."""
        n = 256
        x = np.sin(np.arange(n, dtype=np.float32) * 0.3)[:, None]
        g = pg.CropPE(
            pg.BiquadPE(
                pg.ArrayPE(x),
                pg.ParamPE("f", default=2000.0),
                0.707,
                mode=pg.BiquadMode.LOWPASS,
            ),
            0,
            n,
        )

        def loss(b):
            out = engine.render_functional(g, 0, n, 64, b)
            return jnp.mean(out**2)

        grad = jax.grad(loss)({"f": jnp.float32(1500.0)})["f"]
        assert np.isfinite(float(grad))
        assert float(grad) != 0.0


class TestVmapBatch:
    def test_vmap_over_bindings(self):
        n = 256
        x = np.linspace(-1, 1, n, dtype=np.float32)[:, None]
        g = pg.CropPE(pg.GainPE(pg.ArrayPE(x), pg.ParamPE("g", default=1.0)), 0, n)

        def render(b):
            return engine.render_functional(g, 0, n, 64, b)

        gains = jnp.asarray([0.1, 0.5, 1.0, 2.0], jnp.float32)
        batch = jax.vmap(lambda v: render({"g": v}))(gains)
        assert batch.shape == (4, n, 1)
        for k, v in enumerate(np.asarray(gains)):
            np.testing.assert_allclose(
                np.asarray(batch[k]), v * x, atol=1e-6
            )

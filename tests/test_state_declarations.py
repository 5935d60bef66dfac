"""Automated validation of the per-PE state declarations.

Two safety gates in ``parallel.render`` trust hand-declared flags:

- ``state_decays()`` gates halo-mode time sharding (a wrong True would
  silently corrupt halo-mode audio);
- ``state_affine()`` gates the parallel-exact affine span composition
  (a wrong True would silently corrupt affine-mode audio).

These tests validate the declarations NUMERICALLY so a wrong flag fails
CI instead of shipping wrong audio, and enumerate the declaring classes
by introspection so a new PE cannot add a flag without adding itself to
the validation catalog.

Decay semantics (what halo mode actually assumes): the carried state
after rendering up to time ``e`` converges to a start-independent value
once the warm-up is long enough. Validated by comparing the final state
pytrees of two renders with different warm-up depths.

Affine semantics: holding the block inputs fixed, state → (output,
new_state) satisfies f(s1 + a·s2) = f(s1) + a·(f(s2) − f(0)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pygmu2_tpu as pg
from pygmu2_tpu.core import engine, prec
from pygmu2_tpu.core.processing_element import ProcessingElement

SR = 44100
BLOCK = 1024


def _all_pe_classes():
    out = []
    for name in pg.__all__:
        obj = getattr(pg, name)
        if isinstance(obj, type) and issubclass(obj, ProcessingElement):
            out.append(obj)
    return out


def _overrides(cls, method):
    return getattr(cls, method) is not getattr(ProcessingElement, method)


# ---- catalog: one representative graph per declaring class --------------
#
# Each entry: (class, graph constructor). The graph must contain an
# instance of the class whose flag evaluates True, driven by a pure
# (start-independent) source so warm-up convergence is meaningful.

def _src():
    return pg.SinePE(frequency=220.0, amplitude=0.5)


DECAY_CATALOG = {
    pg.BiquadPE: lambda: pg.BiquadPE(_src(), 2000.0, 1.2),
    pg.SVFilterPE: lambda: pg.SVFilterPE(_src(), 1500.0, 1.0),
    pg.ConvolvePE: lambda: pg.ConvolvePE(
        _src(),
        pg.ArrayPE(np.exp(-np.arange(200) / 30.0).astype(np.float32)),
    ),
    pg.EnvelopePE: lambda: pg.EnvelopePE(_src(), attack=0.004, release=0.01),
    pg.SlewLimiterPE: lambda: pg.SlewLimiterPE(_src(), rise_rate=400.0),
    pg.LadderPE: lambda: pg.LadderPE(_src(), 2500.0, 0.3),
    # modest feedback: fb^(H/period) must reach f32 noise inside the
    # warm-up (the halo docstring's "typical filters" caveat)
    pg.CombPE: lambda: pg.CombPE(_src(), 220.0, feedback=0.6),
    pg.NoisePE: lambda: pg.NoisePE(seed=7, mode=pg.NoiseMode.PINK),
    # RandomPE declares state_decays() == is_pure(): in the pure modes
    # there is no carried state at all, which converges trivially
    pg.RandomPE: lambda: pg.GainPE(
        _src(), pg.RandomPE(rate=50.0, mode=pg.RandomMode.SMOOTH, seed=3)
    ),
}

AFFINE_CATALOG = {
    pg.BiquadPE: lambda: pg.BiquadPE(_src(), 2000.0, 1.2),
    pg.SVFilterPE: lambda: pg.SVFilterPE(_src(), 1500.0, 1.0),
    pg.ConvolvePE: lambda: pg.ConvolvePE(
        _src(),
        pg.ArrayPE(np.exp(-np.arange(64) / 10.0).astype(np.float32)),
    ),
}


def _decay_declared(cls) -> bool:
    """Does any catalog-construction of cls declare state_decays True?"""
    graph = DECAY_CATALOG[cls]()
    for pe in engine._walk(graph):
        if isinstance(pe, cls) and pe.state_decays():
            return True
    return False


class TestCatalogCoverage:
    def test_every_decay_declarer_is_validated(self):
        declared = {
            cls
            for cls in _all_pe_classes()
            if _overrides(cls, "state_decays")
        }
        # subtract classes whose override can only return False
        # (documented always-False overrides need no convergence test)
        always_false = {
            cls
            for cls in declared
            if cls.__name__ in ("TriggerPE", "ResetPE")
        }
        missing = {
            c.__name__
            for c in declared - always_false - set(DECAY_CATALOG)
            # subclasses covered through a cataloged base (e.g. both
            # filters share _FreqQFilterPE.state_decays)
            if not any(issubclass(c, k) or issubclass(k, c) for k in DECAY_CATALOG)
        }
        assert not missing, (
            f"PEs declare state_decays but are not in DECAY_CATALOG: "
            f"{sorted(missing)} — add a representative graph so the "
            "declaration is numerically validated."
        )

    def test_every_affine_declarer_is_validated(self):
        declared = {
            cls
            for cls in _all_pe_classes()
            if _overrides(cls, "state_affine")
        }
        missing = {
            c.__name__
            for c in declared - set(AFFINE_CATALOG)
            if not any(issubclass(c, k) or issubclass(k, c) for k in AFFINE_CATALOG)
        }
        assert not missing, (
            f"PEs declare state_affine but are not in AFFINE_CATALOG: "
            f"{sorted(missing)} — add a representative graph so the "
            "declaration is numerically validated."
        )


def _probe_after_warmup(graph, warm_start: int, end: int, probe: int):
    """Render [warm_start, end) from fresh state, then the audio of
    [end, end+probe) continuing that state — what halo mode would emit."""
    engine.reset_graph_states(graph)
    engine.render_scan(graph, warm_start, end - warm_start, BLOCK)
    out = np.asarray(engine.render_scan(graph, end, probe, BLOCK))
    engine.reset_graph_states(graph)
    return out


def _warmup_divergence(graph_fn, h1: int = 16384, h2: int = 32768):
    """Max |output(h1 warm-up) − output(h2 warm-up)| past the warm-up.

    Compares the CONTINUED OUTPUT, not raw state leaves: ring buffers
    rotate with the warm-up length (write cursors differ while the
    audio they produce is identical), so output convergence is the
    actual halo-mode contract.
    """
    end = 65536
    graph = graph_fn()
    a = _probe_after_warmup(graph, end - h1, end, 8192)
    b = _probe_after_warmup(graph, end - h2, end, 8192)
    return float(np.max(np.abs(a - b)))


class TestDecayDeclarations:
    @pytest.mark.parametrize(
        "cls", sorted(DECAY_CATALOG, key=lambda c: c.__name__),
        ids=lambda c: c.__name__,
    )
    def test_declared_decaying_state_converges(self, cls):
        if not _decay_declared(cls):
            pytest.skip(f"{cls.__name__} catalog instance declares False")
        div = _warmup_divergence(DECAY_CATALOG[cls])
        assert div < 1e-4, (
            f"{cls.__name__} declares state_decays()==True but its final "
            f"state still depends on the warm-up depth (|Δ|={div:.2e}) — "
            "halo-mode renders through it would be wrong."
        )

    def test_validator_catches_non_decaying_state(self):
        # negative control: a modulated sine carries a phase accumulator
        # whose value depends on where rendering started — the validator
        # must see a large divergence, or it has no teeth.
        div = _warmup_divergence(
            lambda: pg.SinePE(frequency=pg.ConstantPE(220.0), amplitude=0.5)
        )
        assert div > 1e-3

    def test_validator_catches_timewarp_position(self):
        # TimeWarpPE's carried read position depends on where rendering
        # started — a second reliably non-converging control. (Brown
        # noise, despite declaring False, synchronizes stochastically:
        # two clipped walks driven by the same pure-of-t white stream
        # couple once they touch a clip rail together — so it is NOT a
        # usable negative control.)
        div = _warmup_divergence(
            lambda: pg.TimeWarpPE(
                pg.SinePE(frequency=220.0, amplitude=0.5),
                rate=pg.ConstantPE(0.7),
            )
        )
        assert div > 1e-3


# ---- affine validation ---------------------------------------------------


def _affine_probe(graph):
    """f(s) = (out, new_state_vec) for one block at a fixed start."""
    prog = engine.get_program(graph, BLOCK)
    start = jnp.asarray(4096, prec.INDEX)
    _, tmpl = prog._fn_first(start - BLOCK)
    flat, treedef = jax.tree_util.tree_flatten(tmpl)
    is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in flat]
    D = sum(int(np.prod(l.shape)) for l, f in zip(flat, is_f) if f)

    def set_vec(vec):
        out, o = [], 0
        for leaf, f in zip(flat, is_f):
            if f:
                n = int(np.prod(leaf.shape))
                out.append(vec[o : o + n].reshape(leaf.shape).astype(leaf.dtype))
                o += n
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    @jax.jit
    def f(vec):
        out, st = prog._run_step(start, set_vec(vec))
        leaves = jax.tree_util.tree_flatten(st)[0]
        vec_out = jnp.concatenate(
            [
                l.reshape(-1).astype(jnp.float32)
                for l, fl in zip(leaves, is_f)
                if fl
            ]
        )
        return out, vec_out

    return f, D


@pytest.mark.parametrize(
    "cls", sorted(AFFINE_CATALOG, key=lambda c: c.__name__),
    ids=lambda c: c.__name__,
)
def test_declared_affine_state_is_affine(cls):
    graph = AFFINE_CATALOG[cls]()
    assert any(
        isinstance(pe, cls) and pe.state_affine()
        for pe in engine._walk(graph)
    )
    f, D = _affine_probe(graph)
    assert D > 0
    rng = np.random.default_rng(11)
    s1 = jnp.asarray(rng.normal(size=D, scale=0.1), jnp.float32)
    s2 = jnp.asarray(rng.normal(size=D, scale=0.1), jnp.float32)
    a = np.float32(0.73)
    y0, v0 = f(jnp.zeros(D, jnp.float32))
    y1, v1 = f(s1)
    y2, v2 = f(s2)
    yc, vc = f(s1 + a * s2)
    np.testing.assert_allclose(
        np.asarray(yc), np.asarray(y1 + a * (y2 - y0)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(vc), np.asarray(v1 + a * (v2 - v0)), atol=2e-5
    )


def test_affine_validator_catches_nonlinear_state():
    # negative control: LadderPE's tanh feedback is NOT affine in state
    graph = pg.LadderPE(_src(), 2500.0, 0.4, drive=2.0)
    f, D = _affine_probe(graph)
    rng = np.random.default_rng(3)
    s1 = jnp.asarray(rng.normal(size=D, scale=0.5), jnp.float32)
    s2 = jnp.asarray(rng.normal(size=D, scale=0.5), jnp.float32)
    a = np.float32(0.73)
    y0, _ = f(jnp.zeros(D, jnp.float32))
    y1, _ = f(s1)
    y2, _ = f(s2)
    yc, _ = f(s1 + a * s2)
    err = float(np.max(np.abs(np.asarray(yc) - np.asarray(y1 + a * (y2 - y0)))))
    assert err > 1e-4, "validator failed to detect nonlinear state"

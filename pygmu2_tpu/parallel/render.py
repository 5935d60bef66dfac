"""Multi-chip rendering: shard audio work over a jax.sharding Mesh.

The reference is single-process/single-machine (SURVEY §2.10); these
scale-out paths are designed fresh for TPU pods. Two natural axes:

- **Voice parallelism** (the synth): the voice-field kernel is already
  SoA over a (polyphony,) axis — shard it across devices and psum the
  stereo mixdown over ICI. ``render_midi_sharded`` runs the whole MIDI
  timeline as one shard_map'd lax.scan.

- **Time parallelism** (pure graphs): pure PEs are functions of the
  absolute sample index, so disjoint spans of the timeline render
  independently — shard block-time across devices with no communication
  at all (``render_time_sharded``). Stateful graphs need their state
  chain and are not eligible (the validator's purity flag decides).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pygmu2_tpu.core import engine, prec


def default_mesh(n_devices: int | None = None, axis: str = "v") -> Mesh:
    """A 1-D mesh over the first n available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


# ---- time-parallel pure-graph rendering --------------------------------


def render_time_sharded(root, start: int, total: int, mesh: Mesh, block: int = 8192):
    """Render a PURE graph's ``[start, start+total)`` with the time axis
    sharded over the mesh — zero collectives, embarrassingly parallel.

    Returns a host float32 array (total, C).
    """
    if not root.is_pure():
        raise ValueError(
            "render_time_sharded requires a pure graph (stateful graphs "
            "carry a sequential state chain); use engine.render_scan."
        )
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    span = -(-total // n_dev)
    span = -(-span // block) * block  # round to block multiple
    n_blocks_per_dev = span // block

    prog = engine.get_program(root, block)
    starts = (
        start
        + jnp.arange(n_dev * n_blocks_per_dev, dtype=prec.INDEX) * block
    )

    shard_map = jax.shard_map

    def shard_fn(starts_local):
        def step(carry, s):
            out, _state = prog._run_first(s)
            return carry, out

        _, blocks = jax.lax.scan(step, 0, starts_local)
        return blocks.reshape(n_blocks_per_dev * block, -1)

    fn = jax.jit(
        shard_map(
            shard_fn, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
        )
    )
    out = fn(starts)
    return np.asarray(out)[:total]


def render_time_sharded_stateful(
    root, start: int, total: int, mesh: Mesh, block: int = 8192,
    halo: int = 0,
):
    """Render a STATEFUL graph with the block-time axis sharded over the
    mesh — the sequence-parallel analog for IIR state chains (SURVEY §5
    long-context: halo/tail exchange over ICI).

    Two modes:

    - ``halo == 0`` (default, **exact**): each device owns a contiguous
      span; the carried state pytree is relayed along the device ring
      with ``ppermute`` — device d starts from exactly the state device
      d-1 ended with (no approximation anywhere in the math). Outputs
      match the single-device render up to XLA's fp instruction
      scheduling: the shard_map program and the plain block scan are
      separately compiled modules, and the compiler may legally form
      fmas differently in each (observed <=3e-6 on a resonant biquad
      chain; tests pin <=2e-5). Rounds serialize on the state chain
      (wall-clock does not drop), but inputs, outputs, and upstream
      graph memory are sharded — timelines larger than one device's
      HBM become renderable.

      NB: unlike ``engine.render_scan`` this does not scatter the final
      state back onto the graph instances — each call renders its span
      from the provided start with fresh initial state on device 0.

    - ``halo > 0`` (**parallel, approximate**): every device renders
      ``halo`` warm-up samples from a fresh state before its span and
      discards them. No communication at all; valid ONLY when every
      stateful node's state is *decaying* (IIR tails, envelope
      followers — a few thousand samples of halo reaches f32 round-off
      for typical filters). Non-decaying state — oscillator phase
      accumulators, TimeWarp positions, trigger-restart origins —
      depends on where rendering started and will NOT converge: use
      the exact mode for such graphs. Note the first device pre-rolls
      t < start, so a source defined there changes the cold-start
      transient within the first span.

    Returns a host float32 array (total, C).
    """
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    span = -(-total // n_dev)
    span = -(-span // block) * block
    n_chunks = span // block
    halo_blocks = -(-halo // block) if halo else 0

    prog = engine.get_program(root, block)
    shard_map = jax.shard_map

    dev_starts = start + span * jnp.arange(n_dev, dtype=prec.INDEX)

    if halo:
        # Halo warm-up is valid only for decaying state (docstring
        # above); enforce it instead of trusting the caller. An abstract
        # trace populates the program's state-node registry.
        jax.eval_shape(prog._run_first, jnp.asarray(0, prec.INDEX))
        bad = [
            type(pe).__name__
            for pe in prog._state_nodes
            if not pe.state_decays()
        ]
        if bad:
            raise ValueError(
                "halo mode requires every stateful node's state to decay "
                f"(non-decaying: {sorted(set(bad))}); these depend on "
                "where rendering started and will not converge in the "
                "warm-up — use halo=0 (exact ppermute state relay)."
            )
        def shard_fn(my_start):
            s0 = my_start[0] - halo_blocks * block
            # block 0 initializes fresh state ONCE outside the scan so the
            # steady-state loop body traces only _run_step (running both
            # programs per block and selecting doubled device work).
            out0, st0 = prog._run_first(s0)

            def step(st, k):
                out, new = prog._run_step(s0 + k * block, st)
                return new, out

            ks = jnp.arange(1, halo_blocks + n_chunks, dtype=prec.INDEX)
            _, rest = jax.lax.scan(step, st0, ks)
            outs = jnp.concatenate([out0[None], rest], axis=0)
            return outs[halo_blocks:].reshape(span, -1)

        fn = jax.jit(
            shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(axis),), out_specs=P(axis),
            )
        )
        out = fn(dev_starts)
        return np.asarray(out)[:total]

    # ---- exact mode: ring state relay ----
    state_shapes = jax.eval_shape(prog._run_first, dev_starts[0])[1]
    dummy_state = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), state_shapes
    )
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def shard_fn(my_start):
        my_idx = jax.lax.axis_index(axis)
        s0 = my_start[0]

        def _vary(x):
            # mark device-varying where needed (fresh/zero leaves are
            # replicated; input-derived leaves are already varying)
            if axis in getattr(jax.typeof(x), "vma", frozenset()):
                return x
            return jax.lax.pcast(x, axis, to='varying')

        def compute_span(state_in):
            # device 0 initializes fresh; others continue from the relay
            def from_first(_):
                out0, st = prog._run_first(s0)
                return jax.tree_util.tree_map(_vary, (out0, st))

            def from_state(st_in):
                return prog._run_step(s0, st_in)

            out0, st = jax.lax.cond(
                my_idx == 0, from_first, from_state, state_in
            )

            def step(carry, k):
                out, new = prog._run_step(s0 + k * block, carry)
                return new, out

            if n_chunks > 1:
                ks = jnp.arange(1, n_chunks, dtype=prec.INDEX)
                st, rest = jax.lax.scan(step, st, ks)
                outs = jnp.concatenate([out0[None], rest], axis=0)
            else:
                outs = out0[None]
            return outs.reshape(span, -1), st

        def round_body(r, carry):
            state, my_out = carry
            active = my_idx == r

            def do(args):
                state_in, _ = args
                return compute_span(state_in)

            def skip(args):
                state_in, out_prev = args
                return out_prev, state_in

            out_new, state_new = jax.lax.cond(
                active, do, skip, (state, my_out)
            )
            my_out = jnp.where(active, out_new, my_out)
            state = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm), state_new
            )
            return state, my_out

        C = root.channel_count() or 1
        my_out0 = _vary(jnp.zeros((span, C), prec.AUDIO))
        state0 = jax.tree_util.tree_map(_vary, dummy_state)
        _, my_out = jax.lax.fori_loop(
            0, n_dev, round_body, (state0, my_out0)
        )
        return my_out

    fn = jax.jit(
        shard_map(
            shard_fn, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
        )
    )
    out = fn(dev_starts)
    return np.asarray(out)[:total]


def _affine_state_layout(state_shapes):
    """(treedef, leaf shape/dtype list, float mask, D) for the state pytree.

    The affine machinery probes only floating-point leaves (the carried
    DSP state); integer/bool leaves — the ``next`` cursors — are held at
    their template values.
    """
    flat, treedef = jax.tree_util.tree_flatten(state_shapes)
    is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in flat]
    dim = sum(int(np.prod(l.shape)) for l, f in zip(flat, is_f) if f)
    return treedef, flat, is_f, dim


def render_time_sharded_affine(
    root, start: int, total: int, mesh: Mesh, block: int = 8192
):
    """EXACT *and parallel* time sharding for affine-state graphs.

    The exact ppermute relay (``render_time_sharded_stateful``)
    serializes on the state chain: device d idles until d-1 finishes.
    When every stateful node declares :meth:`state_affine` (linear
    filters, FIR histories), the span map ``s_in → (output, s_out)`` is
    affine, so the chain solves in parallel instead:

    1. every device renders its span from a *basis* of initial states —
       the zero vector plus the D unit vectors, one vmapped launch —
       yielding the zero-state response ``y0``, the span's state
       transition matrix ``M`` and offset ``c`` (the run-time
       generalization of ``ops/linrec.py``'s per-sample affine
       composition, lifted to whole-span block headers), and the
       output's state sensitivity ``dY``;
    2. the tiny ``(D×D, D)`` span maps cross the mesh in ONE
       ``all_gather`` over ICI and each device composes the prefix
       locally (D is a handful of filter taps — the collective payload
       is bytes, so a gather beats a log-depth ppermute scan);
    3. each device corrects its output by linearity:
       ``y = y0 + dY · s_in`` — no re-render, no serial rounds.

    Wall-clock is one (D+1)-wide span render regardless of mesh size,
    vs ``n_dev`` serial spans for the relay — the win case is filter
    chains, where D is a handful of taps (a long ConvolvePE history
    makes D = len(fir) − 1 and the basis fan-out expensive; prefer the
    relay there). Exact up to f32 rounding (the prefix composition runs
    in f64); matches ``engine.render_scan`` at ≤1e-5 for const-coeff
    chains, ≤1e-4 under resonance sweeps / long FIR histories.

    Returns a host float32 array (total, C).
    """
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    span = -(-total // n_dev)
    span = -(-span // block) * block
    n_chunks = span // block

    prog = engine.get_program(root, block)
    zero_start = jnp.asarray(0, prec.INDEX)
    out_shape, state_shapes = jax.eval_shape(prog._run_first, zero_start)
    bad = sorted(
        {
            type(pe).__name__
            for pe in prog._state_nodes
            if not pe.state_affine()
        }
    )
    if bad:
        raise ValueError(
            "render_time_sharded_affine requires every stateful node's "
            f"state map to be affine (non-affine: {bad}); use halo=0 "
            "exact relay (render_time_sharded_stateful) for such graphs."
        )
    treedef, tmpl_flat, is_f, D = _affine_state_layout(state_shapes)
    if prog._state_nodes and D == 0:
        raise ValueError("affine graph declared state but carries no float leaves")

    if not prog._state_nodes:
        # no state at all — pure time sharding
        return render_time_sharded(root, start, total, mesh, block=block)

    def _set_vec(tmpl_leaves, vec):
        out, o = [], 0
        for leaf, f in zip(tmpl_leaves, is_f):
            if f:
                n = int(np.prod(leaf.shape))
                out.append(vec[o : o + n].reshape(leaf.shape).astype(leaf.dtype))
                o += n
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    def _get_vec(states):
        flat, _ = jax.tree_util.tree_flatten(states)
        return jnp.concatenate(
            [
                l.reshape(-1).astype(jnp.float32)
                for l, f in zip(flat, is_f)
                if f
            ]
        )

    dev_starts = start + span * jnp.arange(n_dev, dtype=prec.INDEX)

    shard_map = jax.shard_map

    def shard_fn(my_start):
        s0 = my_start[0]
        # Template render one block before the span: discarded output,
        # discarded float state — what it provides is every state
        # entry's correct ``next`` cursor (frame start + duration, which
        # can differ from the block start for shifted pulls), so the
        # basis renders below are contiguous continuations, not resets.
        _, tmpl = prog._run_first(s0 - block)
        tmpl_leaves = jax.tree_util.tree_flatten(tmpl)[0]

        def span_render(vec):
            states = _set_vec(tmpl_leaves, vec)
            out0, st = prog._run_step(s0, states)

            def step(carry, k):
                out, new = prog._run_step(s0 + k * block, carry)
                return new, out

            if n_chunks > 1:
                ks = jnp.arange(1, n_chunks, dtype=prec.INDEX)
                st, rest = jax.lax.scan(step, st, ks)
                outs = jnp.concatenate([out0[None], rest], axis=0)
            else:
                outs = out0[None]
            return outs.reshape(span, -1), _get_vec(st)

        # Probe the affine span map with a basis of initial states: the
        # zero vector plus the D unit vectors, one vmapped launch. For an
        # affine f, f(e_i) − f(0) IS the state response to e_i; both
        # renders take identical branches, so their f32 rounding
        # correlates and largely cancels in the difference (measured
        # ~10× tighter than an AD tangent replay, whose scan rounds
        # independently of the primal).
        basis = jnp.concatenate(
            [jnp.zeros((1, D), jnp.float32), jnp.eye(D, dtype=jnp.float32)]
        )
        ys, sends = jax.vmap(span_render)(basis)  # (D+1, span, C), (D+1, D)
        y0 = ys[0]
        c = sends[0].astype(jnp.float64)
        M = (sends[1:] - sends[0][None]).astype(jnp.float64).T  # (D, D)
        dY = ys[1:] - ys[0][None]  # (D, span, C)

        # one collective: every device learns every span's (M, c)
        Ms = jax.lax.all_gather(M, axis)  # (n_dev, D, D)
        cs = jax.lax.all_gather(c, axis)  # (n_dev, D)
        my_idx = jax.lax.axis_index(axis)

        def compose(d, s):
            return Ms[d] @ s + cs[d]

        s0_carry = jax.lax.pcast(
            jnp.zeros((D,), jnp.float64), axis, to="varying"
        )
        s_in = jax.lax.fori_loop(
            0, my_idx.astype(jnp.int32), compose, s0_carry
        )
        corr = jnp.einsum(
            "d,dtc->tc", s_in.astype(jnp.float32), dY
        )
        return y0 + corr

    fn = jax.jit(
        shard_map(
            shard_fn, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
        )
    )
    out = fn(dev_starts)
    return np.asarray(out)[:total]


def select_time_sharding(
    root, mesh: Mesh, block: int = 8192, affine_max_basis: int | None = None
):
    """Pick the time-sharding strategy for ``root`` on ``mesh``.

    Returns ``(mode, D)`` with ``mode`` in ``{"pure", "affine",
    "relay"}`` and ``D`` the float-state dimension (0 for pure graphs).

    Crossover logic: the affine path probes the span map with a
    ``(D+1)``-wide basis of initial states — ONE parallel launch, but
    ``D+1`` span renders of arithmetic per device — while the exact
    relay runs ``n_dev`` span renders serialized on the state chain.
    So affine wins exactly when ``D + 1 <= n_dev`` (tie to affine: the
    vmapped basis has no serial rounds and no per-round collective).
    A long-FIR ConvolvePE history makes ``D = len(fir) - 1`` — at
    D = 2047 on an 8-device mesh the basis fan-out would cost ~256x
    the relay's arithmetic, which is why callers should route through
    :func:`render_time_sharded_auto` instead of calling the affine
    path directly. ``affine_max_basis`` overrides the ``n_dev``
    crossover cap (e.g. benchmark-measured machine constants).
    """
    if root.is_pure():
        return "pure", 0
    prog = engine.get_program(root, block)
    _, state_shapes = jax.eval_shape(
        prog._run_first, jnp.asarray(0, prec.INDEX)
    )
    if not prog._state_nodes:
        return "pure", 0
    if any(not pe.state_affine() for pe in prog._state_nodes):
        return "relay", -1
    _, _, _, D = _affine_state_layout(state_shapes)
    cap = mesh.devices.size if affine_max_basis is None else affine_max_basis
    if D + 1 <= cap:
        return "affine", D
    return "relay", D


def render_time_sharded_auto(
    root, start: int, total: int, mesh: Mesh, block: int = 8192,
    affine_max_basis: int | None = None,
):
    """Time-sharded render with the strategy picked automatically by
    :func:`select_time_sharding`: pure graphs shard with no collectives,
    affine-state graphs with a small state dimension use the
    parallel-exact span-map composition, everything else the exact
    ppermute ring relay. Returns a host float32 array (total, C)."""
    mode, _d = select_time_sharding(
        root, mesh, block=block, affine_max_basis=affine_max_basis
    )
    if mode == "pure":
        return render_time_sharded(root, start, total, mesh, block=block)
    if mode == "affine":
        return render_time_sharded_affine(
            root, start, total, mesh, block=block
        )
    return render_time_sharded_stateful(
        root, start, total, mesh, block=block
    )


# ---- voice-parallel SoundFont rendering --------------------------------


def render_midi_sharded(synth, midi_file, seconds: float, mesh: Mesh) -> np.ndarray:
    """Offline MIDI render with the voice axis sharded over the mesh.

    Per-voice parameters/state live on their shard; the only collective
    is a psum of each block's stereo mixdown over the voice axis (rides
    ICI). Polyphony must divide by the mesh size.

    Returns a host float32 array (samples, 2).
    """
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    if synth.maximum_polyphony % n_dev != 0:
        raise ValueError(
            f"maximum_polyphony ({synth.maximum_polyphony}) must divide by "
            f"the mesh size ({n_dev})"
        )

    par_np, ch_np, snap_idx, n_blocks = synth.build_schedule(midi_file, seconds)
    N = synth.block_size
    master = np.float32(synth.master_volume)

    shard_map = jax.shard_map

    # Per-voice arrays shard on their last (voice) axis; channel state and
    # the block→snapshot map replicate.
    par_specs = {k: P(None, axis) for k in par_np}
    local_p = synth.maximum_polyphony // n_dev

    def shard_fn(par_stack, ch_stack, idx):
        def step(dyn, i):
            par_b = {k: v[i] for k, v in par_stack.items()}
            ch_b = {k: v[i] for k, v in ch_stack.items()}
            new_dyn, audio = synth._block_kernel(dyn, par_b, ch_b, master)
            return new_dyn, jax.lax.psum(audio, axis)

        dyn0 = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, axis, to='varying'), synth._init_dyn(local_p)
        )
        _, blocks = jax.lax.scan(step, dyn0, idx)
        return blocks.reshape(n_blocks * N, 2)

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(par_specs, {k: P() for k in ch_np}, P()),
            out_specs=P(),
        )
    )
    par_stack = {k: jnp.asarray(v) for k, v in par_np.items()}
    ch_stack = {k: jnp.asarray(v) for k, v in ch_np.items()}
    out = fn(par_stack, ch_stack, jnp.asarray(snap_idx))
    total = int(round(seconds * synth.sample_rate))
    synth.reset()
    return np.asarray(out)[:total]


def render_midi_offline_sharded(
    synth, midi_file, seconds: float, mesh: Mesh
) -> np.ndarray:
    """The single-launch offline renderer with voices sharded over the mesh.

    The device-side control pass and the audio pass both operate
    per-voice, so every (..., P) plane shards on its voice axis; channel
    tables, the block->snapshot map, and the wavetable replicate. The
    only collective is one psum of the final (T, 2) stereo mix.

    Returns a host float32 array (samples, 2).
    """
    shard_map = jax.shard_map

    from pygmu2_tpu.soundfont import offline as off

    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    if synth.maximum_polyphony % n_dev != 0:
        raise ValueError(
            f"maximum_polyphony ({synth.maximum_polyphony}) must divide by "
            f"the mesh size ({n_dev})"
        )

    par_np, ch_np, snap_idx, _nb = synth.build_schedule(midi_file, seconds)
    pf32, pi32, pf64, cf32, chold, flags = off._pack_schedule(par_np, ch_np)
    N = synth.block_size
    min_dur = int(synth._minimum_voice_duration)
    sr = float(synth.sample_rate)
    master = float(synth.master_volume)
    # large fonts ride the windowed-DMA oscillator per shard (the
    # wavetable replicates; per-voice windows are per-device VMEM)
    wave_ext, win_w = off._window_args(synth, par_np, ch_np)

    def shard_fn(pf32, pi32, pf64, cf32, chold, snap, wave, wave_ext):
        ctrl = off._control_device(
            pf32, pi32, pf64, cf32, chold, snap, N, flags, min_dur, sr
        )
        out = off._audio_pass(  # local voices only
            ctrl, wave, N, master, wave_ext, win_w,
            off.FORCE_PALLAS_INTERPRET,
        )
        return jax.lax.psum(out, axis)

    if wave_ext is None:
        wave_ext = jnp.zeros((0,), jnp.float32)  # unused, replicated
    vspec = P(None, None, axis)  # (F, NS, P) stacks shard on voices
    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(vspec, vspec, vspec, P(), P(), P(), P(), P()),
            out_specs=P(),
        )
    )
    out = fn(
        pf32, pi32, pf64, cf32, chold, jnp.asarray(snap_idx), synth._wave,
        wave_ext,
    )
    total = int(round(seconds * synth.sample_rate))
    synth.reset()
    return np.asarray(out)[:total]

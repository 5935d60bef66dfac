"""custom_vjp glue: Mosaic-kernel forward, lax.scan backward.

The sequential Pallas kernels (ladder, comb, Karplus-Strong, ADSR,
reverse pitch echo, envelope follower, affine linrec) have no JAX
autodiff rule — ``pallas_call`` is a black box to AD, so ``jax.grad``
through a graph containing one raises on TPU while the ``lax.scan``
fallbacks differentiate fine on CPU. Each kernel keeps a pure-jax
``lax.scan`` reference with identical semantics (same op order, f32)
for interpret-mode parity tests and non-TPU fallback; this wrapper runs
the KERNEL in the forward pass and replays the SCAN reference under
``jax.vjp`` in the backward pass, so ``render_functional``'s documented
gradient story (core/engine.py) holds on the TPU backend too.

The backward is recompute-based: residuals are just the primal inputs,
and the scan reference's own VJP materializes whatever per-step
intermediates it needs. Cotangent fidelity is bounded by the
kernel-vs-scan forward parity (<= 1e-5 in every kernel's parity test).

The reference has no gradient support at all (its kernels are Numba) —
this is a TPU-build capability, required for the differentiable
synthesis examples (examples/gradient_fit_eg.py).
"""

from __future__ import annotations

import jax

__all__ = [
    "kernel_with_scan_vjp",
    "kernel_path_enabled",
    "kernel_interpret",
]

# Test hook: route the PE-level kernel branches (models/physical.py,
# models/envelopes.py, models/reverse_echo.py) through the Mosaic
# kernels in INTERPRET mode on non-TPU backends, so kernel-path
# behavior — including the custom_vjp gradients — is testable on the
# CPU CI. Mirrors soundfont.offline.FORCE_PALLAS_INTERPRET.
FORCE_KERNEL_INTERPRET = False


def kernel_path_enabled() -> bool:
    """True when PEs should take their Mosaic-kernel branch."""
    return jax.default_backend() == "tpu" or FORCE_KERNEL_INTERPRET


def kernel_interpret() -> bool:
    """interpret= value PEs should pass to kernel entry points."""
    return bool(FORCE_KERNEL_INTERPRET)


def kernel_with_scan_vjp(kernel_fn, scan_fn):
    """Wrap a Pallas kernel entry with a scan-replay VJP.

    ``kernel_fn`` / ``scan_fn``: positional-arg callables with identical
    signatures and identical output pytrees (bake static configuration
    in via closures). Integer/bool leaves are handled by JAX's float0
    cotangent machinery on both sides.

    Returns a callable with the same signature whose forward pass is
    ``kernel_fn`` and whose backward pass is ``jax.vjp(scan_fn, ...)``.
    """

    @jax.custom_vjp
    def run(args):
        return kernel_fn(*args)

    def fwd(args):
        return kernel_fn(*args), args

    def bwd(args, ct):
        _, vjp = jax.vjp(lambda a: scan_fn(*a), args)
        (d,) = vjp(ct)
        return (d,)

    run.defvjp(fwd, bwd)
    return lambda *args: run(args)

"""Golden-parity oracle: import the reference NumPy implementation.

The reference (rdpoor/pygmu2, mounted read-only at /root/reference) is
pure Python + numpy/scipy with optional native deps. We stub the host
audio deps (soundfile/sounddevice/miniaudio/mido) and numba (its kernels
all run as plain Python when the decorator is a no-op), which lets parity
tests render the SAME graph through the reference and through pygmu2_tpu
and compare samples — the strongest correctness gate we have
(SURVEY.md §4: golden parity vs the NumPy reference, ≤1e-4).

Usage:
    ref = load_reference()          # module or None if unavailable
    pytest.importorskip-style: tests skip cleanly when absent.
"""

from __future__ import annotations

import sys
import types

_REF_PATH = "/root/reference/src"
_ref_module = None
_failed = False


def load_reference():
    """Import the reference package once; returns it or None."""
    global _ref_module, _failed
    if _ref_module is not None:
        return _ref_module
    if _failed:
        return None
    try:
        if _REF_PATH not in sys.path:
            sys.path.insert(0, _REF_PATH)
        for name in ("soundfile", "sounddevice", "miniaudio", "mido"):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        sf = sys.modules["soundfile"]
        if not hasattr(sf, "read"):
            from pygmu2_tpu.utils import wavio

            def _sf_read(path, dtype="float32", **kwargs):
                data, sr = wavio.read_wav(path)
                if data.shape[1] == 1:
                    data = data[:, 0]
                return data.astype(dtype), sr

            sf.read = _sf_read
        if "numba" not in sys.modules:
            nb = types.ModuleType("numba")

            def _njit(*args, **kwargs):
                if args and callable(args[0]):
                    return args[0]
                return lambda f: f

            nb.njit = _njit
            nb.jit = _njit
            sys.modules["numba"] = nb
        import pygmu2 as ref  # noqa: PLC0415

        _ref_module = ref
        return ref
    except Exception:
        _failed = True
        return None

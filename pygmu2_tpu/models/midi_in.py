"""MidiInPE — live MIDI input bridge.

TPU-native rebuild of the reference MidiInPE (reference:
src/pygmu2/midi_in_pe.py:45-125): a mido input callback feeds a
thread-safe queue; once per rendered block the queue drains and the user
callback receives ``(block_start, message)``. Output is one channel of
silence — the PE exists for its side effects (driving a synth's event
state between blocks).

TPU adaptation: the drain runs through an ordered ``io_callback`` so it
fires per block even inside a scanned multi-block render, in timeline
order. ``feed()`` lets tests (or non-mido transports) inject messages.
"""

from __future__ import annotations

import queue
from typing import Callable

import numpy as np

import jax.numpy as jnp
from jax.experimental import io_callback

from pygmu2_tpu.core import prec
from pygmu2_tpu.core.extent import Extent
from pygmu2_tpu.core.processing_element import SourcePE

try:
    import mido
except ImportError:  # pragma: no cover - optional dependency
    mido = None


class MidiInPE(SourcePE):
    """Drains live MIDI messages into a user callback, block by block."""

    def __init__(
        self,
        port_name: str | None = None,
        callback: Callable | None = None,
        require_mido: bool = True,
    ):
        if mido is None and require_mido and port_name is not None:
            raise RuntimeError(
                "MidiInPE requires mido to open a hardware port. Install "
                "mido, or construct with port_name=None and feed() events."
            )
        self._port_name = port_name
        self._callback = callback
        self._message_queue: queue.Queue = queue.Queue()
        self._port = None

    def feed(self, message) -> None:
        """Thread-safe: inject a message as if it arrived from the port."""
        self._message_queue.put_nowait(message)

    def _mido_callback(self, msg) -> None:
        self._message_queue.put_nowait(msg)

    def _on_start(self) -> None:
        if mido is not None and self._port_name is not None:
            self._port = mido.open_input(
                name=self._port_name, callback=self._mido_callback
            )

    def _on_stop(self) -> None:
        if self._port is not None:
            self._port.close()
            self._port = None

    def _drain(self, block_start) -> np.ndarray:
        start = int(block_start)
        try:
            while True:
                msg = self._message_queue.get_nowait()
                if self._callback is not None:
                    self._callback(start, msg)
        except queue.Empty:
            pass
        return np.zeros((), np.int32)

    def is_pure(self) -> bool:
        return False

    def channel_count(self) -> int:
        return 1

    def _compute_extent(self) -> Extent:
        return Extent(None, None)

    def _trace(self, ctx):
        io_callback(
            self._drain,
            jnp.zeros((), jnp.int32),
            jnp.asarray(ctx.start, prec.INDEX),
            ordered=True,
        )
        return jnp.zeros((ctx.duration, 1), prec.AUDIO)

    def __repr__(self) -> str:
        name = repr(self._port_name) if self._port_name is not None else "default"
        return f"MidiInPE(port_name={name})"

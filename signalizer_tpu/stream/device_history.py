"""Device-resident presentation history — hop-only uploads for the tick loop.

The reference's views re-read the presentation stream's history ring *in
place* every render frame (ref: Source/Spectrum/SpectrumRendering.cpp:620-635
re-reading retained history; Source/Oscilloscope/OscilloscopeRendering.cpp
pulling ``audioStream`` views per frame) — samples are never copied per view.
The rebuild's :class:`~signalizer_tpu.session.AnalysisSession` previously
re-uploaded each view's full analysis window per tick — window bytes times
active views across the host->device link at UI cadence, even though almost
all of those samples were already on the device the tick before.

This module keeps ONE ``[channels, H]`` shift ring in device memory (the
:mod:`signalizer_tpu.stream.device_ring` primitives) fed by a presentation
stream listener:

* audio-cadence ``on_stream_audio`` callbacks buffer copies host-side (the
  delivery buffer is only valid during the callback);
* once per tick :meth:`sync` uploads *only the samples that arrived since
  the previous tick* (pow2-bucketed so the jit shape set stays bounded) and
  shifts them in with one donated dispatch;
* every view then reads its window as a static tail slice
  (:meth:`window`), sharing the same ring — ingest cost per tick scales
  with the audio rate, not ``window x views``.

Parity contract: ``window(n)`` equals
``AudioStreamOutput.get_history(n)`` bit-exactly (zero left-padding before
the stream has produced ``n`` samples, trailing alignment after), locked by
tests/test_device_history.py across ragged push patterns, overruns and
re-primes.
"""

from __future__ import annotations

import functools
import threading
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from signalizer_tpu.stream.device_ring import ring_update

#: donated single-dispatch ingest (ring' = last H of ring ++ new[:n_valid])
_ingest = jax.jit(ring_update, donate_argnums=(0,))


@functools.partial(jax.jit, static_argnames=("n", "lead", "pad_to"))
def _tail(ring: jax.Array, *, n: int, lead: int = 0, pad_to: int = 0):
    """Trailing window [..., n] of the ring, with optional leading axes and
    zero row-padding up to ``pad_to`` channels (the session's mono
    surrogate, applied in-graph so no host copy materializes)."""
    h = ring.shape[-1]
    t = jax.lax.slice_in_dim(ring, h - n, h, axis=-1)
    c = t.shape[0]
    if pad_to and c < pad_to:
        t = jnp.concatenate(
            [t, jnp.zeros((pad_to - c,) + t.shape[1:], t.dtype)], axis=0
        )
    for _ in range(lead):
        t = t[None]
    return t


class DevicePresentationHistory:
    """Shared device ring over one stream's presentation history.

    Attach to an :class:`~signalizer_tpu.stream.audio_stream.AudioStreamOutput`;
    call :meth:`sync` once per render tick from the consumer thread, then
    :meth:`window` per view. Detach with :meth:`close`.
    """

    def __init__(self, output, history: Optional[int] = None):
        self._output = output
        self._explicit_history = int(history) if history else None
        self._lock = threading.Lock()
        self._pending: List[np.ndarray] = []
        self._pending_n = 0
        self._overrun = False  # pending trimmed: ring must full-re-prime
        self._ring: Optional[jax.Array] = None
        self._channels = 0
        self._history = 0
        # audio fed BEFORE attach lives only in the host ring — snapshot it
        # now (before add_listener) so the first device window matches
        # get_history exactly. The stream writes its ring before it
        # delivers to listeners, so on synchronous streams this is exact;
        # on threaded streams a block in flight during this constructor
        # can be double-counted once (bounded, attach-time only).
        self._prefill: Optional[np.ndarray] = None
        if output.sample_clock > 0:
            ch, h = self._target_shape()
            self._prefill = np.array(output.get_history(h), np.float32)
        output.add_listener(self)

    # --- geometry ---------------------------------------------------------
    def _target_shape(self) -> tuple:
        info = self._output.info
        h = self._explicit_history or int(info.audio_history_capacity)
        return int(info.channels), max(int(h), 1)

    @property
    def history(self) -> int:
        """Ring length H (== the stream's history capacity by default)."""
        return self._target_shape()[1]

    # --- stream listener protocol ------------------------------------------
    def on_stream_audio(self, ctx, block) -> None:
        b = np.array(block, np.float32, copy=True)  # buffer dies after cb
        with self._lock:
            self._pending.append(b)
            self._pending_n += b.shape[-1]
            # bound host memory across long freezes / stalled consumers:
            # only the last H samples can ever reach the ring anyway
            cap = self.history
            while self._pending_n - self._pending[0].shape[-1] >= cap:
                self._pending_n -= self._pending.pop(0).shape[-1]
                self._overrun = True

    def on_stream_properties_changed(self, ctx, before) -> None:
        pass  # geometry re-checked lazily in sync()

    def on_stream_died(self, ctx) -> None:
        pass

    # --- consumer side ------------------------------------------------------
    def sync(self) -> jax.Array:
        """Upload everything that arrived since the last call; return the
        ring. One donated device dispatch per pow2 upload bucket."""
        with self._lock:
            parts, self._pending = self._pending, []
            n = self._pending_n
            self._pending_n = 0
            overrun, self._overrun = self._overrun, False

        ch, h = self._target_shape()
        if self._ring is None or self._channels != ch or self._history != h:
            # (re)build: topology/capacity changes re-prime from silence,
            # exactly like RingBuffer allocations host-side
            pre, self._prefill = self._prefill, None
            if pre is not None and pre.shape == (ch, h):
                self._ring = jnp.asarray(pre)
            else:
                self._ring = jnp.zeros((ch, h), jnp.float32)
            self._channels, self._history = ch, h
            overrun = False  # fresh ring, nothing stale to flush

        if n == 0:
            return self._ring

        data = np.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        if data.shape[0] != ch:  # channel-count race: rebuild next sync
            fixed = np.zeros((ch, data.shape[-1]), np.float32)
            fixed[: min(ch, data.shape[0])] = data[: min(ch, data.shape[0])]
            data = fixed
        if n > h or overrun:
            data = data[..., -h:]
            n = data.shape[-1]
        bucket = min(1 << (max(n, 1) - 1).bit_length(), h)
        if bucket == data.shape[-1]:
            buf = np.ascontiguousarray(data)
        else:
            buf = np.zeros((ch, bucket), np.float32)
            buf[:, :n] = data
        try:
            self._ring = _ingest(self._ring, buf, np.int32(n))
        except Exception:
            # a failed dispatch must not silently lose the popped samples,
            # and the donated ring buffer may already be invalidated —
            # drop the ring and re-arm the prefill snapshot from the host
            # ring (which still holds everything, including this upload's
            # samples), so the next sync rebuilds bit-exact. Holding the
            # lock across the snapshot keeps concurrent deliveries out of
            # the window (write-then-deliver ordering; same one-block
            # threaded-attach caveat as the constructor).
            with self._lock:
                self._pending.clear()
                self._pending_n = 0
                self._overrun = False
                self._ring = None
                self._channels = self._history = 0
                self._prefill = np.array(
                    self._output.get_history(h), np.float32
                )
            raise
        return self._ring

    def window(self, n: int, *, lead: int = 0, pad_to: int = 0) -> jax.Array:
        """Trailing device window [channels, n] (call after :meth:`sync`).
        ``lead`` prepends that many singleton axes; ``pad_to`` zero-pads the
        channel axis up to that many rows in-graph."""
        if self._ring is None:
            self.sync()
        n = int(n)
        if n > self._history:
            raise ValueError(f"window {n} exceeds device history {self._history}")
        return _tail(self._ring, n=n, lead=int(lead), pad_to=int(pad_to))

    def close(self) -> None:
        self._output.remove_listener(self)
        self._ring = None

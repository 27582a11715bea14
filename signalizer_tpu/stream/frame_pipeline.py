"""FramePipeline — depth-N in-flight dispatch pipelining.

The reference decouples DSP from display with a 10-deep lock-free frame
queue (ref: Spectrum::SFrameQueue, Source/Spectrum/Spectrum.h:139-143):
the audio thread keeps producing while the render thread consumes
whatever is ready, so neither ever waits on the other's latency. The
TPU-native embodiment: keep up to ``depth`` analysis steps in flight —
the host->device upload of frame t+1 overlaps the device compute of
frame t, and the consumer only ever touches outputs whose execution has
already completed (JAX arrays are futures; ``block_until_ready`` on the
oldest in-flight output is the completion signal and moves NO data —
important on remote transports where an eager device->host readback
degrades dispatch to synchronous round trips, see CLAUDE.md).

Usage::

    pipe = FramePipeline(step_fn, depth=4)
    for block in audio_blocks:
        done = pipe.submit(block)     # returns the oldest COMPLETED
        if done is not None:          # output once the pipe is full
            display(done)
    for done in pipe.drain():
        display(done)

``step_fn(state, frame) -> (output, new_state)`` must be jitted; state
is threaded internally (donation-safe: the pipeline never re-reads an
old state).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, List, Optional, Tuple

import jax


class FramePipeline:
    """Keep up to ``depth`` jitted steps in flight (ref: the 10-deep
    SFrameQueue; depth 4 covers upload/compute/download overlap without
    hoarding device buffers)."""

    def __init__(
        self,
        step_fn: Callable[[Any, Any], Tuple[Any, Any]],
        state: Any = None,
        *,
        depth: int = 4,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.step_fn = step_fn
        self.state = state
        self.depth = depth
        self._inflight: deque = deque()
        self.frames_submitted = 0
        self.frames_completed = 0

    def submit(self, frame) -> Optional[Any]:
        """Dispatch one frame asynchronously. Returns the oldest
        *completed* output once the pipeline is full, else None."""
        dev = jax.device_put(frame)  # async H2D — overlaps device compute
        out, self.state = self.step_fn(self.state, dev)
        self._inflight.append(out)
        self.frames_submitted += 1
        if len(self._inflight) >= self.depth:
            return self._pop()
        return None

    def _pop(self):
        out = self._inflight.popleft()
        jax.block_until_ready(out)
        self.frames_completed += 1
        return out

    @property
    def in_flight(self) -> int:
        return len(self._inflight)

    def drain(self) -> List[Any]:
        """Complete and return every in-flight output (end of stream)."""
        outs = []
        while self._inflight:
            outs.append(self._pop())
        return outs

    def run(self, frames: Iterable[Any]) -> Iterable[Any]:
        """Convenience: pipeline an iterable of frames, yielding outputs
        in submission order at steady-state depth."""
        for f in frames:
            done = self.submit(f)
            if done is not None:
                yield done
        yield from self.drain()

"""Frame batcher: continuous stream -> [T, C, window] device frame batches.

Replaces the reference's per-view streaming chunkers (the spectrogram's
blobSize accumulator, ref: Source/Spectrum/TransformDSP.inl:1163-1211
audioEntryPoint) with one host-side hopper: overlapping STFT-style framing
with arbitrary hop (hop < window = overlap, hop > window = gapped
spectrogram blobs), emitting *batches* of every complete frame since the
last pull so the device processes T frames per dispatch instead of one.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from signalizer_tpu.stream.ring_buffer import make_ring_buffer


class FrameBatcher:
    """Hopper over a ring buffer.

    Frames are ``window`` samples long; frame k covers samples
    ``[k*hop, k*hop + window)`` on the monotonic stream clock. ``pull()``
    returns all complete frames not yet emitted as one [T, C, window]
    batch (empty T=0 array when none).
    """

    def __init__(
        self,
        channels: int,
        window: int,
        hop: float,
        *,
        capacity: Optional[int] = None,
        dtype=np.float32,
    ):
        if window <= 0 or hop <= 0:
            raise ValueError("window and hop must be positive")
        self.window = window
        self.hop = float(hop)
        capacity = capacity or max(window * 4, int(hop * 4) + window)
        self.ring = make_ring_buffer(channels, capacity, dtype=dtype)
        self._next_frame = 0  # next frame index to emit
        self.dropped_frames = 0

    @property
    def channels(self) -> int:
        return self.ring.channels

    def push(self, block: np.ndarray) -> None:
        self.ring.write(block)

    def frames_ready(self) -> int:
        """Number of complete, not-yet-emitted frames."""
        clock = self.ring.sample_clock
        total = int(np.floor((clock - self.window) / self.hop)) + 1 if clock >= self.window else 0
        return max(0, total - self._next_frame)

    def pull(self, max_frames: Optional[int] = None) -> np.ndarray:
        """Emit ready frames as [T, C, window]; advances the cursor.

        Frames whose data already fell out of the ring are dropped (counted
        in ``dropped_frames`` — the reference exposes the same condition via
        its perf counters, ref: AudioStream getPerfMeasures droppedFrames).
        """
        t = self.frames_ready()
        if max_frames is not None:
            t = min(t, max_frames)
        if t == 0:
            return np.zeros((0, self.ring.channels, self.window), np.float32)
        if hasattr(self.ring, "frame_gather"):  # native bulk path
            out = self.ring.frame_gather(self._next_frame, t, self.hop, self.window)
            self.dropped_frames += t - out.shape[0]
            self._next_frame += t
            return out
        out = np.zeros((t, self.ring.channels, self.window), np.float32)
        emitted = 0
        for k in range(self._next_frame, self._next_frame + t):
            end_clock = int(round(k * self.hop)) + self.window
            try:
                out[emitted] = self.ring.read_at(end_clock, self.window)
                emitted += 1
            except ValueError:
                self.dropped_frames += 1
        self._next_frame += t
        if emitted < t:
            out = out[:emitted]
        return out

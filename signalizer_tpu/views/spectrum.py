"""SpectrumProcessor — the stateful public face of the spectrum view.

Plays the role of the reference's ``Spectrum`` processor + ``TransformPair``
pair (ref: Source/Spectrum/Spectrum.h, SpectrumDSP.cpp:61-227): owns the
Constant, carries the per-pair line-graph filter states across calls, and
exposes a batched jitted step. Rendering (OpenGL in the reference) is out of
scope — outputs are render-ready arrays.

TPU shape conventions:
* ``pairs``: the number of channel pairs analyzed in parallel (the
  reference's ``parallel_for`` over pairs, SpectrumDSP.cpp:83) — the batch
  axis.
* ``process(frames)`` with frames ``[pairs, T, 2, window]`` treats T as
  *time-sequential* (decay state threads through) and pairs as parallel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from signalizer_tpu.core.constant import SpectrumConstant, make_spectrum_constant
from signalizer_tpu.kernels.spectrum import (
    LineGraphState,
    SpectrumResult,
    analyze_frames,
    init_line_graph_state,
)


@functools.partial(jax.jit, static_argnums=(), donate_argnums=(1,))
def _step(constant: SpectrumConstant, state: LineGraphState, frames: jax.Array) -> SpectrumResult:
    """Jitted forward step. The decay state is donated: at high frame rates
    this is a pure in-place update on device (no HBM churn)."""
    return analyze_frames(constant, state, frames)


class SpectrumProcessor:
    """Stateful wrapper: constant + carried decay state + jitted step."""

    def __init__(self, constant: SpectrumConstant, pairs: int = 1):
        self.constant = constant
        self.pairs = pairs
        self._state = init_line_graph_state(constant, (pairs,))

    @classmethod
    def create(cls, *, pairs: int = 1, **constant_kwargs) -> "SpectrumProcessor":
        return cls(make_spectrum_constant(**constant_kwargs), pairs=pairs)

    @property
    def state(self) -> LineGraphState:
        return self._state

    def reset(self) -> None:
        """Clear filter states (ref: resetState semantics)."""
        self._state = init_line_graph_state(self.constant, (self.pairs,))

    def reconfigure(self, constant: SpectrumConstant) -> None:
        """Swap the Constant (ref: handleFlagUpdates rebuild,
        Spectrum.cpp:351-616). Resets state when shapes changed."""
        same_shape = (
            constant.axis_points == self.constant.axis_points
            and constant.state_channels == self.constant.state_channels
            and constant.num_line_graphs == self.constant.num_line_graphs
        )
        self.constant = constant
        if not same_shape:
            self.reset()

    def process(self, frames) -> jax.Array:
        """frames [pairs, T, 2, window] -> display results
        [pairs, T, K, rows, P]; decay state carries across calls."""
        frames = jnp.asarray(frames, dtype=jnp.float32)
        if frames.ndim == 3:  # [pairs, C, W] -> single time step
            frames = frames[:, None]
        result = _step(self.constant, self._state, frames)
        self._state = result.state
        return result.results

    def process_to_host(self, frames) -> np.ndarray:
        return np.asarray(self.process(frames))

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

import jax
import jax.numpy as jnp
import numpy as np

from signalizer_tpu.core.constant import SpectrumConstant, make_spectrum_constant
from signalizer_tpu.kernels.spectrum import (
    LineGraphState,
    SpectrumResult,
    analyze_frames,
    init_line_graph_state,
    post_process,
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
        """Current decay state. NOTE: ``process`` donates these buffers to
        XLA — a reference held across the next ``process`` call points at
        deleted device memory. Read (``np.asarray``) before processing
        again, or copy with ``jax.tree_util.tree_map(jnp.copy, ...)``."""
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


# ---------------------------------------------------------------------------
# RSNT algorithm path (ref: TransformDSP.inl:1213-1295 resonatingDispatch)
# ---------------------------------------------------------------------------


class ResonatorSpectrumProcessor:
    """Spectrum view driven by the resonator bank instead of the FFT
    (ref: TransformAlgorithm::RSNT). Consumes a *continuous* sample stream
    (no framing); per block: channel-mode mix -> resonate -> windowed
    readout -> peak decay -> dB.

    Channel packing per resonatingDispatch: Mid = L + R and Side = L - R
    (the RSNT path does NOT halve, unlike the FFT path's prepareTransform).
    """

    def __init__(
        self,
        constant: SpectrumConstant,
        *,
        pairs: int = 1,
        window_type=None,
        free_q: bool = False,
    ):
        from signalizer_tpu.core.windows import WindowType
        from signalizer_tpu.kernels.resonator import (
            init_resonator_state,
            make_resonator_constant,
        )

        self.constant = constant
        self.pairs = pairs
        self.rows = constant.state_channels
        from signalizer_tpu.core.constant import host_view

        self.resonator = make_resonator_constant(
            np.asarray(host_view(constant, "mapped_frequencies"), np.float64),
            constant.sample_rate,
            constant.window_size,
            window_type=window_type if window_type is not None else WindowType.HANN,
            free_q=free_q,
        )
        self._res_state = init_resonator_state(self.resonator, (pairs, self.rows))
        self._graph_state = init_line_graph_state(constant, (pairs,))

    def reset(self) -> None:
        from signalizer_tpu.kernels.resonator import init_resonator_state

        self._res_state = init_resonator_state(self.resonator, (self.pairs, self.rows))
        self._graph_state = init_line_graph_state(self.constant, (self.pairs,))

    def _mix(self, block: jax.Array) -> jax.Array:
        """[pairs, 2, n] -> [pairs, rows, n] per resonatingDispatch."""
        from signalizer_tpu.core.config import SpectrumChannels

        cfg = self.constant.configuration
        left, right = block[:, 0], block[:, 1]
        if cfg == SpectrumChannels.LEFT:
            return left[:, None]
        if cfg == SpectrumChannels.RIGHT:
            return right[:, None]
        if cfg == SpectrumChannels.MERGE:
            return (left + right)[:, None]
        if cfg == SpectrumChannels.SIDE:
            return (left - right)[:, None]
        if cfg == SpectrumChannels.MIDSIDE:
            # ref quirk: RSNT MidSide packs (side, mid) in that order
            # (TransformDSP.inl:1277: pair{left - right, left + right})
            return jnp.stack([left - right, left + right], axis=1)
        return block[:, :2]  # PHASE / SEPARATE / COMPLEX

    def process(self, block) -> jax.Array:
        """block [pairs, 2, n] -> display results [pairs, 1, K, rows, P]."""
        from signalizer_tpu.kernels.resonator import resonate_block, resonator_readout

        block = jnp.asarray(block, jnp.float32)
        mixed = self._mix(block)
        self._res_state = resonate_block(self.resonator, self._res_state, mixed)
        mags = resonator_readout(self.resonator, self._res_state)  # [pairs, rows, P]
        vals = mags[:, None]  # one time step: [pairs, T=1, rows, P]
        result = post_process(self.constant, self._graph_state, vals)
        self._graph_state = result.state
        return result.results

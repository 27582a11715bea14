"""ShardedAnalysisPipeline — end-to-end multi-chip analysis driver.

Production wrapper over :mod:`signalizer_tpu.parallel.mesh`'s fused step:
host-side ingest (ring + hopper) feeds fixed-size frame batches, sharded
over the device mesh's ``data`` axis (channel pairs — the framework's
scaling axis, matching the reference's pairs ``parallel_for``,
ref: SpectrumDSP.cpp:83 / SURVEY.md §2.10), through the fused
spectrum + waveform + envelope + meters step. Filter state lives sharded
on its chip across ticks; the only cross-chip traffic is the diagnostic
``pmax``.

A fixed ``frames_per_tick`` keeps one compiled executable (dynamic batch
sizes would recompile per distinct T — XLA static-shape rule); ticks
fire when a full batch is ready.

Usage::

    mesh = make_analysis_mesh()           # all chips
    pipe = ShardedAnalysisPipeline(constant, pairs=64, mesh=mesh)
    pipe.push(block_64_pairs)             # [128, n] interleaved pairs
    out = pipe.tick()                     # None until a batch is ready
    out.results / out.waveform / out.global_peak
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from signalizer_tpu.core.constant import SpectrumConstant
from signalizer_tpu.kernels.oscilloscope import sinc_resample_matrix
from signalizer_tpu.kernels.vectorscope import init_meter_state
from signalizer_tpu.parallel.mesh import (
    make_analysis_mesh,
    init_sharded_state,
    shard_batch,
    sharded_fused_step,
)
from signalizer_tpu.stream.batcher import FrameBatcher


class PipelineOutput(NamedTuple):
    """One tick's sharded outputs (jax arrays, sharded over pairs except
    the scalar diagnostic)."""

    results: jax.Array  # [pairs, T, K, rows, P] spectrum display values
    waveform: jax.Array  # [pairs, T, pixels] resampled first-channel wave
    envelope_min: jax.Array  # [pairs, T, pixels]
    envelope_max: jax.Array
    correlation: jax.Array  # [pairs, T, W] per-sample stereo correlation
    global_peak: jax.Array  # [] cross-chip pmax diagnostic


class ShardedAnalysisPipeline:
    """Multi-chip analysis over many channel pairs."""

    def __init__(
        self,
        constant: SpectrumConstant,
        *,
        pairs: int,
        mesh: Optional[Mesh] = None,
        pixels: int = 1024,
        frames_per_tick: int = 4,
        overlap: float = 0.0,
    ):
        self.mesh = mesh if mesh is not None else make_analysis_mesh()
        n_dev = self.mesh.devices.size
        if pairs % n_dev != 0:
            raise ValueError(f"pairs ({pairs}) must divide over {n_dev} devices")
        self.constant = constant
        self.pairs = pairs
        self.pixels = pixels
        self.frames_per_tick = int(frames_per_tick)
        w = constant.window_size
        resample_m = sinc_resample_matrix(w, 0.0, w / pixels, pixels)
        self._step = sharded_fused_step(
            constant, jnp.asarray(resample_m), self.mesh, pixels=pixels
        )
        hop = max(1.0, w * (1.0 - overlap))
        self.batcher = FrameBatcher(
            pairs * 2, w, hop, capacity=max(w * 4, int(hop * (frames_per_tick + 2)))
        )
        self._state = init_sharded_state(constant, pairs, self.mesh)
        self._vstate = shard_batch(init_meter_state((pairs,)), self.mesh)
        self.ticks = 0

    def push(self, block: np.ndarray) -> None:
        """Feed interleaved pair audio [pairs*2, n]."""
        self.batcher.push(block)

    def ready(self) -> bool:
        return self.batcher.frames_ready() >= self.frames_per_tick

    def tick(self) -> Optional[PipelineOutput]:
        """Run one fused sharded step when a full batch is ready."""
        if not self.ready():
            return None
        t = self.frames_per_tick
        frames = self.batcher.pull(t)  # [T, pairs*2, W]
        if frames.shape[0] < t:
            # frames scrolled out of the ring under backpressure: zero-pad
            # to keep the compiled shape (drops are counted by the batcher)
            pad = np.zeros((t - frames.shape[0],) + frames.shape[1:], np.float32)
            frames = np.concatenate([frames, pad], axis=0)
        stacked = (
            frames.reshape(t, self.pairs, 2, self.constant.window_size)
            .transpose(1, 0, 2, 3)
            .copy()
        )
        frames_dev = shard_batch(jnp.asarray(stacked), self.mesh)
        (results, wave, mins, maxs, corr, self._state, self._vstate, peak) = self._step(
            self._state, self._vstate, frames_dev
        )
        self.ticks += 1
        return PipelineOutput(
            results=results,
            waveform=wave,
            envelope_min=mins,
            envelope_max=maxs,
            correlation=corr,
            global_peak=peak,
        )

    @property
    def meter_state(self):
        """Sharded vectorscope meter state (chip-resident)."""
        return self._vstate

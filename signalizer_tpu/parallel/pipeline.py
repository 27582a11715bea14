"""ShardedAnalysisPipeline — end-to-end multi-chip analysis driver.

Production wrapper over :mod:`signalizer_tpu.parallel.mesh`: host-side
ingest feeds fixed-size batches, sharded over the device mesh's ``data``
axis (channel pairs — the framework's scaling axis, matching the
reference's pairs ``parallel_for``, ref: SpectrumDSP.cpp:83 /
SURVEY.md §2.10), through the selected view's sharded step. Filter state
lives sharded on its chip across ticks; the only cross-chip traffic is
each step's diagnostic reduction (and the spectrogram's pair-blend psum).

One parameterization covers every view (the reference parallelizes all
views over pairs — CHANGELOG 0.4.0):

* ``view="fused"`` (default): spectrum + waveform resample + min-max
  envelopes + stereo meters in one step (bench cfg5 shape);
* ``view="spectrum"``: the plain spectrum step;
* ``view="spectrogram"``: colour columns with the cross-chip pair blend;
* ``view="oscilloscope"``: trigger + resample over a rolling history;
* ``view="vectorscope"``: vertices + meters over a rolling history.

Framed views (fused/spectrum/spectrogram) ingest via a hopper; a fixed
``frames_per_tick`` keeps one compiled executable (dynamic batch sizes
would recompile per distinct T — XLA static-shape rule); ticks fire when
a full batch is ready. Scope views (oscilloscope/vectorscope) ingest
into a rolling ring and analyze the latest window every tick.

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
    sharded_oscilloscope_step,
    sharded_spectrogram_step,
    sharded_spectrum_step,
    sharded_vectorscope_step,
)
from signalizer_tpu.stream.batcher import FrameBatcher
from signalizer_tpu.stream.ring_buffer import make_ring_buffer

FRAMED_VIEWS = ("fused", "spectrum", "spectrogram")
SCOPE_VIEWS = ("oscilloscope", "vectorscope")


class PipelineOutput(NamedTuple):
    """One fused tick's sharded outputs (jax arrays, sharded over pairs
    except the scalar diagnostic)."""

    results: jax.Array  # [pairs, T, K, rows, P] spectrum display values
    waveform: jax.Array  # [pairs, T, pixels] resampled first-channel wave
    envelope_min: jax.Array  # [pairs, T, pixels]
    envelope_max: jax.Array
    correlation: jax.Array  # [pairs, T, W] per-sample stereo correlation
    global_peak: jax.Array  # [] cross-chip pmax diagnostic


class SpectrumOutput(NamedTuple):
    results: jax.Array  # [pairs, T, K, rows, P]
    global_peak: jax.Array


class SpectrogramOutput(NamedTuple):
    columns: jax.Array  # [T, P, 4] RGBA8, pairs blended, replicated
    # (the cross-chip psum blend is the one data collective)


class OscilloscopeOutput(NamedTuple):
    frame: object  # OscilloscopeFrame (fields sharded over pairs)
    global_level: jax.Array


class VectorscopeOutput(NamedTuple):
    frame: object  # VectorscopeFrame (fields sharded over pairs)
    global_level: jax.Array


class ShardedAnalysisPipeline:
    """Multi-chip analysis over many channel pairs, any view."""

    def __init__(
        self,
        constant: Optional[SpectrumConstant] = None,
        *,
        pairs: int,
        mesh: Optional[Mesh] = None,
        view: str = "fused",
        pixels: int = 1024,
        frames_per_tick: int = 4,
        overlap: float = 0.0,
        # spectrogram
        colours: Optional[np.ndarray] = None,
        ratios: Optional[np.ndarray] = None,
        # oscilloscope
        osc_constant=None,
        window_samples: float = 1024.0,
        history_samples: int = 16384,
        # vectorscope
        envelope_pole: float = 0.999,
        stereo_pole: float = 0.99,
        user_gain: float = 1.0,
        peak_coeff: float = 0.99,
        vs_mode=None,
        vs_autogain=None,
        rotation: float = 0.0,
        scale_to_fill: bool = False,
    ):
        if view not in FRAMED_VIEWS + SCOPE_VIEWS:
            raise ValueError(f"unknown view {view!r}")
        self.mesh = mesh if mesh is not None else make_analysis_mesh()
        n_dev = self.mesh.devices.size
        if pairs % n_dev != 0:
            raise ValueError(f"pairs ({pairs}) must divide over {n_dev} devices")
        self.view = view
        self.pairs = pairs
        self.pixels = pixels
        self.frames_per_tick = int(frames_per_tick)
        self.ticks = 0
        self._last_clock = 0

        if view in ("fused", "spectrum", "spectrogram"):
            if constant is None:
                raise ValueError(f"view {view!r} needs a SpectrumConstant")
            self.constant = constant
            w = constant.window_size
            hop = max(1.0, w * (1.0 - overlap))
            self.batcher = FrameBatcher(
                pairs * 2, w, hop, capacity=max(w * 4, int(hop * (frames_per_tick + 2)))
            )
            self._state = init_sharded_state(constant, pairs, self.mesh)
            if view == "fused":
                resample_m = sinc_resample_matrix(w, 0.0, w / pixels, pixels)
                self._step = sharded_fused_step(
                    constant, resample_m, self.mesh, pixels=pixels
                )
                self._vstate = shard_batch(init_meter_state((pairs,)), self.mesh)
            elif view == "spectrum":
                self._step = sharded_spectrum_step(constant, self.mesh)
            else:  # spectrogram
                from signalizer_tpu.kernels.colormap import normalize_ratios
                from signalizer_tpu.views.spectrogram import (
                    DEFAULT_GRADIENT,
                    DEFAULT_RATIOS,
                    SpectrogramProcessor,
                )

                base = np.asarray(
                    colours if colours is not None else DEFAULT_GRADIENT, np.float32
                )
                if base.ndim == 2:
                    # one table -> per-pair hue rotation, matching the
                    # single-device SpectrogramProcessor (ref:
                    # generateSpectrogramColourRotation) so the sharded
                    # blend renders identically
                    base = np.stack(
                        [
                            SpectrogramProcessor._rotate(base, p, pairs)
                            for p in range(pairs)
                        ]
                    )
                self._colours = shard_batch(jnp.asarray(base), self.mesh)
                self._ratios = jnp.asarray(
                    normalize_ratios(ratios if ratios is not None else DEFAULT_RATIOS),
                    jnp.float32,
                )
                self._step = sharded_spectrogram_step(constant, self.mesh)
        elif view == "oscilloscope":
            from signalizer_tpu.views.oscilloscope import (
                OscilloscopeProcessor,
                make_oscilloscope_constant,
            )

            self.osc_constant = (
                osc_constant if osc_constant is not None else make_oscilloscope_constant()
            )
            self.window_samples = float(window_samples)
            self.history_samples = int(history_samples)
            self.ring = make_ring_buffer(pairs * 2, self.history_samples)
            proc = OscilloscopeProcessor(self.osc_constant, pairs=pairs)
            self._state = shard_batch(proc.state, self.mesh)
            self._step = sharded_oscilloscope_step(
                self.osc_constant, self.mesh, pairs=pairs if pairs > 1 else None
            )
        else:  # vectorscope
            from signalizer_tpu.views.vectorscope import AutoGain, OperationalMode

            self.history_samples = int(history_samples)
            self.ring = make_ring_buffer(pairs * 2, self.history_samples)
            self._state = shard_batch(init_meter_state((pairs,)), self.mesh)
            self._peak_env = shard_batch(jnp.zeros((pairs, 2), jnp.float32), self.mesh)
            self._vs_scalars = tuple(
                jnp.float32(v) for v in (envelope_pole, stereo_pole, user_gain, peak_coeff)
            )
            self._step = sharded_vectorscope_step(
                self.mesh,
                mode=vs_mode if vs_mode is not None else OperationalMode.LISSAJOUS,
                autogain=vs_autogain if vs_autogain is not None else AutoGain.PEAK_DECAY,
                rotation=rotation,
                scale_to_fill=scale_to_fill,
            )

    # --- ingest -------------------------------------------------------------
    def push(self, block: np.ndarray) -> None:
        """Feed interleaved pair audio [pairs*2, n]."""
        if self.view in FRAMED_VIEWS:
            self.batcher.push(block)
        else:
            self.ring.write(np.asarray(block, np.float32))

    def ready(self) -> bool:
        if self.view in FRAMED_VIEWS:
            return self.batcher.frames_ready() >= self.frames_per_tick
        return self.ring.valid_samples > 0

    # --- tick ---------------------------------------------------------------
    def tick(self, transport_position: float = 0.0):
        """Run one sharded step; None until the ingest has enough audio.

        ``transport_position`` (oscilloscope view): the playhead position
        in samples — TriggerMode.WINDOW scrolls the display against it
        (views/oscilloscope.py:osc_step_impl real_offset; without it the
        window pins to the history end, review finding)."""
        if not self.ready():
            return None
        if self.view in FRAMED_VIEWS:
            frames_dev, valid = self._pull_framed()
            if self.view == "fused":
                (results, wave, mins, maxs, corr,
                 self._state, self._vstate, peak) = self._step(
                    self._state, self._vstate, frames_dev, valid
                )
                out = PipelineOutput(results, wave, mins, maxs, corr, peak)
            elif self.view == "spectrum":
                results, self._state, peak = self._step(
                    self._state, frames_dev, valid
                )
                out = SpectrumOutput(results, peak)
            else:
                cols, self._state = self._step(
                    self._state, frames_dev, self._colours, self._ratios, valid
                )
                out = SpectrogramOutput(cols)
        else:
            hist = self.ring.latest(self.history_samples)  # [pairs*2, H]
            clock = self.ring.sample_clock
            new = max(0, clock - self._last_clock)
            self._last_clock = clock
            stacked = hist.reshape(self.pairs, 2, -1)
            hist_dev = shard_batch(jnp.asarray(stacked), self.mesh)
            if self.view == "oscilloscope":
                frame, self._state, level = self._step(
                    self._state,
                    hist_dev,
                    jnp.float32(self.window_samples),
                    jnp.float32(transport_position),
                    jnp.float32(min(new, self.history_samples)),
                )
                out = OscilloscopeOutput(frame, level)
            else:
                ep, sp, ug, pc = self._vs_scalars
                frame, self._state, self._peak_env, level = self._step(
                    self._state, self._peak_env, hist_dev, ep, sp, ug, pc,
                    # meters see each sample once across overlapping
                    # rolling-window reads (audio-callback cadence)
                    jnp.float32(min(new, self.history_samples)),
                )
                out = VectorscopeOutput(frame, level)
        self.ticks += 1
        return out

    def _pull_framed(self):
        t = self.frames_per_tick
        frames = self.batcher.pull(t)  # [T, pairs*2, W]
        real = frames.shape[0]
        if real < t:
            # frames scrolled out of the ring under backpressure: zero-pad
            # to keep the compiled shape (drops are counted by the batcher)
            pad = np.zeros((t - real,) + frames.shape[1:], np.float32)
            frames = np.concatenate([frames, pad], axis=0)
        stacked = (
            frames.reshape(t, self.pairs, 2, self.constant.window_size)
            .transpose(1, 0, 2, 3)
            .copy()
        )
        # padded slots must not advance the filter states (the step masks
        # them); replicated [T] bool
        valid = jnp.asarray(np.arange(t) < real)
        return shard_batch(jnp.asarray(stacked), self.mesh), valid

    @property
    def meter_state(self):
        """Sharded vectorscope meter state (chip-resident; fused and
        vectorscope views)."""
        v = getattr(self, "_vstate", None)
        if v is not None:
            return v
        return self._state if self.view == "vectorscope" else None

"""OscilloscopeProcessor — the stateful public face of the oscilloscope.

Plays the role of the reference's Oscilloscope StreamState + render-thread
trigger analysis + drawWavePlot (ref: Source/Oscilloscope/Oscilloscope.cpp,
OscilloscopeDSP.inl, OscilloscopeRendering.cpp:560-891). Rendering is out
of scope; outputs are render-ready pixel-space arrays.

Design difference from the reference (deliberate): the reference's
EnvelopeHold/ZeroCrossing modes chop the *stream* with a double-buffer swap
state machine (StreamPreprocessing.h:78-206) that has known concurrency
bugs (reference Source/Notes/Bugs.txt). Here the processor reads windows
out of a continuous history tensor and *centers the display window on the
latest detected trigger* — same observable behavior (a trigger-locked,
hold-style display), no buffer swaps, no races, and it batches across
channel pairs.
"""

from __future__ import annotations

import enum
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from signalizer_tpu.core.config import OscChannels
from signalizer_tpu.kernels.filters import (
    CrossoverState,
    init_crossover_state,
    three_band_split,
)
from signalizer_tpu.kernels.oscilloscope import (
    BinRecord,
    INTERPOLATION_KERNEL_SIZE,
    MEDIAN_FILTER_SIZE,
    zero_crossing_triggers,
    linear_resample,
    median_record_filter,
    minmax_decimate,
    peak_hold_triggers,
    sinc_resample,
    spectral_colour_track,
    spectral_fundamental,
    trigger_phase_offset,
)


class TriggerMode(enum.IntEnum):
    """ref: OscilloscopeParameters.h:50-58."""

    NONE = 0
    SPECTRAL = 1
    WINDOW = 2
    ENVELOPE_HOLD = 3
    ZERO_CROSSING = 4


class SubSampleInterpolation(enum.IntEnum):
    """ref: OscilloscopeParameters.h sampleInterpolation."""

    NONE = 0
    RECTANGULAR = 1
    LINEAR = 2
    LANCZOS = 3


class OscilloscopeState(NamedTuple):
    """Carried device state."""

    peak_env: jax.Array  # [pairs, rows] autogain peak envelope
    peak_hold_state: jax.Array  # [pairs] envelope-hold tracker
    peak_holding: jax.Array  # [pairs] bool
    median_history: jax.Array  # [pairs, 8] past fundamental omegas
    crossover: CrossoverState  # [pairs, rows, ...] colour network states
    colour_smooth: jax.Array  # [pairs, rows, 3] band smoothing states


class OscilloscopeFrame(NamedTuple):
    """Render-ready outputs."""

    waveform: jax.Array  # [pairs, rows, pixels] resampled values (gain applied)
    envelope_min: jax.Array  # [pairs, rows, pixels] min-max decimation
    envelope_max: jax.Array
    colours: jax.Array  # [pairs, rows, pixels, 3]
    gain: jax.Array  # [pairs]
    fundamental: jax.Array  # [pairs] (spectral mode; else 0)
    trigger_found: jax.Array  # [pairs] bool


def _pack_rows(frames: jax.Array, mode: OscChannels) -> jax.Array:
    """history [pairs, 2, H] -> display rows [pairs, rows, H]
    (ref: SampleColourEvaluators.h channel-mode evaluators)."""
    left = frames[..., 0, :]
    right = frames[..., 1, :]
    if mode == OscChannels.LEFT:
        return left[..., None, :]
    if mode == OscChannels.RIGHT:
        return right[..., None, :]
    if mode == OscChannels.MERGE:
        return ((left + right) * 0.5)[..., None, :]
    if mode == OscChannels.SIDE:
        return ((left - right) * 0.5)[..., None, :]
    if mode == OscChannels.SEPARATE:
        return frames
    if mode == OscChannels.MIDSIDE:
        return jnp.stack([(left + right) * 0.5, (left - right) * 0.5], axis=-2)
    raise ValueError(mode)


class OscilloscopeProcessor:
    """Stateful oscilloscope engine over batched channel pairs.

    ``process(history)`` takes a [pairs, 2, H] history tensor (newest
    sample last; H static) and returns an :class:`OscilloscopeFrame`.
    """

    def __init__(
        self,
        *,
        pairs: int = 1,
        sample_rate: float = 48_000.0,
        channel_mode: OscChannels = OscChannels.SEPARATE,
        trigger_mode: TriggerMode = TriggerMode.NONE,
        interpolation: SubSampleInterpolation = SubSampleInterpolation.LANCZOS,
        window_samples: float = 1024.0,  # effectiveWindowSize
        pixels: int = 1024,
        lookahead: int = 8192,  # spectral transform size
        trigger_threshold: float = 0.0,
        trigger_hysteresis: float = 0.0,
        trigger_phase_degrees: float = 0.0,
        autogain: bool = False,
        autogain_decay_pole: float = 0.9999,
        colour_enabled: bool = False,
        colour_smooth_ms: float = 10.0,
        band_colours=((1.0, 0.1, 0.1), (0.1, 1.0, 0.1), (0.1, 0.1, 1.0)),
        key_colour=(1.0, 1.0, 1.0),
        colour_blend: float = 1.0,
        manual_gain: float = 1.0,
        trigger_channel: int = 0,
    ):
        self.pairs = pairs
        self.sample_rate = sample_rate
        self.channel_mode = OscChannels(channel_mode)
        self.trigger_mode = TriggerMode(trigger_mode)
        self.interpolation = SubSampleInterpolation(interpolation)
        self.window_samples = float(window_samples)
        self.pixels = pixels
        self.lookahead = lookahead
        self.trigger_threshold = float(trigger_threshold)
        self.trigger_hysteresis = float(trigger_hysteresis)
        self.trigger_phase_degrees = float(trigger_phase_degrees)
        self.autogain = autogain
        self.autogain_decay_pole = float(autogain_decay_pole)
        self.colour_enabled = colour_enabled
        # ref: SmoothedParameterState-designed pole over colour_smooth_ms
        n = max(colour_smooth_ms * 1e-3 * sample_rate, 1.0)
        self.colour_smooth_pole = float(np.exp(-1.0 / n))
        self.band_colours = np.asarray(band_colours, np.float32)
        self.key_colour = np.asarray(key_colour, np.float32)
        self.colour_blend = float(colour_blend)
        self.manual_gain = float(manual_gain)
        self.trigger_channel = int(trigger_channel)
        self.rows = 2 if self.channel_mode in (OscChannels.SEPARATE, OscChannels.MIDSIDE) else 1
        self._state = self._init_state()

    def _init_state(self) -> OscilloscopeState:
        pairs, rows = self.pairs, self.rows
        return OscilloscopeState(
            peak_env=jnp.zeros((pairs, rows), jnp.float32),
            peak_hold_state=jnp.full((pairs,), self.trigger_threshold**2, jnp.float32),
            peak_holding=jnp.zeros((pairs,), bool),
            median_history=jnp.full((pairs, MEDIAN_FILTER_SIZE), -1.0, jnp.float32),
            crossover=init_crossover_state((pairs, rows)),
            colour_smooth=jnp.zeros((pairs, rows, 3), jnp.float32),
        )

    @property
    def state(self) -> OscilloscopeState:
        return self._state

    def reset(self) -> None:
        self._state = self._init_state()

    def process(self, history, transport_position: float = 0.0) -> OscilloscopeFrame:
        history = jnp.asarray(history, jnp.float32)
        frame, self._state = _osc_step(
            self._state,
            history,
            jnp.asarray(self.window_samples, jnp.float32),
            jnp.asarray(transport_position, jnp.float32),
            channel_mode=self.channel_mode,
            trigger_mode=self.trigger_mode,
            interpolation=self.interpolation,
            pixels=self.pixels,
            lookahead=self.lookahead,
            sample_rate=self.sample_rate,
            threshold=self.trigger_threshold,
            hysteresis=self.trigger_hysteresis,
            phase_degrees=self.trigger_phase_degrees,
            autogain=self.autogain,
            autogain_pole=self.autogain_decay_pole,
            colour_enabled=self.colour_enabled,
            colour_pole=self.colour_smooth_pole,
            band_colours=tuple(map(tuple, self.band_colours.tolist())),
            key_colour=tuple(self.key_colour.tolist()),
            colour_blend=self.colour_blend,
            manual_gain=self.manual_gain,
            trigger_channel=self.trigger_channel,
        )
        return frame


@functools.partial(
    jax.jit,
    static_argnames=(
        "channel_mode",
        "trigger_mode",
        "interpolation",
        "pixels",
        "lookahead",
        "sample_rate",
        "threshold",
        "hysteresis",
        "phase_degrees",
        "autogain",
        "autogain_pole",
        "colour_enabled",
        "colour_pole",
        "band_colours",
        "key_colour",
        "colour_blend",
        "manual_gain",
        "trigger_channel",
    ),
)
def _osc_step(
    state: OscilloscopeState,
    history: jax.Array,
    window: jax.Array,
    transport_position: jax.Array,
    *,
    channel_mode: OscChannels,
    trigger_mode: TriggerMode,
    interpolation: SubSampleInterpolation,
    pixels: int,
    lookahead: int,
    sample_rate: float,
    threshold: float,
    hysteresis: float,
    phase_degrees: float,
    autogain: bool,
    autogain_pole: float,
    colour_enabled: bool,
    colour_pole: float,
    band_colours,
    key_colour,
    colour_blend: float,
    manual_gain: float,
    trigger_channel: int = 0,
) -> Tuple[OscilloscopeFrame, OscilloscopeState]:
    pairs, _, h = history.shape
    rows = _pack_rows(history, channel_mode)  # [pairs, rows, H]
    # trigger channel selection (ref: calculateTriggerIndices,
    # OscilloscopeParameters.h:491-505)
    trig_src = rows[:, trigger_channel % rows.shape[1], :]
    hf = jnp.asarray(float(h), jnp.float32)
    window = jnp.minimum(window, hf)

    fundamental = jnp.zeros((pairs,), jnp.float32)
    found = jnp.ones((pairs,), bool)
    new_median = state.median_history
    new_ph_state = state.peak_hold_state
    new_holding = state.peak_holding

    # --- trigger: fractional sample offset from the end of history --------
    if trigger_mode == TriggerMode.ZERO_CROSSING or trigger_mode == TriggerMode.ENVELOPE_HOLD:
        la = min(lookahead, h)
        region = trig_src[..., h - la :]
        if trigger_mode == TriggerMode.ZERO_CROSSING:
            fires = zero_crossing_triggers(region, threshold)
        else:
            fires, new_ph_state, new_holding = peak_hold_triggers(
                region, threshold, hysteresis, state.peak_hold_state, state.peak_holding
            )
        # take the most recent trigger that still has a full half-window of
        # samples after it (the reference swaps buffers only once the half
        # window following the trigger is complete, StreamPreprocessing.h:78)
        fidx = jnp.arange(la, dtype=jnp.float32)
        pos_ok = (h - la) + fidx <= hf - window * 0.5
        last = jnp.max(jnp.where(fires & pos_ok, fidx, -1.0), axis=-1)
        found = last >= 0
        trigger_pos = (h - la) + jnp.maximum(last, 0.0)
        # center the window on the trigger; clamp into the history
        start = trigger_pos - (window - 1.0) * 0.5
        start = jnp.clip(start, 0.0, hf - window)
        start = jnp.where(found, start, hf - window)
    elif trigger_mode == TriggerMode.SPECTRAL:
        la = min(lookahead, h)
        region = trig_src[..., h - la :]
        fundamental, cycles, record = spectral_fundamental(
            region, sample_rate, threshold=threshold, hysteresis=hysteresis
        )
        new_median, record, _ = median_record_filter(state.median_history, record)
        fundamental = sample_rate * jnp.maximum(record.omega(), 5.0 * la / sample_rate) / la
        cycles = sample_rate / fundamental
        sample_offset = trigger_phase_offset(
            region,
            record.omega(),
            cycles,
            window,
            sample_rate,
            fundamental,
            record.offset,
            phase_degrees,
        )
        # anchor one cycle before the window end, then advance by the
        # phase-derived offset so x=0 lands on a fixed waveform phase
        # (ref: bufferOffset = roundedWindow + quantizedCycleSamples and the
        # -sampleOffset x-shift, OscilloscopeRendering.cpp:604-613)
        start = hf - window - cycles + sample_offset
        start = jnp.clip(start, 0.0, hf - window)
    elif trigger_mode == TriggerMode.WINDOW:
        # window-synced scroll (ref: OscilloscopeRendering.cpp:587-592)
        real_offset = jnp.mod(transport_position, window)
        start = jnp.clip(hf - window - real_offset, 0.0, hf - window)
        start = jnp.broadcast_to(start, (pairs,))
    else:
        start = jnp.broadcast_to(hf - window, (pairs,))

    start = jnp.broadcast_to(start, (pairs,))
    step = (window - 1.0) / max(pixels - 1, 1)
    step = jnp.broadcast_to(step, (pairs,))

    # --- resample rows to pixel space --------------------------------------
    start_r = start[:, None]
    step_r = step[:, None]
    if interpolation == SubSampleInterpolation.LANCZOS:
        wave = sinc_resample(rows, start_r, step_r, pixels, INTERPOLATION_KERNEL_SIZE)
    elif interpolation == SubSampleInterpolation.LINEAR:
        wave = linear_resample(rows, start_r, step_r, pixels)
    else:  # NONE / RECTANGULAR: nearest sample
        p = jnp.arange(pixels, dtype=jnp.float32)
        pos = start_r + p * step_r[..., :1]  # [pairs, P]
        idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, h - 1)
        idx = jnp.broadcast_to(idx[:, None, :], rows.shape[:-1] + (pixels,))
        wave = jnp.take_along_axis(rows, idx, axis=-1)

    env_min, env_max = minmax_decimate(rows, pixels)

    # --- autogain (ref: runPeakFilter, OscilloscopeDSP.inl:712-886) --------
    if autogain:
        peaks = jnp.max(jnp.abs(rows), axis=-1)  # [pairs, rows]
        new_peak_env = jnp.maximum(state.peak_env * autogain_pole, peaks**2)
        g = 1.0 / jnp.sqrt(jnp.max(new_peak_env, axis=-1))
        gain = jnp.where(jnp.isfinite(g) & (g > 0), g, 1.0) * manual_gain
    else:
        new_peak_env = state.peak_env
        gain = jnp.full((pairs,), manual_gain, jnp.float32)

    wave = wave * gain[:, None, None]

    # --- colouring ----------------------------------------------------------
    if colour_enabled:
        bands, new_xover = three_band_split(rows, sample_rate, state=state.crossover)
        colours, new_smooth = spectral_colour_track(
            bands,
            colour_pole,
            jnp.asarray(band_colours, jnp.float32),
            jnp.asarray(key_colour, jnp.float32),
            colour_blend,
            state.colour_smooth,
        )  # [pairs, rows, H, 3]
        # resample colour track to pixels (nearest)
        p = jnp.arange(pixels, dtype=jnp.float32)
        pos = start_r[..., None] + p * step_r[..., None]  # [pairs, rows?, P]
        idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, h - 1)  # [pairs, 1?, P]
        idx = jnp.broadcast_to(idx[:, :1, :], (pairs, colours.shape[1], pixels))
        pix_colours = jnp.take_along_axis(colours, idx[..., None], axis=-2)
    else:
        new_xover = state.crossover
        new_smooth = state.colour_smooth
        pix_colours = jnp.broadcast_to(
            jnp.asarray(key_colour, jnp.float32),
            (pairs, rows.shape[1], pixels, 3),
        )

    frame = OscilloscopeFrame(
        waveform=wave,
        envelope_min=env_min * gain[:, None, None],
        envelope_max=env_max * gain[:, None, None],
        colours=pix_colours,
        gain=gain,
        fundamental=fundamental,
        trigger_found=found,
    )
    new_state = OscilloscopeState(
        peak_env=new_peak_env,
        peak_hold_state=new_ph_state,
        peak_holding=new_holding,
        median_history=new_median,
        crossover=new_xover,
        colour_smooth=new_smooth,
    )
    return frame, new_state

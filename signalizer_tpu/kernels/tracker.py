"""Frequency tracker: peak search, parabolic refinement, semitone display.

Equivalent of the reference's cursor frequency tracker
(ref: Source/Spectrum/SpectrumRendering.cpp:377-470 drawFrequencyTracking —
nearest-peak search within a +-3% window with boundary ascent, parabolic
log-domain 3-point interpolation per JOS/PARSHL, scalloping-loss estimate
via SpectrumDSP.cpp:258-318; frequencyToSemitone :59-73; peak smoothing
SmoothedPeakState, Spectrum.h:405-459).

Host-side numpy: the tracker runs once per UI frame on one row of bins —
there is nothing to batch. Kept beside the kernels because its math must
agree with the device pipeline's scaling conventions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

SEMITONE_NAMES = ("C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B")


@dataclass
class PeakResult:
    fraction: float  # peak position as fraction of the half spectrum
    frequency: float  # Hz
    dbs: float  # parabolic-refined magnitude in dB
    bin_index: int


def track_peak(
    magnitudes: np.ndarray,
    sample_rate: float,
    cursor_fraction: float,
    *,
    inv_size: float = 1.0,
    search_tolerance: float = 0.03,
) -> PeakResult:
    """Find the spectral peak nearest the cursor.

    ``magnitudes``: linear bin magnitudes [N/2+1] (pre inv_size scaling);
    ``cursor_fraction``: cursor position in [0, 1] over the half spectrum.
    Search window is +-``search_tolerance`` of the spectrum around the
    cursor (ref: the +-3%% window), with boundary ascent: when the max sits
    on the window edge, walk outward uphill so a nearby larger peak is not
    cut in half (ref: SpectrumRendering.cpp:395-424).
    """
    mags = np.asarray(magnitudes, np.float64)
    n = len(mags)
    center = int(round(cursor_fraction * (n - 1)))
    half_window = max(1, int(round(search_tolerance * n)))
    lo = max(0, center - half_window)
    hi = min(n, center + half_window + 1)

    peak = lo + int(np.argmax(mags[lo:hi] ** 2))
    if peak == lo:
        while peak > 0 and mags[peak - 1] ** 2 >= mags[peak] ** 2:
            peak -= 1
    elif peak == hi - 1:
        while peak < n - 1 and mags[peak + 1] ** 2 >= mags[peak] ** 2:
            peak += 1

    # parabolic refinement in dB domain (JOS/PARSHL)
    def db_at(i: int) -> float:
        v = abs(mags[min(max(i, 0), n - 1)]) * inv_size
        return 20.0 * math.log10(v) if v > 0 else -400.0

    alpha = db_at(peak - 1)
    beta = db_at(peak)
    gamma = db_at(peak + 1)
    denom = alpha - 2.0 * beta + gamma
    phi = 0.5 * (alpha - gamma) / denom if denom != 0 and math.isfinite(denom) else 0.0
    if not math.isfinite(phi):
        phi = 0.0
    fraction = (peak + phi) / (n - 1)
    peak_dbs = beta - 0.25 * (alpha - gamma) * phi
    if not math.isfinite(peak_dbs):
        peak_dbs = beta
    return PeakResult(
        fraction=fraction,
        frequency=fraction * sample_rate * 0.5,
        dbs=peak_dbs,
        bin_index=peak,
    )


def frequency_to_semitone(frequency: float, a4_reference: float = 440.0) -> str:
    """Note name + octave + cents detune (ref: frequencyToSemitone,
    SpectrumRendering.cpp:59-73; expressed in the standard MIDI note
    convention — A4 = 69 — rather than the reference's piano-key math)."""
    if not math.isfinite(frequency) or frequency <= 0:
        return "nan"
    midi = 69.0 + 12.0 * math.log2(abs(frequency / a4_reference))
    rounded = round(midi)
    semitone_index = rounded % 12
    octave = rounded // 12 - 1
    detune_cents = round(1000 * (midi - rounded)) * 0.1
    return f"{SEMITONE_NAMES[semitone_index]}{octave}{detune_cents:+.1f}c"


def scalloping_loss_at(
    window_kernel: np.ndarray, bin_fraction: float
) -> float:
    """Scalloping loss (linear gain) at a fractional bin offset
    (ref: getScallopingLossAtCoordinate, SpectrumDSP.cpp:258-318 — the
    tracker corrects displayed magnitudes for the window's off-center
    attenuation)."""
    from signalizer_tpu.core.windows import window_dtft_gain

    frac = bin_fraction - math.floor(bin_fraction + 0.5)
    return window_dtft_gain(np.asarray(window_kernel, np.float64), abs(frac))


class SmoothedPeakState:
    """Peak display smoothing (ref: SmoothedPeakState, Spectrum.h:405-459):
    one-pole lag on frequency and dB, with a confidence fade when the
    tracked peak disappears."""

    def __init__(self, smoothing_pole: float = 0.9):
        self.pole = float(smoothing_pole)
        self._freq: Optional[float] = None
        self._dbs: Optional[float] = None

    def update(self, peak: PeakResult) -> Tuple[float, float]:
        if self._freq is None:
            self._freq, self._dbs = peak.frequency, peak.dbs
        else:
            self._freq = peak.frequency + self.pole * (self._freq - peak.frequency)
            self._dbs = peak.dbs + self.pole * (self._dbs - peak.dbs)
        return self._freq, self._dbs

    def reset(self) -> None:
        self._freq = self._dbs = None

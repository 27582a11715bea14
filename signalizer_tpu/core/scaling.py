"""Scalar scaling helpers: dB conversion, unity-scale maps, decay poles.

Reimplements the semantics of cpl's Mathext helpers as used by the reference
(ref: cpl Math::dbToFraction / UnityScale usage throughout Source/). These
run both on the host (numpy, parameter transforms) and inside jitted kernels
(jnp arrays) — they are written dtype/backend-agnostic.
"""

from __future__ import annotations

import numpy as np


def db_to_fraction(db):
    """Amplitude dB → linear fraction: 10^(db/20)."""
    return 10.0 ** (np.asarray(db) / 20.0) if isinstance(db, (int, float, np.ndarray)) else 10.0 ** (db / 20.0)


def fraction_to_db(fraction):
    """Linear amplitude fraction → dB: 20*log10(f)."""
    import math

    if isinstance(fraction, (int, float)):
        return 20.0 * math.log10(fraction)
    return 20.0 * np.log10(fraction)


def unity_scale_linear(x, lo, hi):
    """Map normalized x in [0,1] linearly onto [lo, hi]."""
    return lo + x * (hi - lo)


def unity_scale_linear_inv(y, lo, hi):
    return (y - lo) / (hi - lo)


def unity_scale_exp(x, lo, hi):
    """Map normalized x in [0,1] exponentially onto [lo, hi] (lo, hi > 0)."""
    return lo * (hi / lo) ** x


def unity_scale_exp_inv(y, lo, hi):
    # backend-dispatching log: jnp for jax arrays/tracers (np.log would
    # read a device array back to the host, or fail on a tracer), np for
    # host scalars/arrays (math.log would reject arrays outright)
    import numpy as np

    import jax

    log = jax.numpy.log if isinstance(y, jax.Array) else np.log
    return log(y / lo) / log(np.asarray(hi / lo))


def peak_decay_pole(decay_seconds: float, frames_per_second: float, fraction: float = 0.1) -> float:
    """One-pole peak-decay coefficient.

    Designed so the filter output decays to ``fraction`` of its value in
    ``decay_seconds`` at the given frame rate (ref: cpl CPeakFilter
    setSampleRate/setDecayAsFraction usage at Source/Spectrum/Spectrum.cpp:392-393;
    cpl sources absent, semantics defined here: pole = fraction^(1/(t*fps))).
    """
    if decay_seconds <= 0.0 or frames_per_second <= 0.0:
        return 0.0
    return float(fraction ** (1.0 / (decay_seconds * frames_per_second)))


def smoothing_pole(window_ms: float, sample_rate: float) -> float:
    """One-pole smoother coefficient from a time-constant in milliseconds
    (ref: cpl dsp::SmoothedParameterState::design usage, e.g.
    Source/Vectorscope/Vectorscope.cpp:199-202). Defined as the pole that
    decays to 1/e over ``window_ms``."""
    if window_ms <= 0.0:
        return 0.0
    n = window_ms * 1e-3 * sample_rate
    return float(np.exp(-1.0 / max(n, 1e-9)))

"""Golden regression snapshots.

Locks the numerical behavior of the spectrum pipeline across refactors
(SURVEY.md §4: golden-frame comparisons). Goldens live in
tests/golden/*.npz; delete a file and run the test to regenerate after an
*intentional* behavior change.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from signalizer_tpu.core.config import (
    BinInterpolation,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.core.constant import make_spectrum_constant
from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state

GOLDEN_DIR = Path(__file__).parent / "golden"

CASES = {
    "spectrum_left_log_linear1024": dict(
        axis_points=200,
        window_size=1024,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    ),
    "spectrum_phase_lanczos": dict(
        axis_points=160,
        window_size=512,
        configuration=SpectrumChannels.PHASE,
        bin_interpolation=BinInterpolation.LANCZOS,
        view_scaling=ViewScaling.LINEAR,
    ),
    "spectrum_midside_none": dict(
        axis_points=128,
        window_size=2048,
        configuration=SpectrumChannels.MIDSIDE,
        bin_interpolation=BinInterpolation.NONE,
        view_scaling=ViewScaling.LOGARITHMIC,
    ),
    "spectrum_complex_linear": dict(
        axis_points=160,
        window_size=1024,
        configuration=SpectrumChannels.COMPLEX,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
    ),
}


def _input(window):
    rng = np.random.default_rng(2026)
    t = np.arange(window)
    left = (
        0.5 * np.sin(2 * np.pi * 441.0 * t / 48_000.0)
        + 0.1 * np.sin(2 * np.pi * 3333.0 * t / 48_000.0)
        + 0.01 * rng.standard_normal(window)
    )
    right = 0.3 * np.sin(2 * np.pi * 441.0 * t / 48_000.0 + 0.5)
    return np.stack([left, right]).astype(np.float32)[None, None]


@pytest.mark.parametrize("name", list(CASES))
def test_golden(name):
    kw = CASES[name]
    constant = make_spectrum_constant(sample_rate=48_000.0, **kw)
    frames = _input(constant.window_size)
    state = init_line_graph_state(constant, (1,))
    result = analyze_frames(constant, state, jnp.asarray(frames))
    got = np.asarray(result.results)[0, 0, 0].astype(np.float32)

    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        np.savez_compressed(path, results=got)
        pytest.skip(f"golden regenerated: {path}")
    want = np.load(path)["results"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_golden_resonator():
    """Lock the resonator bank's readout for a fixed two-tone input."""
    from signalizer_tpu.kernels.resonator import (
        init_resonator_state,
        make_resonator_constant,
        resonate_block,
        resonator_readout,
    )

    freqs = np.linspace(100.0, 12_000.0, 96)
    constant = make_resonator_constant(freqs, 48_000.0, window_size=1024)
    t = np.arange(4096)
    x = (
        0.7 * np.sin(2 * np.pi * freqs[24] * t / 48_000.0)
        + 0.2 * np.sin(2 * np.pi * freqs[72] * t / 48_000.0)
    ).astype(np.float32)
    state = init_resonator_state(constant)
    state = resonate_block(constant, state, jnp.asarray(x))
    got = np.asarray(resonator_readout(constant, state)).astype(np.float32)

    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / "resonator_two_tone.npz"
    if not path.exists():
        np.savez_compressed(path, results=got)
        pytest.skip(f"golden regenerated: {path}")
    want = np.load(path)["results"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

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


def test_golden_oscilloscope_spectral_frame():
    """Locks the oscilloscope's spectral-trigger + sinc-resample +
    autogain output (the heaviest view path) across refactors."""
    from signalizer_tpu.core.config import OscChannels
    from signalizer_tpu.views.oscilloscope import (
        AutoGain,
        OscilloscopeProcessor,
        SubSampleInterpolation,
        TriggerMode,
    )

    path = GOLDEN_DIR / "oscilloscope_spectral_frame.npz"
    rng = np.random.default_rng(11)
    t = np.arange(8192)
    x = (0.4 * np.sin(2 * np.pi * 441.3 * t / 48_000.0)
         + 0.1 * np.sin(2 * np.pi * 1323.9 * t / 48_000.0)
         + 0.01 * rng.standard_normal(8192)).astype(np.float32)
    hist = np.stack([x, np.roll(x, 3)])[None]
    proc = OscilloscopeProcessor(
        pairs=1,
        channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.SPECTRAL,
        interpolation=SubSampleInterpolation.LANCZOS,
        window_samples=700.0,
        pixels=160,
        lookahead=4096,
        autogain=AutoGain.RMS,
        envelope_window_ms=50.0,
        colour_enabled=True,
    )
    frame = proc.process(hist)
    frame = proc.process(hist)  # settled state
    got = dict(
        waveform=np.asarray(frame.waveform),
        colours=np.asarray(frame.colours),
        gain=np.asarray(frame.gain),
        fundamental=np.asarray(frame.fundamental),
    )
    if not path.exists():
        np.savez_compressed(path, **got)
        pytest.skip("golden regenerated")
    want = np.load(path)
    for key, val in got.items():
        np.testing.assert_allclose(val, want[key], atol=2e-5, err_msg=key)


def test_golden_line_graph_vertex_feed():
    """Locks the line-graph vertex feed (strips + floods + grids)."""
    from signalizer_tpu.views.content import SpectrumContent
    from signalizer_tpu.views.spectrum import SpectrumProcessor

    path = GOLDEN_DIR / "line_graph_feed.npz"
    content = SpectrumContent()
    content.channel_configuration.set_normalized(5 / 7)  # separate
    for k in range(2):
        content.lines[k][1].set_rgba((0.1, 0.9, 0.2, 1.0))
        content.lines[k][2].set_rgba((0.9, 0.2, 0.1, 1.0))
    proc = SpectrumProcessor.create(
        pairs=2, axis_points=96, window_size=512,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LANCZOS,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    rng = np.random.default_rng(5)
    results = proc.process(rng.standard_normal((2, 1, 2, 512)).astype(np.float32) * 0.4)
    feed = content.make_render_feed(proc.constant, pairs=2)
    frame = feed.build(np.asarray(results[:, -1]))
    got = dict(
        strip0=frame.strips[0].vertices,
        strip_last=frame.strips[-1].vertices,
        strip0_colour=frame.strips[0].colour,
        flood0=frame.floods[0].vertices,
        grid_pos=np.asarray([g.position for g in frame.grid]),
        db_pos=np.asarray([g.position for g in frame.db_grid]),
    )
    if not path.exists():
        np.savez_compressed(path, **got)
        pytest.skip("golden regenerated")
    want = np.load(path)
    for key, val in got.items():
        np.testing.assert_allclose(val, want[key], atol=1e-6, err_msg=key)

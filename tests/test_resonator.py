"""Resonator bank: unity calibration, selectivity, block equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from signalizer_tpu.core.windows import WindowType
from signalizer_tpu.kernels.resonator import (
    init_resonator_state,
    make_resonator_constant,
    resonate_block,
    resonator_readout,
)

FS = 48_000.0


def _run(constant, x, chunks=1):
    state = init_resonator_state(constant)
    n = len(x) // chunks
    for i in range(chunks):
        state = resonate_block(constant, state, jnp.asarray(x[i * n : (i + 1) * n]))
    return state


def test_sine_reads_unity_at_its_pixel():
    freqs = np.linspace(100.0, 10_000.0, 64)
    constant = make_resonator_constant(freqs, FS, window_size=2048)
    f = freqs[20]
    t = np.arange(8192)
    x = np.sin(2 * np.pi * f * t / FS).astype(np.float32)
    state = _run(constant, x)
    mags = np.asarray(resonator_readout(constant, state))
    assert abs(mags[20] - 1.0) < 0.02
    # off pixels read much lower (window selectivity)
    assert mags[40] < 0.05 and mags[5] < 0.05


def test_per_sample_recurrence_equivalence():
    """Block closed form == naive per-sample recurrence."""
    freqs = np.asarray([440.0, 1000.0])
    constant = make_resonator_constant(freqs, FS, window_size=256)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(300).astype(np.float32)

    state_pairs = np.asarray(_run(constant, x))
    state = state_pairs[..., 0] + 1j * state_pairs[..., 1]
    pole_pairs = np.asarray(constant.poles)
    poles = pole_pairs[..., 0] + 1j * pole_pairs[..., 1]
    want = np.zeros_like(state)
    for s in x.astype(np.float64):
        want = want * poles + s
    np.testing.assert_allclose(state, want, rtol=2e-3, atol=2e-3)


def test_chunked_equals_single_block():
    freqs = np.linspace(200, 5000, 16)
    constant = make_resonator_constant(freqs, FS, window_size=512)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1024).astype(np.float32)
    s1 = np.asarray(_run(constant, x, chunks=1))
    s4 = np.asarray(_run(constant, x, chunks=4))
    np.testing.assert_allclose(s1, s4, rtol=2e-3, atol=1e-3)


def test_free_q_constant_cycles():
    """free_q: low pixels integrate longer windows than high pixels."""
    freqs = np.asarray([100.0, 1000.0, 10_000.0])
    c = make_resonator_constant(freqs, FS, window_size=65536, free_q=True, min_cycles=8)
    pole_pairs = np.asarray(c.poles)
    radii = np.abs(pole_pairs[..., 0] + 1j * pole_pairs[..., 1])[:, c.vectors // 2]
    n_eff = 2.0 / (1.0 - radii)
    # ~8 cycles each
    np.testing.assert_allclose(n_eff * freqs / FS, 8.0, rtol=0.05)


def test_batched_resonate():
    freqs = np.linspace(100, 4000, 8)
    constant = make_resonator_constant(freqs, FS, window_size=512)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 512)).astype(np.float32)
    state = init_resonator_state(constant, (3,))
    state = resonate_block(constant, state, jnp.asarray(x))
    assert state.shape == (3, 8, constant.vectors, 2)  # (re, im) pairs
    # each batch row independent
    s0 = resonate_block(constant, init_resonator_state(constant), jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(s0), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wt", [WindowType.RECTANGULAR, WindowType.HANN, WindowType.BLACKMAN])
def test_windows_calibrated(wt):
    freqs = np.linspace(500, 8000, 32)
    constant = make_resonator_constant(freqs, FS, window_size=1024, window_type=wt)
    f = freqs[16]
    t = np.arange(8192)
    x = np.sin(2 * np.pi * f * t / FS).astype(np.float32)
    mags = np.asarray(resonator_readout(constant, _run(constant, x)))
    assert abs(mags[16] - 1.0) < 0.03, wt


def test_resonator_spectrum_processor_end_to_end():
    """RSNT view path: a sine reads 1.0 normalized dB at its own pixel."""
    from signalizer_tpu.core.config import (
        SpectrumChannels,
        TransformAlgorithm,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import make_spectrum_constant
    from signalizer_tpu.views.spectrum import ResonatorSpectrumProcessor

    c = make_spectrum_constant(
        axis_points=64,
        window_size=1024,
        configuration=SpectrumChannels.LEFT,
        view_scaling=ViewScaling.LINEAR,
        algo=TransformAlgorithm.RESONATOR,
    )
    p = ResonatorSpectrumProcessor(c, pairs=1)
    t = np.arange(4096)
    f = float(np.asarray(c.mapped_frequencies)[16])
    x = np.sin(2 * np.pi * f * t / FS).astype(np.float32)
    blk = np.stack([x, np.zeros_like(x)])[None]
    for i in range(4):
        r = p.process(blk[:, :, i * 1024 : (i + 1) * 1024])
    row = np.asarray(r)[0, 0, 0, 0]
    assert int(np.argmax(row)) == 16
    assert abs(float(row[16]) - 1.0) < 0.01

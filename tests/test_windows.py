"""Window family vs scipy oracles (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest
from scipy.signal import windows as sw

from signalizer_tpu.core.windows import (
    WindowType,
    generate_window,
    window_scallop_loss,
    window_dtft_gain,
    FINITE_DFT_WINDOWS,
)

SCIPY_EQUIV = {
    WindowType.HANN: lambda n, sym: sw.hann(n, sym=sym),
    WindowType.HAMMING: lambda n, sym: sw.general_hamming(n, 0.54, sym=sym),
    WindowType.BLACKMAN: lambda n, sym: sw.blackman(n, sym=sym),
    # scipy's "nuttall" is the minimum 4-term Blackman-Harris per Nuttall,
    # i.e. our BLACKMAN_NUTTALL; our NUTTALL is the continuous-derivative
    # Nuttall4c variant.
    WindowType.BLACKMAN_NUTTALL: lambda n, sym: sw.nuttall(n, sym=sym),
    WindowType.BLACKMAN_HARRIS: lambda n, sym: sw.blackmanharris(n, sym=sym),
    WindowType.TRIANGULAR: lambda n, sym: sw.bartlett(n, sym=sym),
    WindowType.PARZEN: lambda n, sym: sw.parzen(n, sym=sym),
}


@pytest.mark.parametrize("wtype", list(SCIPY_EQUIV))
@pytest.mark.parametrize("sym", [True, False])
def test_matches_scipy(wtype, sym):
    n = 256
    kernel, _ = generate_window(wtype, n, symmetric=sym)
    expected = SCIPY_EQUIV[wtype](n, sym)
    np.testing.assert_allclose(kernel, expected, atol=1e-12)


def test_kaiser_matches_scipy():
    kernel, _ = generate_window(WindowType.KAISER, 512, beta=8.0)
    np.testing.assert_allclose(kernel, sw.kaiser(512, 8.0, sym=True), atol=1e-9)


def test_flattop_is_flat():
    # flat-top: worst-case scalloping loss must be < 0.05 dB
    loss = window_scallop_loss(WindowType.FLAT_TOP, 4096)
    assert 20 * np.log10(loss) > -0.05


def test_hann_scallop_loss():
    # classical value: Hann scalloping loss ~= -1.42 dB
    loss_db = 20 * np.log10(window_scallop_loss(WindowType.HANN, 8192))
    assert abs(loss_db - (-1.42)) < 0.03


@pytest.mark.parametrize("wtype", list(WindowType))
def test_scale_is_reciprocal_coherent_gain(wtype):
    kernel, scale = generate_window(wtype, 333)
    np.testing.assert_allclose(scale, len(kernel) / kernel.sum(), rtol=1e-12)


@pytest.mark.parametrize("wtype", FINITE_DFT_WINDOWS)
def test_sine_normalization(wtype):
    """A full-scale sine on an exact bin must read 1.0 with the
    invSize = scale/(N*0.5) convention (ref: TransformDSP.inl:537-540)."""
    n = 1024
    kernel, scale = generate_window(wtype, n, symmetric=False)
    k = 128
    t = np.arange(n)
    x = np.sin(2 * np.pi * k * t / n)
    mag = np.abs(np.fft.rfft(x * kernel))[k]
    inv_size = scale / (n * 0.5)
    np.testing.assert_allclose(mag * inv_size, 1.0, rtol=1e-9)


def test_dtft_gain_at_zero_is_unity():
    kernel, _ = generate_window(WindowType.BLACKMAN, 1024)
    np.testing.assert_allclose(window_dtft_gain(kernel, 0.0), 1.0, rtol=1e-12)

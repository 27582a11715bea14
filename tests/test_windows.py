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


def test_dtft_gain_matches_zero_padded_fft():
    """window_dtft_gain against an INDEPENDENT evaluation route: a
    zero-padded FFT samples the DTFT (the old at-zero check was an
    identity of the formula, true for any kernel)."""
    kernel, _ = generate_window(WindowType.BLACKMAN, 256, symmetric=False)
    pad = 1 << 14
    spec = np.abs(np.fft.rfft(kernel, n=pad))
    for off in (0.0, 0.25, 0.5, 1.0):
        want = spec[int(round(off * pad / 256))] / spec[0]
        np.testing.assert_allclose(window_dtft_gain(kernel, off), want, rtol=1e-3)


# literature coefficients (Nuttall 1981 Table; Wikipedia "Window function")
_NUTTALL4C = (0.355768, 0.487396, 0.144232, 0.012604)  # continuous 1st deriv
_EXACT_BLACKMAN = (0.42659, 0.49656, 0.076849)


@pytest.mark.parametrize("wtype,coeffs", [
    (WindowType.NUTTALL, _NUTTALL4C),
    (WindowType.EXACT_BLACKMAN, _EXACT_BLACKMAN),
])
def test_cosine_coefficients_match_literature(wtype, coeffs):
    """Shape oracle from the published coefficient tables — a typo'd
    coefficient cannot hide behind the self-derived scale check."""
    n = 512
    kernel, _ = generate_window(wtype, n, symmetric=True)
    t = np.arange(n)
    want = np.zeros(n)
    for k, a in enumerate(coeffs):
        want += ((-1.0) ** k) * a * np.cos(2 * np.pi * k * t / (n - 1))
    np.testing.assert_allclose(kernel, want, atol=5e-5)


def test_welch_shape_literature():
    """Welch: the parabola 1 - ((n - (N-1)/2) / ((N-1)/2))^2."""
    n = 333
    kernel, _ = generate_window(WindowType.WELCH, n, symmetric=True)
    half = (n - 1) / 2.0
    want = 1.0 - ((np.arange(n) - half) / half) ** 2
    np.testing.assert_allclose(kernel, want, atol=1e-12)
    assert kernel[0] == 0.0 and kernel[n // 2] == 1.0


def test_gaussian_matches_scipy():
    n, alpha = 256, 2.5
    kernel, _ = generate_window(WindowType.GAUSSIAN, n, symmetric=True, alpha=alpha)
    std = (n - 1) / (2.0 * alpha)
    np.testing.assert_allclose(kernel, sw.gaussian(n, std, sym=True), atol=1e-12)


def test_lanczos_matches_scipy():
    n = 256
    kernel, _ = generate_window(WindowType.LANCZOS, n, symmetric=True)
    if hasattr(sw, "lanczos"):
        np.testing.assert_allclose(kernel, sw.lanczos(n, sym=True), atol=1e-12)
    else:  # literature form: sinc over [-1, 1]
        want = np.sinc(2.0 * np.arange(n) / (n - 1) - 1.0)
        np.testing.assert_allclose(kernel, want, atol=1e-12)

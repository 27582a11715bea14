"""Smoke tests for the optional matplotlib viewer."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from signalizer_tpu.views.render import (
    render_oscilloscope,
    render_spectrogram,
    render_spectrum,
    render_vectorscope,
)


def test_render_spectrum(tmp_path):
    f = np.geomspace(10, 24000, 200)
    row = np.random.default_rng(0).random(200)
    out = render_spectrum(row, f, path=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").stat().st_size > 1000


def test_render_vectorscope(tmp_path):
    from signalizer_tpu.views.vectorscope import VectorscopeProcessor

    proc = VectorscopeProcessor(pairs=1)
    frame = proc.process(np.random.default_rng(1).standard_normal((1, 2, 256)).astype(np.float32) * 0.5)
    render_vectorscope(frame, path=str(tmp_path / "v.png"))
    assert (tmp_path / "v.png").stat().st_size > 1000


def test_render_oscilloscope_and_spectrogram(tmp_path):
    from signalizer_tpu.views.oscilloscope import OscilloscopeProcessor
    from signalizer_tpu.views.spectrogram import SpectrogramImage

    proc = OscilloscopeProcessor(pairs=1, pixels=64, window_samples=512.0)
    frame = proc.process(np.zeros((1, 2, 8192), np.float32))
    render_oscilloscope(frame, path=str(tmp_path / "o.png"))
    img = SpectrogramImage(16, 8)
    img.push_columns(np.random.default_rng(2).integers(0, 255, (5, 8, 4)).astype(np.uint8))
    render_spectrogram(img, path=str(tmp_path / "g.png"))
    assert (tmp_path / "o.png").exists() and (tmp_path / "g.png").exists()

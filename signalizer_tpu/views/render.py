"""Optional lightweight offline viewer (matplotlib).

The reference renders with OpenGL inside a plugin window; this framework
emits render-ready arrays (SURVEY.md §2.8 "rebuild exposes arrays +
optional lightweight viewer"). This module is that viewer: static renders
of each view's output for notebooks, debugging and golden-image tests.
matplotlib is imported lazily so the core framework has no hard
dependency on it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def render_spectrum(
    results: np.ndarray,
    mapped_frequencies: np.ndarray,
    *,
    low_dbs: float = -96.0,
    high_dbs: float = 0.0,
    path: Optional[str] = None,
    labels: Optional[Sequence[str]] = None,
):
    """Line-graph spectrum: results [rows, P] normalized display values."""
    plt = _plt()
    results = np.atleast_2d(np.asarray(results))
    f = np.asarray(mapped_frequencies)
    fig, ax = plt.subplots(figsize=(10, 4), dpi=100)
    for i, row in enumerate(results):
        dbs = low_dbs + np.clip(row, 0, 1) * (high_dbs - low_dbs)
        ax.plot(f, dbs, lw=0.8, label=labels[i] if labels else None)
    ax.set_xscale("log" if f[0] > 0 and f[-1] / max(f[0], 1e-3) > 50 else "linear")
    ax.set_xlabel("Hz")
    ax.set_ylabel("dB")
    ax.set_ylim(low_dbs, high_dbs)
    ax.grid(True, alpha=0.3)
    if labels:
        ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
        return path
    return fig


def render_oscilloscope(frame, *, path: Optional[str] = None):
    """OscilloscopeFrame -> waveform plot with min/max envelope."""
    plt = _plt()
    wave = np.asarray(frame.waveform)
    lo = np.asarray(frame.envelope_min)
    hi = np.asarray(frame.envelope_max)
    pairs, rows, p = wave.shape
    fig, axes = plt.subplots(rows, 1, figsize=(10, 2.2 * rows), dpi=100, squeeze=False)
    x = np.arange(p)
    colours = np.asarray(frame.colours)
    for r in range(rows):
        ax = axes[r, 0]
        ax.fill_between(x, lo[0, r], hi[0, r], alpha=0.15, color="C0")
        ax.plot(x, wave[0, r], lw=0.8, color=tuple(np.clip(colours[0, r, p // 2], 0, 1)))
        ax.set_ylim(-1.1, 1.1)
        ax.grid(True, alpha=0.3)
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
        return path
    return fig


def render_vectorscope(frame, *, mode: str = "lissajous", path: Optional[str] = None):
    """VectorscopeFrame -> point cloud + meter bars."""
    plt = _plt()
    v = np.asarray(frame.vertices)[0]
    fig, ax = plt.subplots(figsize=(5.5, 5.5), dpi=100)
    age = (v[:, 2] + 1.0).clip(0, 1)
    ax.scatter(v[:, 0], v[:, 1], s=1.0, c=age, cmap="viridis", alpha=0.7)
    ax.set_xlim(-1.1, 1.1)
    ax.set_ylim(-1.1, 1.1)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    bal = float(np.asarray(frame.balance)[0, 0])
    corr = float(np.asarray(frame.correlation_bars)[0, 0])
    ax.set_title(f"balance {bal:.2f}  correlation {corr:.2f}", fontsize=9)
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
        return path
    return fig


def render_spectrogram(image, *, path: Optional[str] = None):
    """SpectrogramImage (or [W, P, 4] array) -> image render."""
    plt = _plt()
    img = image.snapshot() if hasattr(image, "snapshot") else np.asarray(image)
    fig, ax = plt.subplots(figsize=(10, 4), dpi=100)
    # [time, freq, rgba] -> display freq on y, low at bottom
    ax.imshow(np.transpose(img, (1, 0, 2))[::-1], aspect="auto", interpolation="nearest")
    ax.set_xlabel("time (columns)")
    ax.set_ylabel("frequency (pixels)")
    fig.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
        return path
    return fig

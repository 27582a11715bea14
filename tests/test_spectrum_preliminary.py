"""Preliminary-audio stitch parity (ref: TransformDSP.inl:233-484).

The reference's spectrogram path frames each blob the moment it
completes, windowing over [history tail | in-flight block prefix] per
channel mode. Three contracts locked here:

1. oracle: the stitched-and-packed rows equal an independent numpy
   transcription of the reference overload's fill loops, all 8 modes;
2. equivalence: analyzing a stitched frame is bit-equal to committing
   the block first and framing from history alone — so the hopper
   pipeline (which commits at push) has the same freshness;
3. freshness: a spectrogram frame whose final sample arrives in push k
   is pullable immediately after push k, and the post-pull lag stays
   below one hop (the stitch's whole point: no extra block of latency).
"""

import numpy as np
import pytest

import jax

from signalizer_tpu.core.config import (
    BinInterpolation,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.core.constant import host_view, make_spectrum_constant
from signalizer_tpu.kernels.spectrum import _pack_channels, stitch_preliminary
from signalizer_tpu.views.spectrum import SpectrumProcessor

FS = 48_000.0
ALL_MODES = [
    SpectrumChannels.LEFT,
    SpectrumChannels.RIGHT,
    SpectrumChannels.MERGE,
    SpectrumChannels.SIDE,
    SpectrumChannels.MIDSIDE,
    SpectrumChannels.PHASE,
    SpectrumChannels.SEPARATE,
    SpectrumChannels.COMPLEX,
]


def _constant(cfg, window=256):
    return make_spectrum_constant(
        axis_points=64,
        window_size=window,
        sample_rate=FS,
        configuration=cfg,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
    )


def _oracle_stitch_rows(cfg, kernel, history, preliminary, stop):
    """numpy transcription of the reference overload's fill loops
    (TransformDSP.inl:258-484, extra == 0): window slot i takes history
    (oldest-first after the offset skip) for i < W - stop, then the
    preliminary block's first ``stop`` samples, each times
    windowKernel[i]; channel-mode packing factors as the committed path
    (TransformDSP.inl:91-215)."""
    w = len(kernel)
    keep = w - stop
    left = np.concatenate(
        [history[0, -keep:] if keep else history[0, :0], preliminary[0, :stop]]
    )
    right = np.concatenate(
        [history[1, -keep:] if keep else history[1, :0], preliminary[1, :stop]]
    )
    if cfg == SpectrumChannels.LEFT:
        rows = [left]
    elif cfg == SpectrumChannels.RIGHT:
        rows = [right]
    elif cfg == SpectrumChannels.MERGE:
        rows = [(left + right) * 0.5]
    elif cfg == SpectrumChannels.SIDE:
        rows = [(left - right) * 0.5]
    elif cfg == SpectrumChannels.MIDSIDE:
        rows = [(left + right) * 0.5, (left - right) * 0.5]
    elif cfg in (SpectrumChannels.PHASE, SpectrumChannels.SEPARATE):
        rows = [left, right]
    else:  # COMPLEX
        return (left * kernel) + 1j * (right * kernel)
    return np.stack([r * kernel for r in rows])


@pytest.mark.parametrize("cfg", ALL_MODES)
@pytest.mark.parametrize("stop", [0, 100, 256])
def test_stitch_matches_reference_oracle(cfg, stop):
    c = _constant(cfg)
    rng = np.random.default_rng(5)
    history = rng.standard_normal((2, 512)).astype(np.float32)
    preliminary = rng.standard_normal((2, 256)).astype(np.float32)
    stitched = stitch_preliminary(c, history, preliminary, stop)
    got = np.asarray(_pack_channels(c, stitched))
    kernel = np.asarray(host_view(c, "window_kernel"))
    want = _oracle_stitch_rows(cfg, kernel, history, preliminary, stop)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_stitched_analysis_bitequal_to_committed():
    c = _constant(SpectrumChannels.SEPARATE, window=1024)
    rng = np.random.default_rng(6)
    hist = rng.standard_normal((1, 2, 4096)).astype(np.float32)
    block = rng.standard_normal((1, 2, 300)).astype(np.float32)

    p1 = SpectrumProcessor(c)
    stitched = np.asarray(p1.process_with_preliminary(hist, block))

    committed = np.concatenate([hist, block], axis=-1)[..., -1024:]
    p2 = SpectrumProcessor(c)
    framed = np.asarray(p2.process(committed[:, None]))
    np.testing.assert_array_equal(stitched, framed)


def test_stitch_partial_block_prefix():
    c = _constant(SpectrumChannels.LEFT, window=128)
    rng = np.random.default_rng(7)
    hist = rng.standard_normal((2, 256)).astype(np.float32)
    block = rng.standard_normal((2, 64)).astype(np.float32)
    out = np.asarray(stitch_preliminary(c, hist, block, num_samples=40))
    np.testing.assert_array_equal(out[..., -40:], block[..., :40])
    np.testing.assert_array_equal(out[..., :88], hist[..., -88:])


def test_stitch_rejects_short_history():
    c = _constant(SpectrumChannels.LEFT, window=128)
    with pytest.raises(ValueError):
        stitch_preliminary(
            c, np.zeros((2, 16), np.float32), np.zeros((2, 8), np.float32)
        )


@pytest.mark.parametrize("device_ingest", [True, False])
def test_spectrogram_same_push_freshness(device_ingest):
    """A frame whose final sample arrives in push k is pullable right
    after push k (no extra block/hop of latency), and the post-pull lag
    stays below one hop — the stitch overload's freshness semantics."""
    from signalizer_tpu.views.spectrogram import SpectrogramProcessor

    hop_ms = 480 / FS * 1e3  # hop = 480 samples exactly
    sp = SpectrogramProcessor(
        pairs=1,
        blob_ms=hop_ms if device_ingest else hop_ms * 1.001,  # force paths
        axis_points=64,
        window_size=1024,
        sample_rate=FS,
    )
    assert sp.device_ingest == device_ingest
    rng = np.random.default_rng(8)
    clock = 0
    hop = sp.batcher.hop
    got_any = False
    for i in range(40):
        n = int(rng.integers(100, 400))
        sp.push(rng.standard_normal((2, n)).astype(np.float32) * 0.3)
        clock += n
        cols = sp.pull()
        lag = sp.freshness_lag()
        if lag is not None:
            got_any = True
            # every formable frame was emitted: the newest frame's end is
            # within one hop of the stream clock
            assert lag < hop + 0.5, (i, lag, hop)
        if cols is not None and len(cols):
            assert np.isfinite(lag)
    assert got_any

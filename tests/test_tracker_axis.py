"""Frequency tracker, axis tools, colour utilities."""

import numpy as np
import pytest

from signalizer_tpu.core.windows import WindowType, generate_window
from signalizer_tpu.kernels.tracker import (
    SmoothedPeakState,
    frequency_to_semitone,
    scalloping_loss_at,
    track_peak,
)
from signalizer_tpu.utils.axis import (
    db_meter_axis,
    frequency_axis,
    suitable_axis_division,
    time_axis,
)
from signalizer_tpu.utils.colour import ColourRotation, Legend, with_rotated_hue

FS = 48_000.0


def _spectrum_of_sine(f_hz, n=4096, amp=0.5):
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * f_hz * t / FS)
    kernel, scale = generate_window(WindowType.HANN, n, symmetric=False)
    mags = np.abs(np.fft.rfft(x * kernel))
    return mags, scale / (n * 0.5)


def test_track_peak_finds_and_refines():
    f_true = 1234.5
    mags, inv = _spectrum_of_sine(f_true)
    cursor = f_true / (FS / 2)
    peak = track_peak(mags, FS, cursor, inv_size=inv)
    # parabolic refinement should land within a tenth of a bin
    assert abs(peak.frequency - f_true) < 0.1 * FS / 4096
    assert abs(peak.dbs - 20 * np.log10(0.5)) < 0.3  # parabolic-fit bias


def test_track_peak_boundary_ascent():
    """Cursor near—but not on—a peak: the edge-ascent walk must climb out
    of the search window to the true summit."""
    f_true = 2000.0
    mags, inv = _spectrum_of_sine(f_true)
    cursor = (f_true * 1.05) / (FS / 2)  # 5% off, outside the 3% window
    peak = track_peak(mags, FS, cursor, inv_size=inv)
    assert abs(peak.frequency - f_true) < 2 * FS / 4096


def test_frequency_to_semitone():
    assert frequency_to_semitone(440.0).startswith("A4")
    assert frequency_to_semitone(261.63).startswith("C4")  # middle C
    assert frequency_to_semitone(880.0).startswith("A5")
    s = frequency_to_semitone(450.0)
    assert s.startswith("A4") and "+" in s  # sharp by ~39 cents
    assert frequency_to_semitone(-1) == "nan"


def test_scalloping_loss():
    kernel, _ = generate_window(WindowType.HANN, 2048)
    on_bin = scalloping_loss_at(kernel, 100.0)
    half_bin = scalloping_loss_at(kernel, 100.5)
    assert abs(on_bin - 1.0) < 1e-9
    assert abs(20 * np.log10(half_bin) + 1.42) < 0.05  # hann: -1.42 dB


def test_smoothed_peak_state():
    s = SmoothedPeakState(smoothing_ms=100.0, frame_rate=60.0)
    from signalizer_tpu.kernels.tracker import PeakResult

    f1, d1 = s.update(PeakResult(0.1, 1000.0, -6.0, 10))
    assert f1 == 1000.0
    # a louder peak captures the display; the shown frequency lags toward it
    f2, _ = s.update(PeakResult(0.1, 2000.0, 0.0, 10))
    assert 1000.0 < f2 < 2000.0
    # quieter peaks cannot steal the display while the hold is up
    f3, _ = s.update(PeakResult(0.1, 500.0, -40.0, 10))
    assert f3 > f2


def test_suitable_axis_division():
    assert suitable_axis_division(100.0, 10) == 10.0
    assert suitable_axis_division(30.0, 10) == 5.0
    assert suitable_axis_division(7.0, 10) == 1.0
    assert suitable_axis_division(0.35, 10) == 0.05


def test_db_meter_axis():
    lines = db_meter_axis(-96.0, 0.0, 10)
    vals = [l.value for l in lines]
    assert vals[0] >= -96 and vals[-1] <= 0
    steps = np.diff(vals)
    assert np.allclose(steps, steps[0])
    assert all(0 <= l.position <= 1 for l in lines)


def test_frequency_axis_log_ladder():
    from signalizer_tpu.core.constant import remap_frequencies
    from signalizer_tpu.core.config import ViewScaling

    f = remap_frequencies(512, FS, ViewScaling.LOGARITHMIC, min_freq=10.0)
    lines = frequency_axis(f)
    vals = [l.value for l in lines]
    assert 100.0 in vals and 1000.0 in vals
    # positions monotonically increase
    pos = [l.position for l in lines]
    assert all(b > a for a, b in zip(pos, pos[1:]))


def test_time_axis():
    lines = time_axis(0.010, 10)  # 10 ms window
    assert lines[0].value == 0.0
    assert lines[-1].value <= 10.0
    assert "ms" in lines[1].label


def test_colour_rotation():
    rot = ColourRotation((1.0, 0.0, 0.0), 4)
    c0, c1 = rot[0], rot[1]
    assert not np.allclose(c0, c1)  # rotated
    np.testing.assert_allclose(rot[4], rot[0])  # wraps
    keep = ColourRotation((1.0, 0.0, 0.0), 4, dont_rotate_first=True)
    np.testing.assert_allclose(keep[0], (1, 0, 0))


def test_legend():
    lg = Legend.for_pairs(["left", "right", "sc left", "sc right"], (0.0, 1.0, 0.0), 2)
    assert len(lg.entries) == 4
    assert lg.entries[0].colour == lg.entries[1].colour  # same pair, one base
    assert lg.entries[0].colour != lg.entries[2].colour  # next pair rotated
    # with a secondary colour, right channels take it
    # (ref: Oscilloscope.cpp:322/326 primary vs secondary rotations)
    lg2 = Legend.for_pairs(
        ["left", "right"], (0.0, 1.0, 0.0), 1, secondary_colour=(1.0, 0.0, 0.0)
    )
    assert lg2.entries[0].colour == (0.0, 1.0, 0.0)
    assert lg2.entries[1].colour == (1.0, 0.0, 0.0)


def test_cursor_readout():
    from signalizer_tpu.utils.axis import cursor_readout

    # (N - 1) fence convention (ref: (effectiveWindowSize - 1) sample
    # span, OscilloscopeRendering.cpp:205-212): 480-sample window has 479
    # intervals, so fraction 0.25 reads 119.75 samples
    r = cursor_readout(0.5, 0.25, 0.010, 48_000.0)
    assert abs(r["dbs"] + 6.02) < 0.01
    assert abs(r["samples"] - 0.25 * 479.0) < 1e-9
    assert abs(r["time_ms"] - 0.25 * 479.0 / 48.0) < 1e-9
    assert "smps" in r["text"]
    # trigger-centered modes read 0 at mid-screen
    c = cursor_readout(0.5, 0.5, 0.010, 48_000.0, trigger_centered=True)
    assert abs(c["samples"]) < 1e-9 and abs(c["time_ms"]) < 1e-9
    left = cursor_readout(0.5, 0.0, 0.010, 48_000.0, trigger_centered=True)
    assert abs(left["samples"] + 479.0 / 2) < 1e-9


def test_polar_scale_to_fill():
    import jax.numpy as jnp

    from signalizer_tpu.kernels.vectorscope import polar_vertices

    x = np.abs(np.random.default_rng(0).standard_normal((2, 64))).astype(np.float32)
    v = np.asarray(polar_vertices(jnp.asarray(x), scale_to_fill=True))
    assert v[:, 1].min() < -0.5  # stretched down into [-1, 1]


def test_apply_transform():
    import jax.numpy as jnp

    from signalizer_tpu.kernels.vectorscope import apply_transform
    from signalizer_tpu.params.values import TransformValue

    t = TransformValue("t")
    for s in t.scale:
        s.set_transformed(2.0)
    verts = jnp.asarray(np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32))
    out = np.asarray(apply_transform(verts, t.matrix(), t.translation()))
    np.testing.assert_allclose(out, np.asarray(verts) * 2.0 + t.translation(), rtol=1e-5, atol=1e-6)


def test_available_windows_by_algorithm():
    from signalizer_tpu.core.windows import FINITE_DFT_WINDOWS, WindowType
    from signalizer_tpu.views.content import SpectrumContent

    sc = SpectrumContent()
    sc.algorithm.set_transformed(0)  # FFT
    assert len(sc.available_windows()) == len(WindowType)
    sc.algorithm.set_transformed(1)  # resonator
    assert sc.available_windows() == tuple(FINITE_DFT_WINDOWS)


def test_trigger_channel_selection():
    """Triggering on the right channel must center that channel's crossing."""
    import jax.numpy as jnp

    from signalizer_tpu.core.config import OscChannels
    from signalizer_tpu.views.oscilloscope import (
        OscilloscopeProcessor,
        TriggerMode,
    )

    fs = 48_000.0
    t = np.arange(16384)
    left = np.sin(2 * np.pi * 440.0 * t / fs + 1.3).astype(np.float32)
    right = np.sin(2 * np.pi * 440.0 * t / fs).astype(np.float32)
    hist = np.stack([left, right])[None]
    proc = OscilloscopeProcessor(
        pairs=1, channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.ZERO_CROSSING, trigger_threshold=0.1,
        window_samples=1001.0, pixels=1001, trigger_channel=1,
    )
    frame = proc.process(hist)
    wave_r = np.asarray(frame.waveform)[0, 1]
    c = len(wave_r) // 2
    assert abs(wave_r[c]) < 0.06 and wave_r[c + 5] > wave_r[c - 5]


def test_track_display_peak_graph_source():
    """FTracker = Main graph: peak search over the display-space row with
    frequency from the pixel map (ref: frequencyTrackingGraph selects the
    evaluated graph, Spectrum.cpp:368)."""
    from signalizer_tpu.kernels.tracker import track_display_peak

    f = np.geomspace(20.0, 20000.0, 256)
    row = np.full(256, 0.1)
    row[100] = 0.9  # a peak at f[100]
    peak = track_display_peak(row, f, cursor_fraction=100 / 255, low_dbs=-96.0, high_dbs=0.0)
    assert peak.bin_index == 100
    assert peak.frequency == pytest.approx(f[100])
    assert peak.dbs == pytest.approx(-96.0 + 0.9 * 96.0)


def test_session_tracker_graph_source():
    """End-to-end: FTracker = main graph tracks through the decayed
    display row and reports its source."""
    import jax
    from signalizer_tpu.engine import SignalizerEngine
    from signalizer_tpu.session import AnalysisSession

    fs = 48_000.0
    eng = SignalizerEngine("ftracker")
    eng.spectrum.frequency_tracker.set_normalized(2 / 3)  # main graph
    s = AnalysisSession(eng, views=("spectrum",), axis_points=256,
                        cursor_fraction=None)
    # cursor near 1 kHz on the log axis
    from signalizer_tpu.core.constant import host_view
    f = host_view(s._processors["spectrum"].constant, "mapped_frequencies")
    s.cursor_fraction = float(np.searchsorted(f, 1000.0) / (len(f) - 1))
    s.reconfigure("spectrum")
    t = np.arange(8192) / fs
    x = 0.5 * np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    for _ in range(3):
        s.feed(np.stack([x, x]))
        frame = s.tick()
    assert frame.tracker is not None
    assert frame.tracker["source"] == "graph0"
    assert frame.tracker["frequency"] == pytest.approx(1000.0, rel=0.03)
    s.close()

"""Fused all-views tick parity: one dispatch == per-view dispatches.

The session's fused path (views/fused_tick.py) must be BIT-equal to the
per-view path across ticks — outputs and carried state. The mechanism
under test: both paths share the processors' ``_prep_step`` bucket math
and the ``device_history._tail`` slices, so the same impl functions see
the same inputs (VERDICT round 4 #4 done-criterion)."""

import numpy as np
import pytest

from signalizer_tpu.engine import SignalizerEngine
from signalizer_tpu.session import AnalysisSession
from signalizer_tpu.stream.audio_stream import Playhead

FS = 48_000.0
VIEWS = ("spectrum", "oscilloscope", "vectorscope")


def _drive(fused, ticks=8, knobs=None, views=VIEWS, block=800):
    eng = SignalizerEngine("fused-parity", load_default_preset=False)
    if knobs:
        knobs(eng)
    s = AnalysisSession(eng, views=views, axis_points=128, pixels=128,
                        fused_tick=fused)
    rng = np.random.default_rng(42)
    outs = []
    t = 0
    for i in range(ticks):
        x = (0.5 * rng.standard_normal((2, block))).astype(np.float32)
        t += block
        s.feed(x, Playhead(steady_clock=t, bpm=120.0, is_playing=True))
        fr = s.tick()
        rec = {}
        if fr.spectrum is not None:
            rec["spectrum"] = np.asarray(fr.spectrum)
        if fr.oscilloscope is not None:
            rec["wave"] = np.asarray(fr.oscilloscope.waveform)
            rec["env_min"] = np.asarray(fr.oscilloscope.envelope_min)
            rec["env_max"] = np.asarray(fr.oscilloscope.envelope_max)
        if fr.vectorscope is not None:
            rec["verts"] = np.asarray(fr.vectorscope.vertices)
            rec["balance"] = np.asarray(fr.vectorscope.balance)
            rec["corr"] = np.asarray(fr.vectorscope.correlation_bars)
        outs.append(rec)
    s.close()
    return outs


def _assert_bitequal(a, b):
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert set(x) == set(y), (i, set(x), set(y))
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=f"tick {i} field {k}")


def test_fused_tick_bitequal_default_knobs():
    _assert_bitequal(_drive(True), _drive(False))


def test_fused_tick_bitequal_zc_trigger_rms_autogain():
    def knobs(eng):
        # zero-crossing trigger + RMS vectorscope autogain + polar mode
        eng.oscilloscope.trigger_mode.set_normalized(1.0)  # last choice
        eng.vectorscope.auto_gain.set_normalized(0.5)
        eng.vectorscope.operational_mode.set_normalized(1.0)  # polar

    _assert_bitequal(_drive(True, knobs=knobs), _drive(False, knobs=knobs))


def test_fused_tick_parity_across_reconfigure():
    def run(fused):
        eng = SignalizerEngine("fused-reconf", load_default_preset=False)
        s = AnalysisSession(eng, views=VIEWS, axis_points=128, pixels=128,
                            fused_tick=fused)
        rng = np.random.default_rng(3)
        outs = []
        t = 0
        for i in range(6):
            if i == 3:
                eng.vectorscope.window_size.set_normalized(0.9)
                s.reconfigure()
            x = (0.5 * rng.standard_normal((2, 640))).astype(np.float32)
            t += 640
            s.feed(x, Playhead(steady_clock=t, bpm=120.0, is_playing=True))
            fr = s.tick()
            outs.append({
                "spectrum": np.asarray(fr.spectrum),
                "wave": np.asarray(fr.oscilloscope.waveform),
                "balance": np.asarray(fr.vectorscope.balance),
            })
        s.close()
        return outs

    _assert_bitequal(run(True), run(False))


def test_fused_falls_back_for_rsnt_spectrum():
    def knobs(eng):
        eng.spectrum.algorithm.set_normalized(1.0)  # RESONATOR

    outs = _drive(True, ticks=4, knobs=knobs)
    # RSNT makes the fused path ineligible; the per-view path must still
    # produce every view's output
    assert all("wave" in r and "verts" in r for r in outs)
    assert any("spectrum" in r for r in outs[1:])


def test_fused_disabled_views_subset_still_ticks():
    outs = _drive(True, ticks=3, views=("spectrum", "vectorscope"))
    assert all("verts" in r and "spectrum" in r for r in outs)
    assert all("wave" not in r for r in outs)

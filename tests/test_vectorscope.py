"""Vectorscope kernels vs naive per-sample oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from signalizer_tpu.kernels.vectorscope import (
    SQRT_HALF,
    correlation,
    filter_coefficient,
    init_meter_state,
    lissajous_vertices,
    meter_readout,
    peak_autogain_update,
    polar_vertices,
    rms_autogain,
    update_meters,
)
from signalizer_tpu.views.vectorscope import (
    AutoGain,
    OperationalMode,
    VectorscopeProcessor,
)


def _frames(seed=0, pairs=0, w=512):
    rng = np.random.default_rng(seed)
    shape = (2, w) if pairs == 0 else (pairs, 2, w)
    return (rng.standard_normal(shape) * 0.5).astype(np.float32)


# ---------------------------------------------------------------------------
# correlation
# ---------------------------------------------------------------------------


def _correlation_oracle(left, right):
    """Per-sample loop from the reference semantics
    (Vectorscope.cpp:297-317)."""
    out = np.zeros(len(left))
    for i in range(len(left)):
        x = -SQRT_HALF * (left[i] + right[i])
        y = SQRT_HALF * (right[i] - left[i])
        if x == 0 and y == 0:
            ang = np.pi / 4
        else:
            with np.errstate(divide="ignore"):
                ang = np.arctan(y / x) if x != 0 else np.sign(y) * np.pi / 2
        out[i] = np.cos(2 * ang)
    return out


def test_correlation_matches_oracle():
    f = _frames(1, w=256)
    got = np.asarray(correlation(jnp.asarray(f)))
    want = _correlation_oracle(f[0].astype(np.float64), f[1].astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_correlation_mono_is_one():
    x = _frames(2, w=128)[0]
    c = np.asarray(correlation(jnp.asarray(np.stack([x, x]))))
    np.testing.assert_allclose(c, 1.0, atol=1e-6)


def test_correlation_inverted_is_minus_one():
    x = _frames(3, w=128)[0]
    c = np.asarray(correlation(jnp.asarray(np.stack([x, -x]))))
    np.testing.assert_allclose(c, -1.0, atol=1e-6)


def test_correlation_silence_is_zero():
    c = np.asarray(correlation(jnp.zeros((2, 64))))
    np.testing.assert_allclose(c, 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# vertex transforms
# ---------------------------------------------------------------------------


def test_lissajous_layout():
    f = _frames(4, w=64)
    v = np.asarray(lissajous_vertices(jnp.asarray(f)))
    assert v.shape == (64, 3)
    np.testing.assert_allclose(v[:, 0], f[1], atol=1e-7)  # x = right
    np.testing.assert_allclose(v[:, 1], f[0], atol=1e-7)  # y = left
    assert v[0, 2] == -1.0 and abs(v[-1, 2]) < 1e-7  # age fade


def test_polar_fold_and_length():
    """Polar: length = max(|L|,|R|); y must be >= 0 when the angle folds
    correctly for in-phase material; mono -> points on the Y axis."""
    x = np.abs(_frames(5, w=200)[0])
    mono = np.stack([x, x])
    v = np.asarray(polar_vertices(jnp.asarray(mono)))
    np.testing.assert_allclose(v[:, 0], 0.0, atol=1e-6)  # centered
    np.testing.assert_allclose(v[:, 1], x, atol=1e-5)  # length = |x|

    # hard-left: 45 degrees to the left (x = -sin(pi/4) * |L|)
    left_only = np.stack([x, np.zeros_like(x)])
    v = np.asarray(polar_vertices(jnp.asarray(left_only)))
    np.testing.assert_allclose(v[:, 0], -x * SQRT_HALF, atol=1e-5)
    np.testing.assert_allclose(v[:, 1], x * SQRT_HALF, atol=1e-5)


# ---------------------------------------------------------------------------
# meter filters
# ---------------------------------------------------------------------------


def _onepole_oracle(s0, u, p):
    s = float(s0)
    for x in u:
        s = float(x) + p * (s - float(x))
    return s


def test_meter_filters_match_sequential():
    f = _frames(6, w=300)
    fs = 48_000.0
    env_pole = float(filter_coefficient(0.1, fs))
    st_pole = float(filter_coefficient(0.02, fs))
    state = init_meter_state()
    new = update_meters(
        state, jnp.asarray(f), envelope_pole=env_pole, stereo_pole=st_pole
    )
    lsq = (f[0].astype(np.float64)) ** 2
    rsq = (f[1].astype(np.float64)) ** 2
    corr = _correlation_oracle(f[0].astype(np.float64), f[1].astype(np.float64))

    np.testing.assert_allclose(float(new.envelope[0]), _onepole_oracle(0, lsq, env_pole), rtol=1e-4)
    np.testing.assert_allclose(float(new.envelope[1]), _onepole_oracle(0, rsq, env_pole), rtol=1e-4)
    # FULL [speed, channel] matrix + both phase speeds: a transposed
    # broadcast or a wrong slow pole must not hide behind the diagonal
    np.testing.assert_allclose(float(new.balance[0, 0]), _onepole_oracle(0, lsq, st_pole), rtol=1e-4)
    np.testing.assert_allclose(float(new.balance[0, 1]), _onepole_oracle(0, rsq, st_pole), rtol=1e-4)
    np.testing.assert_allclose(
        float(new.balance[1, 0]), _onepole_oracle(0, lsq, st_pole**0.25), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(new.balance[1, 1]), _onepole_oracle(0, rsq, st_pole**0.25), rtol=5e-4
    )
    np.testing.assert_allclose(float(new.phase[0]), _onepole_oracle(0, corr, st_pole), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        float(new.phase[1]), _onepole_oracle(0, corr, st_pole**0.25), rtol=1e-3, atol=1e-5
    )


def test_meter_state_carries_across_blocks():
    """Two half blocks must equal one full block."""
    f = _frames(7, w=400)
    kw = dict(envelope_pole=0.95, stereo_pole=0.9)
    full = update_meters(init_meter_state(), jnp.asarray(f), **kw)
    half = update_meters(init_meter_state(), jnp.asarray(f[..., :200]), **kw)
    half = update_meters(half, jnp.asarray(f[..., 200:]), **kw)
    np.testing.assert_allclose(np.asarray(half.envelope), np.asarray(full.envelope), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(half.balance), np.asarray(full.balance), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(half.phase), np.asarray(full.phase), rtol=1e-3, atol=1e-6)


def test_meter_readout_ranges():
    f = _frames(8, w=256)
    state = update_meters(init_meter_state(), jnp.asarray(f), envelope_pole=0.99, stereo_pole=0.95)
    bars = meter_readout(state)
    assert np.all(np.asarray(bars["balance"]) >= 0) and np.all(np.asarray(bars["balance"]) <= 1)
    assert np.all(np.asarray(bars["correlation"]) >= 0) and np.all(np.asarray(bars["correlation"]) <= 1)
    # silence fallback: balance centers at 0.5
    silent = meter_readout(init_meter_state())
    np.testing.assert_allclose(np.asarray(silent["balance"]), 0.5)


def test_rms_autogain():
    # full-scale sine -> env ~= 0.5 -> gain ~= sqrt(2)
    t = np.arange(4096)
    sine = np.sin(2 * np.pi * 100.5 * t / 4096).astype(np.float32)
    f = np.stack([sine, sine])
    state = init_meter_state()
    for _ in range(20):  # let the filter converge
        state = update_meters(state, jnp.asarray(f), envelope_pole=0.999, stereo_pole=0.9)
    g = float(rms_autogain(state))
    assert abs(g - np.sqrt(2)) < 0.05


def test_peak_autogain():
    f = _frames(9, w=512)
    env = jnp.zeros(2)
    env, gain = peak_autogain_update(env, jnp.asarray(f), 0.99)
    peak = max(np.abs(f[0]).max(), np.abs(f[1]).max())
    np.testing.assert_allclose(float(gain), 1.0 / peak, rtol=1e-5)
    # decays toward larger gain when signal goes quiet
    env2, gain2 = peak_autogain_update(env, jnp.asarray(f * 0.01), 0.5)
    assert float(gain2) > float(gain)


# ---------------------------------------------------------------------------
# processor wrapper
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", [OperationalMode.LISSAJOUS, OperationalMode.POLAR])
@pytest.mark.parametrize("autogain", [AutoGain.NONE, AutoGain.RMS, AutoGain.PEAK_DECAY])
def test_processor_end_to_end(mode, autogain):
    proc = VectorscopeProcessor(pairs=3, mode=mode, autogain=autogain)
    frames = _frames(10, pairs=3, w=256)
    out = proc.process(frames)
    assert out.vertices.shape == (3, 256, 3)
    assert out.balance.shape == (3, 2)
    assert out.correlation_bars.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(out.vertices)))
    out2 = proc.process(frames)  # state carries without error
    assert np.all(np.isfinite(np.asarray(out2.vertices)))


def test_degenerate_autogain_holds_previous_gain():
    """The reference only overwrites envelopeGain when the fresh
    1/max(sqrt(env)) isnormal() (Vectorscope.cpp:362-366,
    VectorscopeRendering.cpp:884-888): on a degenerate reading (zero
    envelope — reset or deep silence) the PREVIOUS gain persists. The
    old kernels snapped to 1.0 instead (review finding)."""
    from signalizer_tpu.kernels.vectorscope import (
        peak_autogain_update,
        rms_autogain,
    )
    from signalizer_tpu.views.vectorscope import vs_step_impl

    # kernel level: zero envelope + carried gain 5 -> 5, not 1
    st = init_meter_state()._replace(gain=jnp.float32(5.0))
    assert float(rms_autogain(st)) == 5.0
    env = jnp.zeros((2,), jnp.float32)
    zero_frames = jnp.zeros((2, 64), jnp.float32)
    _, g = peak_autogain_update(env, zero_frames, jnp.float32(0.5), fallback=jnp.float32(5.0))
    assert float(g) == 5.0

    # step level: signal establishes a gain, then total silence with a
    # zeroed envelope state must HOLD it across both autogain modes
    for autogain in (AutoGain.RMS, AutoGain.PEAK_DECAY):
        state = init_meter_state((1,))
        peak_env = jnp.zeros((1, 2), jnp.float32)
        loud = jnp.asarray(_frames(1, pairs=1, w=256) * 4.0)
        frame, state, peak_env = vs_step_impl(
            state, peak_env, loud,
            jnp.float32(0.5), jnp.float32(0.5), jnp.float32(1.0),
            jnp.float32(0.0), jnp.float32(0.0), None,
            mode=OperationalMode.LISSAJOUS, autogain=autogain,
            scale_to_fill=False,
        )
        established = float(np.asarray(frame.gain)[0])
        assert np.isfinite(established) and established != 1.0
        # force the degenerate reading the silence limit converges to
        state = state._replace(envelope=jnp.zeros_like(state.envelope))
        peak_env = jnp.zeros_like(peak_env)
        silent = jnp.zeros((1, 2, 256), jnp.float32)
        frame2, state, peak_env = vs_step_impl(
            state, peak_env, silent,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
            jnp.float32(0.0), jnp.float32(0.0), None,
            mode=OperationalMode.LISSAJOUS, autogain=autogain,
            scale_to_fill=False,
        )
        assert float(np.asarray(frame2.gain)[0]) == established, (
            f"{autogain}: degenerate reading popped the gain"
        )
        # and it keeps holding on the next silent step too
        frame3, state, peak_env = vs_step_impl(
            state, peak_env, silent,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
            jnp.float32(0.0), jnp.float32(0.0), None,
            mode=OperationalMode.LISSAJOUS, autogain=autogain,
            scale_to_fill=False,
        )
        assert float(np.asarray(frame3.gain)[0]) == established

"""MXU-formulated four-step FFT vs the numpy oracle."""

import jax
import numpy as np
import pytest

from signalizer_tpu.kernels.mxu_fft import make_plan, mxu_fft, mxu_rfft_half


@pytest.mark.parametrize("n", [1024, 4096, 8192, 16384])
def test_rfft_matches_numpy(n):
    plan = make_plan(n)
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = jax.jit(lambda v: mxu_rfft_half(plan, v))(x)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.rfft(x.astype(np.float64))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-6)


def test_complex_fft_matches_numpy():
    n = 8192
    plan = make_plan(n)
    rng = np.random.default_rng(7)
    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    re, im = jax.jit(lambda a, b: mxu_fft(plan, a, b))(xr, xi)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-6)


def test_pure_tone_bin_placement():
    """A bin-exact sine lands all its energy on the right rfft bin."""
    n = 4096
    plan = make_plan(n)
    k = 129
    t = np.arange(n)
    x = np.cos(2 * np.pi * k * t / n).astype(np.float32)[None]
    re, im = jax.jit(lambda v: mxu_rfft_half(plan, v))(x)
    mag = np.hypot(np.asarray(re), np.asarray(im))[0]
    assert int(np.argmax(mag)) == k
    assert mag[k] == pytest.approx(n / 2, rel=1e-5)
    others = np.delete(mag, k)
    assert others.max() < 1e-2 * mag[k]


def test_batched_leading_dims():
    n = 1024
    plan = make_plan(n)
    x = np.random.default_rng(0).standard_normal((2, 3, 2, n)).astype(np.float32)
    re, im = jax.jit(lambda v: mxu_rfft_half(plan, v))(x)
    assert re.shape == (2, 3, 2, n // 2 + 1)
    ref = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_bad_factorization_rejected():
    with pytest.raises(ValueError):
        make_plan(1000, r=128)


def test_mxu_fft_spectrum_integration_matches_xla():
    """The production swap point: _half_spectrum and the COMPLEX branch
    must produce the same spectra through the MXU four-step path as
    through jnp.fft (TPU constants default to fft_backend='mxu'; CPU
    tests would otherwise never compile the integrated composition).
    Routing is the Constant's static fft_backend field (round 4)."""
    import jax.numpy as jnp

    import signalizer_tpu.kernels.spectrum as ks
    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import make_spectrum_constant

    rng = np.random.default_rng(11)
    frames = jnp.asarray(rng.standard_normal((2, 2, 1024)).astype(np.float32))
    for cfg in (SpectrumChannels.SEPARATE, SpectrumChannels.PHASE, SpectrumChannels.COMPLEX):
        kwargs = dict(
            axis_points=128,
            window_size=1024,
            configuration=cfg,
            bin_interpolation=BinInterpolation.LINEAR,
            view_scaling=ViewScaling.LINEAR,
        )
        want = np.asarray(
            ks.spectrum_values(make_spectrum_constant(fft_backend="xla", **kwargs), frames)
        )
        got = np.asarray(
            ks.spectrum_values(make_spectrum_constant(fft_backend="mxu", **kwargs), frames)
        )
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(cfg))


def test_plan_built_inside_a_trace_is_reusable_across_traces():
    """Regression (round-4 headline bench): a plan lru-cached during one
    jit's trace must stay usable from a different trace — its matrices
    are host constants, never tracers (UnexpectedTracerError otherwise)."""
    import jax.numpy as jnp

    from signalizer_tpu.kernels.mxu_fft import make_plan, mxu_rfft_half

    make_plan.cache_clear()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 256)), jnp.float32)

    @jax.jit
    def first(v):
        re, im = mxu_rfft_half(make_plan(256), v)
        return jnp.sum(re) + jnp.sum(im)

    first(x)  # builds the plan while tracing
    plan = make_plan(256)
    assert all(
        isinstance(m, np.ndarray)
        for m in (plan.c_re, plan.c_im, plan.r_re, plan.r_im, plan.tw_re, plan.tw_im)
    )

    @jax.jit
    def second(v):
        re, _ = mxu_rfft_half(make_plan(256), v)
        return jnp.sum(re)

    ref = np.fft.rfft(np.asarray(x).astype(np.float64))
    assert np.allclose(float(second(x)), ref.real.sum(), rtol=1e-4)


def test_fft_precision_static_field_routes_value_path():
    """fft_precision rides the Constant (jit key), validates its values,
    and routes _half_spectrum's matmul precision. On CPU every tier is
    numerically identical (precision only affects TPU bf16 passes), so the
    lock here is plumbing + exactness, with the speed/accuracy trade
    measured on chip (docs/ROUND4.md: high = 8.4% faster, 2.2e-5 maxrel)."""
    import jax.numpy as jnp

    from signalizer_tpu.core.constant import make_spectrum_constant
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state

    with pytest.raises(ValueError):
        make_spectrum_constant(axis_points=64, window_size=256, fft_precision="fast")

    outs = {}
    x = np.random.default_rng(7).standard_normal((1, 1, 2, 256)).astype(np.float32)
    for prec in ("highest", "high", "bf16"):
        c = make_spectrum_constant(
            axis_points=64, window_size=256, fft_backend="mxu", fft_precision=prec
        )
        assert c.fft_precision == prec
        st = init_line_graph_state(c, (1,))
        outs[prec] = np.asarray(
            jax.jit(analyze_frames)(c, st, jnp.asarray(x)).results
        )
    np.testing.assert_array_equal(outs["highest"], outs["high"])
    np.testing.assert_array_equal(outs["highest"], outs["bf16"])


def test_complex_branch_honors_fft_precision(monkeypatch):
    """Review regression: the COMPLEX-configuration value path must pass
    SpectrumConstant.fft_precision to mxu_fft like every other channel
    configuration does — the knob was silently inert there."""
    import jax
    import jax.numpy as jnp

    import signalizer_tpu.kernels.mxu_fft as mf
    import signalizer_tpu.kernels.spectrum as ks
    from signalizer_tpu.core.config import SpectrumChannels
    from signalizer_tpu.core.constant import make_spectrum_constant

    seen = {}
    real = mf.mxu_fft

    def spy(plan, re, im=None, precision=jax.lax.Precision.HIGHEST):
        seen["precision"] = precision
        return real(plan, re, im, precision=precision)

    monkeypatch.setattr(mf, "mxu_fft", spy)
    frames = jnp.zeros((1, 2, 256), jnp.float32)
    for prec, expect in (
        ("bf16", jax.lax.Precision.DEFAULT),
        ("high", jax.lax.Precision.HIGH),
        ("highest", jax.lax.Precision.HIGHEST),
    ):
        c = make_spectrum_constant(
            axis_points=64,
            window_size=256,
            configuration=SpectrumChannels.COMPLEX,
            fft_backend="mxu",
            fft_precision=prec,
        )
        ks.spectrum_values(c, frames)
        assert seen["precision"] == expect, prec

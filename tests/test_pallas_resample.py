"""Correctness tests for the fused Pallas banded resample.

Runs the kernel in interpret mode (CPU) and adjudicates against an
independent per-tap numpy oracle (the same tap semantics as
`_sinc_gather` / the reference's sampleAt<Lanczos>() loop,
OscilloscopeRendering.cpp:854-888), NOT against the XLA banded path —
both production formulations must independently match the oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from signalizer_tpu.kernels.oscilloscope import (
    INTERPOLATION_KERNEL_SIZE,
    _banded_resample,
)
from signalizer_tpu.kernels.pallas_resample import (
    BLOCK,
    covers,
    fused_banded_resample,
)


def _oracle(x, pos, a, kind):
    """Per-tap numpy oracle: x [B, R, W], pos [B, P] -> [B, R, P]."""
    bsz, rows, w = x.shape
    p = pos.shape[-1]
    out = np.zeros((bsz, rows, p), np.float64)
    xp = x.astype(np.float64)
    for b in range(bsz):
        for j in range(p):
            q = float(pos[b, j])
            if kind == "nearest":
                # banded tie rule: t in [-0.5, 0.5) == round-half-up
                idx = int(np.clip(np.floor(q + 0.5), 0, w - 1))
                out[b, :, j] = xp[b, :, idx]
                continue
            taps = range(int(np.floor(q)) - a + 1, int(np.floor(q)) + a + 1)
            for i in taps:
                t = q - i
                if kind == "lanczos":
                    wt = np.sinc(t) * np.sinc(t / a) if abs(t) < a else 0.0
                else:  # linear
                    wt = max(0.0, 1.0 - abs(t))
                out[b, :, j] += wt * xp[b, :, int(np.clip(i, 0, w - 1))]
    return out


def _mk(bsz=2, rows=2, w=2048, p=2 * BLOCK, step=0.63, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((bsz, rows, w)).astype(np.float32)
    start = rng.uniform(0, w - step * p - 12, bsz).astype(np.float32)
    pos = start[:, None] + np.arange(p, dtype=np.float32) * step
    return x, pos


@pytest.mark.parametrize(
    "kind,a",
    [
        ("lanczos", INTERPOLATION_KERNEL_SIZE),
        ("lanczos", 5),
        ("linear", 1),
        ("nearest", 1),
    ],
)
def test_matches_oracle_interior(kind, a):
    step = 0.63 if a <= 5 else 0.55
    assert covers(step, a)
    x, pos = _mk(step=step)
    got = np.asarray(
        fused_banded_resample(
            jnp.asarray(x), jnp.asarray(pos), a=a, kind=kind, interpret=True
        )
    )
    want = _oracle(x, pos, a, kind)
    # f32 sin(pi*pos) cancels near integer positions, so a handful of
    # pixels carry ~1e-3 absolute noise in ANY f32 formulation (round-3
    # float64 adjudication: the fused kernel is as close to the exact
    # oracle as the XLA path there). Bound the fused error by the XLA
    # production path's own oracle error, floored at 5e-4.
    xla = np.asarray(
        _banded_resample(jnp.asarray(x), jnp.asarray(pos)[:, None, :], a, 256, kind)
    )
    tol = max(5e-4, 1.2 * float(np.max(np.abs(xla - want))))
    np.testing.assert_allclose(got, want, atol=tol)


@pytest.mark.parametrize("kind,a", [("lanczos", 10), ("linear", 1)])
def test_edge_clamp_matches_oracle(kind, a):
    """Positions hanging off both frame edges (per the view's clip range)
    must reproduce the oracle's tap clamping."""
    rng = np.random.default_rng(3)
    w, p = 1024, 2 * BLOCK
    x = rng.standard_normal((1, 2, w)).astype(np.float32)
    step = 0.4
    # left edge: start below 0 (clip floor is -(a+1)); right edge: run off w-1
    for start in (-(a + 0.5), w - 1.0 - step * (p // 2)):
        pos = np.float32(start) + np.arange(p, dtype=np.float32) * step
        pos = np.clip(pos, -(a + 1.0), w - 1.0 + a).astype(np.float32)[None]
        got = np.asarray(
            fused_banded_resample(
                jnp.asarray(x), jnp.asarray(pos), a=a, kind=kind, interpret=True
            )
        )
        want = _oracle(x, pos, a, kind)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_agrees_with_xla_banded():
    """The two production formulations agree bit-tightly on shared ground
    (same weight identity, f32 accumulation)."""
    x, pos = _mk(bsz=3, w=4096, p=4 * BLOCK, step=0.8, seed=7)
    a = 10
    assert covers(0.8, a)
    got = np.asarray(
        fused_banded_resample(
            jnp.asarray(x), jnp.asarray(pos), a=a, kind="lanczos", interpret=True
        )
    )
    ref = np.asarray(
        _banded_resample(jnp.asarray(x), jnp.asarray(pos)[:, None, :], a, 256)
    )
    # different window alignment -> different f32 accumulation order;
    # measured max divergence 6e-5 on unit-variance data
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_covers_predicate():
    # cfg3: 1024-sample window over 8192 px -> step ~0.125, easily covered
    assert covers(1023.0 / 8191.0, INTERPOLATION_KERNEL_SIZE)
    # ~1:1 display is NOT covered for a=10 (max_step*127+2a+2+128 > 256)
    assert not covers(1.0, INTERPOLATION_KERNEL_SIZE)
    assert bool(covers(0.8, 10))


def test_dual_output_nearest_matches_single_pass():
    """with_nearest=True returns the lanczos wave bit-equal to the
    single-output call plus the nearest pick matching the oracle — the
    fused envelope source of the oscilloscope step (round-4 verdict #5)."""
    x, pos = _mk(step=0.55)
    a = INTERPOLATION_KERNEL_SIZE
    assert covers(0.55, a)
    wave, near = fused_banded_resample(
        jnp.asarray(x), jnp.asarray(pos), a=a, kind="lanczos",
        with_nearest=True, interpret=True,
    )
    single = fused_banded_resample(
        jnp.asarray(x), jnp.asarray(pos), a=a, kind="lanczos", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(wave), np.asarray(single))
    np.testing.assert_allclose(
        np.asarray(near), _oracle(x, pos, 1, "nearest"), atol=1e-6
    )


def test_sinc_resample_with_nearest_cpu_fallback_matches_separate():
    """Off-TPU the dual helper must produce exactly the two standalone
    resamples (the per-view/fused session parity depends on it)."""
    from signalizer_tpu.kernels.oscilloscope import (
        nearest_resample,
        sinc_resample,
        sinc_resample_with_nearest,
    )

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 2, 2048)).astype(np.float32)
    start = np.full((2, 1), 100.0, np.float32)
    step = np.full((2, 1), 0.5, np.float32)
    wave, near = sinc_resample_with_nearest(jnp.asarray(x), start, step, 256)
    np.testing.assert_array_equal(
        np.asarray(wave), np.asarray(sinc_resample(jnp.asarray(x), start, step, 256))
    )
    np.testing.assert_array_equal(
        np.asarray(near), np.asarray(nearest_resample(jnp.asarray(x), start, step, 256))
    )

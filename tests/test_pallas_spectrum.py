"""Fused Pallas window+rFFT+mag kernel vs the numpy oracle (interpret
mode on CPU; the hardware A/B lives in tools/fused_spectrum_bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signalizer_tpu.kernels.pallas_spectrum import (
    FusedSpectrumPlan,
    fused_window_rfft_mag,
    make_fused_plan,
)


@pytest.mark.parametrize("n", [1024, 4096])
def test_fused_mags_match_numpy_oracle(n):
    rng = np.random.default_rng(n)
    w = np.hanning(n).astype(np.float32)
    plan = make_fused_plan(n, w)
    x = rng.standard_normal((3, 2, n)).astype(np.float32)
    got = np.asarray(
        fused_window_rfft_mag(plan, jnp.asarray(x), interpret=True)
    )[..., : plan.half]
    ref = np.abs(np.fft.rfft(x.astype(np.float64) * w))
    assert float(np.max(np.abs(got - ref)) / np.max(ref)) < 5e-6


def test_fused_plan_tables_are_host_numpy():
    """Plans are lru-cached: traced constants would leak across traces
    (the mxu_fft round-4 regression class)."""
    plan = make_fused_plan(1024, np.hanning(1024).astype(np.float32))
    for f in ("window", "wc_re", "wc_im", "tw_re", "tw_im", "wrt_re", "wrt_im"):
        assert isinstance(getattr(plan, f), np.ndarray), f


def test_fused_batch_padding_and_short_rows():
    """Batch not a multiple of tile_b and rows shorter than N (zero-pad)
    both round-trip exactly."""
    n = 1024
    w = np.ones(n, np.float32)
    plan = make_fused_plan(n, w)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((5, 700)).astype(np.float32)  # 5 rows, short
    got = np.asarray(
        fused_window_rfft_mag(plan, jnp.asarray(x), tile_b=4, interpret=True)
    )[..., : plan.half]
    ref = np.abs(np.fft.rfft(x.astype(np.float64), n=n))
    assert got.shape == (5, plan.half)
    assert float(np.max(np.abs(got - ref)) / np.max(ref)) < 5e-6


def test_fused_plan_factors_odd_sizes():
    plan = FusedSpectrumPlan(96, np.ones(96, np.float32))
    assert plan.r * plan.c == 96

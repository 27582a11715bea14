"""Four-step (Bailey) FFT formulated as MXU matmuls.

The reference computes its long transforms with scalar-pipeline FFT
libraries (pffft via cpl::dsp::UniFFT, ref: TransformConstant.h:223, and
DustFFT for the oscilloscope's 8192-pt spectral trigger, ref:
OscilloscopeDSP.inl:98). XLA's TPU FFT lowers to a vector-unit pipeline
that leaves the MXU idle; for the large batched transforms the spectrogram
path runs (16384-pt, BASELINE cfg4) the systolic array can buy the
transform back as dense linear algebra:

    N = R * C,  n = n1 + R*n2,  k = k2 + C*k1
    Y[n1, k2] = sum_n2 x[n1 + R*n2] * W_C^(n2 k2)      (batched matmul)
    Z[n1, k2] = Y[n1, k2] * W_N^(n1 k2)                (VPU twiddle)
    X[k2 + C*k1] = sum_n1 W_R^(k1 n1) * Z[n1, k2]      (batched matmul)

Real input costs 2 matmuls for the first stage and 4 for the second.
This trades ~20x the FLOPs of a radix-2 FFT for MXU throughput.

Numerical note: the DFT matrices must multiply at ``precision=HIGHEST``
(f32 accumulation via bf16x3 passes). TPU's default bf16 matmul rounding
produces ~1e-2 relative error over 128-long dots — visible at spectrum
display floors of -96 dB and in conflict with this repo's oracle
tolerances (see CLAUDE.md's precision gotcha).

Measured on one TPU v5 lite chip (N=16384 rfft, f32, chained dispatch,
interleaved A/B, medians of 5; the remote-TPU tunnel adds run-to-run
variance of +-25%):

    batch 512: mxu_rfft_half 190-225k frames/s, XLA rfft 136-207k
    batch  64: both ~30-51k (dispatch-bound through the tunnel)
    accuracy vs float64 numpy: mxu 1.5e-7, XLA rfft 3.7e-7 (relative)

Verdict (updated round 3): the honest scan-slope rematch at the
HEADLINE geometry (N=4096, 4096 transforms, input rotated per step,
scalar sync) measured **1.83 ms vs XLA's 2.64 ms (1.44x) at better
accuracy** (1.1e-7 vs 3.7e-7 relative against float64 numpy), so
``kernels/spectrum._mxu_fft_active`` routes the production spectrum FFT
through this module on TPU (CPU keeps jnp.fft — the ~20x FLOP trade
loses on scalar pipelines; ``SIGNALIZER_TPU_NO_MXU_FFT=1`` opts out).
The 16384-pt table above predates that rematch and is batch-dependent;
cfg4 (the 16384-pt spectrogram bench) is remap/decay-bound, not
FFT-bound, so its number moves little either way.

Run ``python -m signalizer_tpu.kernels.mxu_fft`` on the TPU rig to
reproduce the comparison table.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MxuFftPlan", "make_plan", "mxu_fft", "mxu_rfft_half"]

_HIGH = jax.lax.Precision.HIGHEST


def _dft_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the n-point DFT matrix W[k, j] = exp(-2i pi k j / n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * k * j / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class MxuFftPlan:
    """Frozen host-side plan: DFT factor matrices + twiddles for N = R*C.

    Kept as a plain object of HOST (numpy) constants closed over by jit,
    like SpectrumConstant's precomputed tables — all fields are arrays of
    static shape, so a plan is jit-cache-friendly by identity.

    The fields MUST stay numpy, never jnp: plans are lru-cached and the
    first build can happen *inside* a trace (``_mxu_plan`` is called from
    ``_half_spectrum`` while tracing a caller's jit). ``jnp.asarray``
    there produces DynamicJaxprTracers; caching those poisons every later
    trace that reuses the plan (UnexpectedTracerError — hit by the round-4
    headline bench, where ``spectrum_batch`` traced first and
    ``spectrum_single`` then reused the cached plan).
    """

    def __init__(self, n: int, r: int, c: int):
        self.n, self.r, self.c = n, r, c
        cc, cs = _dft_matrix(c)
        rc, rs = _dft_matrix(r)
        # twiddle T[n1, k2] = exp(-2i pi n1 k2 / N)
        n1 = np.arange(r)[:, None].astype(np.float64)
        k2 = np.arange(c)[None, :].astype(np.float64)
        ang = -2.0 * np.pi * n1 * k2 / n
        self.c_re = cc  # [C, C]
        self.c_im = cs
        self.r_re = rc  # [R, R]
        self.r_im = rs
        self.tw_re = np.cos(ang).astype(np.float32)  # [R, C]
        self.tw_im = np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=16)
def make_plan(n: int, r: Optional[int] = None) -> MxuFftPlan:
    """Factor n = r*c with both factors as close to 128 as possible."""
    if r is None:
        r = 128
        while n % r and r > 2:
            r //= 2
    if n % r:
        raise ValueError(f"cannot factor n={n} by r={r}")
    return MxuFftPlan(n, r, n // r)


def mxu_fft(plan: MxuFftPlan, x_re: jax.Array, x_im: Optional[jax.Array] = None,
            precision: jax.lax.Precision = _HIGH) -> Tuple[jax.Array, jax.Array]:
    """Batched complex FFT of the trailing axis via two MXU matmul stages.

    ``x_re``/``x_im``: [..., N] float32. Returns (re, im) of the full
    N-point spectrum. ``x_im=None`` is the real-input fast path (first
    stage halves to two matmuls). ``precision`` trades accuracy for MXU
    passes (HIGHEST = bf16x6 f32 emulation, the default; see the module
    numerical note before lowering it).
    """
    r, c = plan.r, plan.c
    lead = x_re.shape[:-1]
    # n = n1 + R*n2  ->  x2d[n1, n2] = x[n1 + R*n2]: reshape to (C, R), transpose
    x2 = jnp.swapaxes(x_re.reshape(*lead, c, r), -1, -2)
    # stage 1: C-point DFT along n2 (contract x2's last axis with W_C rows)
    y_re = jnp.matmul(x2, plan.c_re.T, precision=precision)
    y_im = jnp.matmul(x2, plan.c_im.T, precision=precision)
    if x_im is not None:
        xi2 = jnp.swapaxes(x_im.reshape(*lead, c, r), -1, -2)
        y_re = y_re - jnp.matmul(xi2, plan.c_im.T, precision=precision)
        y_im = y_im + jnp.matmul(xi2, plan.c_re.T, precision=precision)
    # twiddle
    z_re = y_re * plan.tw_re - y_im * plan.tw_im
    z_im = y_re * plan.tw_im + y_im * plan.tw_re
    # stage 2: R-point DFT along n1 -> out[k1, k2]
    o_re = (jnp.matmul(plan.r_re, z_re, precision=precision)
            - jnp.matmul(plan.r_im, z_im, precision=precision))
    o_im = (jnp.matmul(plan.r_re, z_im, precision=precision)
            + jnp.matmul(plan.r_im, z_re, precision=precision))
    # X[k2 + C*k1] = out[k1, k2]: flatten row-major
    return o_re.reshape(*lead, plan.n), o_im.reshape(*lead, plan.n)


def mxu_rfft_half(plan: MxuFftPlan, x: jax.Array,
                  precision: jax.lax.Precision = _HIGH
                  ) -> Tuple[jax.Array, jax.Array]:
    """Real-input FFT returning bins [0, N/2] (rfft layout).

    Since k = k2 + C*k1, every needed bin has k1 <= R/2: the second-stage
    DFT only multiplies the first R/2+1 rows of W_R, halving that stage's
    matmul work relative to :func:`mxu_fft`.
    """
    r, c = plan.r, plan.c
    lead = x.shape[:-1]
    x2 = jnp.swapaxes(x.reshape(*lead, c, r), -1, -2)
    y_re = jnp.matmul(x2, plan.c_re.T, precision=precision)
    y_im = jnp.matmul(x2, plan.c_im.T, precision=precision)
    z_re = y_re * plan.tw_re - y_im * plan.tw_im
    z_im = y_re * plan.tw_im + y_im * plan.tw_re
    rows = r // 2 + 1
    r_re, r_im = plan.r_re[:rows], plan.r_im[:rows]
    o_re = (jnp.matmul(r_re, z_re, precision=precision)
            - jnp.matmul(r_im, z_im, precision=precision))
    o_im = (jnp.matmul(r_re, z_im, precision=precision)
            + jnp.matmul(r_im, z_re, precision=precision))
    half = plan.n // 2 + 1
    return (o_re.reshape(*lead, rows * c)[..., :half],
            o_im.reshape(*lead, rows * c)[..., :half])


def _self_check() -> None:  # pragma: no cover - hardware comparison harness
    """Accuracy + throughput vs XLA FFT. Run on the TPU rig:
    ``python -m signalizer_tpu.kernels.mxu_fft``."""
    import time

    n = 16384
    batch = 64
    plan = make_plan(n)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)).astype(np.float32)

    f_mxu = jax.jit(lambda v: mxu_rfft_half(plan, v))
    f_xla = jax.jit(lambda v: (jnp.real(jnp.fft.rfft(v)), jnp.imag(jnp.fft.rfft(v))))

    xd = jax.device_put(x)
    mr, mi = jax.block_until_ready(f_mxu(xd))
    xr, xi = jax.block_until_ready(f_xla(xd))
    ref = np.fft.rfft(x.astype(np.float64))
    scale = np.abs(ref).max()
    print("mxu max err:", float(np.abs(np.asarray(mr) + 1j * np.asarray(mi) - ref).max() / scale))
    print("xla max err:", float(np.abs(np.asarray(xr) + 1j * np.asarray(xi) - ref).max() / scale))

    def timeit(f, chain=32):
        f(xd)  # warm
        jax.block_until_ready(f(xd))
        t0 = time.perf_counter()
        outs = [f(xd) for _ in range(chain)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        return batch * chain / dt

    print(f"mxu_rfft_half: {timeit(f_mxu):,.0f} frames/s")
    print(f"xla rfft     : {timeit(f_xla):,.0f} frames/s")


if __name__ == "__main__":  # pragma: no cover
    _self_check()

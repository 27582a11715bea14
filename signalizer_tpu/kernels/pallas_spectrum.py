"""Fused window -> four-step rFFT -> magnitude as one Pallas TPU kernel.

SURVEY §2.8 names the "Pallas fused window+FFT+mag kernel" as the
north-star replacement for the reference's pffft transform core (ref:
Source/Spectrum/TransformConstant.h:223 UniFFT usage; the windowed
prepareTransform -> doTransform -> abs chain is TransformDSP.inl:38-231,
:486-502). The XLA chain materializes every stage to HBM (windowed rows,
two matmul stages, twiddles, magnitudes); this kernel keeps the whole
chain in VMEM per batch tile and writes only the magnitudes back.

Math (Bailey four-step, N = R*C, R = 128 lanes, C = N/128):

    n = n1 + R*n2, k = k2 + C*k1
    Y[n1, k2] = sum_n2 x[n1 + R*n2] * W_C^(n2 k2)      (MXU stage 1)
    Z[n1, k2] = Y[n1, k2] * W_N^(n1 k2)                (VPU twiddle)
    X[k2+C*k1] = sum_n1 W_R^(k1 n1) * Z[n1, k2]        (MXU stage 2)

Layout discipline (Mosaic rejects lane-splitting shape casts — the
first attempt's ``reshape(B, R, C)`` failed with "unsupported shape
cast"): every reshape keeps 128 as the minor dim, and the four-step's
inherent transpose happens as two in-VMEM minor-dim ``swapaxes``
(relayouts), never through HBM. The kernel returns magnitudes in the
raw ``[B, C(k2), R/2+1(k1)]`` stage-2 layout; :func:`bin_order` is the
host-side permutation taking flattened kernel columns to natural bin
order k = k2 + C*k1 (callers compose it into downstream gather plans or
apply one cheap XLA ``take`` outside).

All matmuls run with ``preferred_element_type=float32`` at HIGHEST
precision (TPU default bf16 rounding is fatal at the spectrum's -96 dB
display floor; see CLAUDE.md / mxu_fft.py's measured accuracy).

Measured against the XLA chain and the unfused MXU four-step by
``tools/fused_spectrum_bench.py`` (scan-slope, rotated input, scalar
sync — the house A/B discipline).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedSpectrumPlan", "make_fused_plan", "fused_window_rfft_mag"]

_HIGH = jax.lax.Precision.HIGHEST


class FusedSpectrumPlan:
    """Host-side (numpy — NEVER traced, see MxuFftPlan's leak note)
    constant tables for the fused kernel at one transform size."""

    def __init__(self, n: int, window_kernel: np.ndarray, r: int = 128):
        while n % r and r > 2:
            r //= 2
        if n % r:
            raise ValueError(f"cannot factor n={n}")
        c = n // r
        self.n, self.r, self.c = n, r, c
        self.half = n // 2 + 1
        self.rows1 = r // 2 + 1  # k1 values needed for the half spectrum
        self.out_cols = c * self.rows1  # kernel output columns (padded bins)
        # stage 1 RHS: W_C[n2, k2]
        n2 = np.arange(c)[:, None].astype(np.float64)
        k2 = np.arange(c)[None, :].astype(np.float64)
        ang_c = -2.0 * np.pi * n2 * k2 / c
        self.wc_re = np.cos(ang_c).astype(np.float32)  # [C, C]
        self.wc_im = np.sin(ang_c).astype(np.float32)
        # twiddle T[n1, k2] = W_N^(n1 k2)
        n1 = np.arange(r)[:, None].astype(np.float64)
        k2r = np.arange(c)[None, :].astype(np.float64)
        ang_t = -2.0 * np.pi * n1 * k2r / n
        self.tw_re = np.cos(ang_t).astype(np.float32)  # [R, C]
        self.tw_im = np.sin(ang_t).astype(np.float32)
        # stage 2 RHS (transposed): W_R^T[n1, k1], half-spectrum k1 columns
        k1 = np.arange(self.rows1)[None, :].astype(np.float64)
        n1c = np.arange(r)[:, None].astype(np.float64)
        ang_r = -2.0 * np.pi * n1c * k1 / r
        self.wrt_re = np.cos(ang_r).astype(np.float32)  # [R, rows1]
        self.wrt_im = np.sin(ang_r).astype(np.float32)
        # analysis window, broadcast row (f32 — exact production values)
        w = np.asarray(window_kernel, np.float32)
        if w.shape[-1] != n:
            w = np.pad(w, (0, n - w.shape[-1]))
        self.window = w.reshape(1, n)
        # kernel output column j = k2 * rows1 + k1 holds bin k = k2 + C*k1:
        # bin_order[k] = the kernel column holding natural bin k
        k_nat = np.arange(self.half)
        self.bin_order = ((k_nat % c) * self.rows1 + k_nat // c).astype(np.int32)

    def reorder(self, raw: jax.Array) -> jax.Array:
        """Kernel output [..., out_cols] -> natural bins [..., half]."""
        return raw[..., self.bin_order]


@functools.lru_cache(maxsize=8)
def _plan_cache(n: int, window_key: Tuple[float, ...]) -> FusedSpectrumPlan:
    return FusedSpectrumPlan(n, np.asarray(window_key, np.float32))


def make_fused_plan(n: int, window_kernel) -> FusedSpectrumPlan:
    """Plan for ``n``-point windowed rFFT magnitudes (cached per window)."""
    w = np.asarray(window_kernel, np.float32)
    return _plan_cache(n, tuple(float(v) for v in w))


def _kernel(x_ref, w_ref, wc_re_ref, wc_im_ref, tw_re_ref, tw_im_ref,
            wrt_re_ref, wrt_im_ref, out_ref, *, r: int, c: int, rows1: int):
    b = x_ref.shape[0]
    xw = x_ref[:] * w_ref[:]  # window (broadcast row) [B, N]
    # [B, N] -> [B, C, R] keeps 128 lanes; swap to x2d[b, n1, n2]
    x2d = jnp.swapaxes(xw.reshape(b, c, r), -1, -2)  # [B, R, C]
    # stage 1: C-point DFTs, contraction over n2 (lanes)
    y_re = jax.lax.dot_general(
        x2d, wc_re_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH)  # [B, R, C]
    y_im = jax.lax.dot_general(
        x2d, wc_im_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH)
    # twiddle (VPU) [R, C]
    z_re = y_re * tw_re_ref[:] - y_im * tw_im_ref[:]
    z_im = y_re * tw_im_ref[:] + y_im * tw_re_ref[:]
    # stage 2: R-point DFTs, contraction over n1 — move n1 into lanes
    zt_re = jnp.swapaxes(z_re, -1, -2)  # [B, C(k2), R(n1)]
    zt_im = jnp.swapaxes(z_im, -1, -2)
    dn = (((2,), (0,)), ((), ()))
    o_re = (jax.lax.dot_general(zt_re, wrt_re_ref[:], dn,
                                preferred_element_type=jnp.float32,
                                precision=_HIGH)
            - jax.lax.dot_general(zt_im, wrt_im_ref[:], dn,
                                  preferred_element_type=jnp.float32,
                                  precision=_HIGH))  # [B, C, rows1]
    o_im = (jax.lax.dot_general(zt_re, wrt_im_ref[:], dn,
                                preferred_element_type=jnp.float32,
                                precision=_HIGH)
            + jax.lax.dot_general(zt_im, wrt_re_ref[:], dn,
                                  preferred_element_type=jnp.float32,
                                  precision=_HIGH))
    mags = jnp.sqrt(o_re * o_re + o_im * o_im)  # [B, C(k2), rows1(k1)]
    out_ref[:] = mags


def fused_window_rfft_mag(
    plan: FusedSpectrumPlan,
    rows: jax.Array,
    *,
    tile_b: int = 32,  # 64 exceeds the 16M VMEM scoped limit at N=4096
    interpret: bool = False,
    reorder: bool = True,
) -> jax.Array:
    """Windowed rFFT magnitudes of the trailing axis, one fused kernel.

    ``rows`` [..., W] float32 (raw, unwindowed — the kernel applies the
    plan's window). With ``reorder=True`` (default) returns
    [..., plan.half] magnitudes in natural bin order; ``reorder=False``
    returns the raw [..., out_cols] kernel layout for callers that
    compose ``plan.bin_order`` into their own downstream gather plans.
    Leading axes flatten into the batch grid, padded to ``tile_b``.
    """
    lead = rows.shape[:-1]
    n = plan.n
    if rows.shape[-1] != n:
        pad = n - rows.shape[-1]
        rows = jnp.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(0, pad)])
    flat = rows.reshape(-1, n)
    b_total = flat.shape[0]
    b_pad = -(-b_total // tile_b) * tile_b
    if b_pad != b_total:
        flat = jnp.pad(flat, ((0, b_pad - b_total), (0, 0)))
    grid = (b_pad // tile_b,)

    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    raw = pl.pallas_call(
        functools.partial(_kernel, r=plan.r, c=plan.c, rows1=plan.rows1),
        out_shape=jax.ShapeDtypeStruct((b_pad, plan.c, plan.rows1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const_spec,  # window [1, N]
            const_spec, const_spec,  # W_C re/im [C, C]
            const_spec, const_spec,  # twiddle [R, C]
            const_spec, const_spec,  # W_R^T half [R, rows1]
        ],
        out_specs=pl.BlockSpec(
            (tile_b, plan.c, plan.rows1),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        flat,
        plan.window,
        plan.wc_re, plan.wc_im,
        plan.tw_re, plan.tw_im,
        plan.wrt_re, plan.wrt_im,
    )
    raw = raw[:b_total].reshape(lead + (plan.out_cols,))
    return plan.reorder(raw) if reorder else raw

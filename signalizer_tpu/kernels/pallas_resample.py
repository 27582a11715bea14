"""Fused block-banded resample — the Pallas TPU production kernel.

Re-implements :func:`signalizer_tpu.kernels.oscilloscope._banded_resample`
(ref semantics: the per-pixel windowed-sinc resampler of
OscilloscopeRendering.cpp drawWavePlot's sampleAt<Lanczos>/linear/nearest
taps) as ONE kernel, replacing the XLA formulation's two structural
costs, measured on cfg3 geometry (16 pairs x 2 rows x 8192 px from
16384-sample history, tools/osc_profile.py):

* the band extraction was a `take_along_axis` of nb x width elements per
  row — an ELEMENT gather, which TPU serializes at ~1 element/cycle
  (the dominant cost of the 1.74 ms XLA resample);
* the interpolation weight grid [B, nb, block, width] (~33 MB at cfg3)
  was materialized to HBM between the VPU evaluation and the MXU
  contraction.

Kernel structure (grid = one program per pair, fori over pixel blocks):

* the pair's padded history rows live in VMEM reshaped
  [rows, W/128, 128]; a block's 256-sample source window is TWO ALIGNED
  sublanes (`x_ref[0, :, pl.ds(i_n, 2), :]`) — a cheap dynamic sublane
  slice, no gather and no rotate (weights are evaluated against absolute
  source positions, so window alignment costs nothing);
* the [128 px, 256 src] Lanczos grid is evaluated in registers with the
  same separated-transcendental identity as the XLA path (sin terms are
  1-D in pixel position and source index; the 2-D grid is pure rational
  ops) and never touches HBM;
* the contraction is two [rows, 128] x [128 px, 128] MXU `dot_general`s
  per block with f32 accumulation.

Exactness: same weight formula as the XLA banded path, with the MXU
dots forced to the f32 multi-pass (`Precision.HIGHEST` — the default
bf16 multiplication measured 2e-2 abs error); validated against the
per-tap numpy oracle in tests/test_pallas_resample.py, and agrees with
the XLA path to 9.5e-7 on device. Coverage condition: the 256-wide
aligned window must span a block's taps after sublane alignment —
max_step * (block - 1) + 2a + 2 + 128 <= 256, i.e. step <= ~0.835 for
the production Lanczos a=10 (upsampled displays; cfg3's step is 0.125).
Wider zooms take the existing XLA wide-band/gather paths via
`_banded_dispatch`.

Measured (TPU v5 lite, cfg3 geometry, scan-slope scalar-checksum sync,
tools/resample_bench.py, round 3; dual-output rows round 5):

    ==============================  ===========
    formulation                     ms/step
    ==============================  ===========
    XLA banded (width 64)           1.739
    fused Pallas (this)             0.554   (3.1x)
    2x Pallas (lanczos + nearest)   0.948   (old env_os=1 envelope pair)
    dual-output (with_nearest)      0.725   (24% off the pair)
    ==============================  ===========

Dual-output parity on device: wave bit-equal to the single-output
call, nearest bit-equal to the XLA banded nearest (round 5).

This is the production path: `_banded_dispatch` routes every covered
resample here on TPU (kernels/oscilloscope.py), and the oscilloscope
step's env_os==1 envelope pick rides the dual output
(`sinc_resample_with_nearest`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "fused_banded_resample",
    "pallas_resample_supported",
    "covers",
    "BLOCK",
    "WIN",
]

BLOCK = 128  # output pixels per block
WIN = 256  # aligned source window per block (two 128-sample sublanes)


def pallas_resample_supported() -> bool:
    """True when the compiled kernel can run here (TPU backend)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def covers(max_step, a: int):
    """Window-coverage predicate (traced-safe): every 128-px block's tap
    span must fit the 256-wide aligned window, worst case alignment."""
    return max_step * (BLOCK - 1) + 2 * a + 2 + BLOCK <= WIN


def _kernel(s_ref, x_ref, pos_ref, out_ref, near_ref=None, *, a: int,
            kind: str, nb: int, pad_l: int):
    """One pair. x_ref [1, R, W128, 128]; pos_ref [1, nb, 128];
    s_ref (prefetched) [pairs, nb] int32 window sublane starts;
    out_ref [1, nb, R, 128]. ``near_ref`` (present when the caller asks
    for the dual output): nearest-sample picks at the SAME positions —
    the oscilloscope step's min-max envelope source when env_os == 1,
    reusing this kernel's band window and t-grid instead of paying a
    second full banded pass (round-4 verdict #5)."""
    b = pl.program_id(0)

    # Mosaic's iota is integer-only; cast after
    l_vec = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1).astype(jnp.float32)

    def block(n, carry):
        i_n = s_ref[b, n]
        pos = pos_ref[0, n, :].reshape(1, BLOCK)
        # absolute source positions of the window samples, in the same
        # (pre-padding) coordinate frame as pos
        src = (i_n * 128 - pad_l).astype(jnp.float32) + l_vec  # [1, WIN]
        t = pos.reshape(BLOCK, 1) - src  # [BLOCK, WIN]
        if kind == "lanczos":
            # identical formulation to the XLA banded path (argument
            # reduction before the f32 sine; separable 1-D sin terms)
            sp = jnp.sin(jnp.pi * jnp.mod(pos, 2.0))
            spa = jnp.sin(jnp.pi * jnp.mod(pos, 2.0 * a) / a)
            cpa = jnp.cos(jnp.pi * jnp.mod(pos, 2.0 * a) / a)
            sgn = 1.0 - 2.0 * jnp.mod(jnp.abs(src), 2.0)
            csa = jnp.cos(jnp.pi * jnp.mod(src, 2.0 * a) / a)
            ssa = jnp.sin(jnp.pi * jnp.mod(src, 2.0 * a) / a)
            sin_t = sgn * sp.reshape(BLOCK, 1)
            sin_ta = spa.reshape(BLOCK, 1) * csa - cpa.reshape(BLOCK, 1) * ssa
            near0 = jnp.abs(t) < 1e-6
            denom = jnp.where(near0, 1.0, t * t)
            w = jnp.where(
                near0, 1.0, a * sin_t * sin_ta / (jnp.pi * jnp.pi * denom)
            )
            w = jnp.where(jnp.abs(t) < a, w, 0.0)
        elif kind == "linear":
            w = jnp.maximum(0.0, 1.0 - jnp.abs(t))
        elif kind == "nearest":
            w = ((t >= -0.5) & (t < 0.5)).astype(jnp.float32)
        else:  # pragma: no cover
            raise ValueError(kind)
        win = x_ref[0, :, pl.ds(i_n, 2), :]  # [R, 2, 128]
        # MXU default is bf16 multiplication (2e-2 abs error measured on
        # unit-variance data); force the f32 multi-pass like the XLA
        # path's precision=HIGHEST einsum — the dots are a trivial share
        # of the kernel (the VPU weight grid dominates)
        acc = jax.lax.dot_general(
            win[:, 0, :], w[:, :128],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [R, BLOCK]
        acc = acc + jax.lax.dot_general(
            win[:, 1, :], w[:, 128:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, n, :, :] = acc
        if near_ref is not None:
            # nearest weights off the already-computed t grid: 2 compares
            # + 2 dots, vs a whole second kernel invocation (band DMA +
            # t grid + loop) for the standalone nearest pass
            wn = ((t >= -0.5) & (t < 0.5)).astype(jnp.float32)
            nacc = jax.lax.dot_general(
                win[:, 0, :], wn[:, :128],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            nacc = nacc + jax.lax.dot_general(
                win[:, 1, :], wn[:, 128:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            near_ref[0, n, :, :] = nacc
        return carry

    jax.lax.fori_loop(0, nb, block, 0)


@functools.partial(
    jax.jit, static_argnames=("a", "kind", "interpret", "with_nearest")
)
def fused_banded_resample(
    x: jax.Array,  # [B, R, W] history rows (pairs x display rows)
    pos: jax.Array,  # [B, P] fractional source positions (shared by rows)
    *,
    a: int,
    kind: str = "lanczos",
    interpret: bool = False,
    with_nearest: bool = False,
) -> jax.Array:
    """Drop-in for the XLA banded resample on [B, R, W] x [B, P] shapes.

    Returns [B, R, P]. P must be a multiple of 128. Edge behaviour
    matches the per-tap clip (edge padding, as in `_banded_resample`);
    positions may legally sit a kernel radius outside [0, W-1].
    ``with_nearest`` additionally returns the nearest-sample pick at the
    same positions as a second [B, R, P] array (one fused pass — see
    ``_kernel``).
    """
    from jax.experimental.pallas import tpu as pltpu

    bsz, rows, w = x.shape
    p = pos.shape[-1]
    nb = p // BLOCK
    if p % BLOCK != 0:  # pragma: no cover — dispatch guards this
        raise ValueError(f"pixels {p} not a multiple of {BLOCK}")
    # identical slack/padding to the XLA banded path; pad_r additionally
    # covers the full aligned window overhang
    pad_l = 2 * a + 2
    pad_r = WIN + a
    xp = jnp.concatenate(
        [
            jnp.repeat(x[..., :1], pad_l, axis=-1),
            x,
            jnp.repeat(x[..., -1:], pad_r, axis=-1),
        ],
        axis=-1,
    )
    wp = xp.shape[-1]
    w128 = ((wp + 127) // 128) * 128
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, w128 - wp)), mode="edge")
    x4 = xp.reshape(bsz, rows, w128 // 128, 128)
    pos_b = pos.reshape(bsz, nb, BLOCK)
    # window start sublane: the block's first tap, in padded coordinates
    base = jnp.floor(pos_b[..., 0]) - (a - 1) + pad_l  # [B, nb]
    s = jnp.clip(base.astype(jnp.int32) // 128, 0, w128 // 128 - 2)

    in_specs = [
        pl.BlockSpec(
            (1, rows, w128 // 128, 128), lambda b, s_ref: (b, 0, 0, 0)
        ),
        pl.BlockSpec((1, nb, BLOCK), lambda b, s_ref: (b, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, nb, rows, BLOCK), lambda b, s_ref: (b, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec] if with_nearest else out_spec,
    )
    shape = jax.ShapeDtypeStruct((bsz, nb, rows, BLOCK), jnp.float32)
    if with_nearest:
        out, near = pl.pallas_call(
            functools.partial(_kernel, a=a, kind=kind, nb=nb, pad_l=pad_l),
            grid_spec=grid_spec,
            out_shape=[shape, shape],
            interpret=interpret,
        )(s, x4, pos_b)
        return (
            out.transpose(0, 2, 1, 3).reshape(bsz, rows, p),
            near.transpose(0, 2, 1, 3).reshape(bsz, rows, p),
        )
    out = pl.pallas_call(
        functools.partial(_kernel, a=a, kind=kind, nb=nb, pad_l=pad_l),
        grid_spec=grid_spec,
        out_shape=shape,
        interpret=interpret,
    )(s, x4, pos_b)
    return out.transpose(0, 2, 1, 3).reshape(bsz, rows, p)

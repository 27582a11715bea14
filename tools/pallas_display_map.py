"""Fused spectrum display-map Pallas kernel — RETIRED to tools/ (round 3).

The production display path is the XLA gather/segment pipeline in
``signalizer_tpu/kernels/spectrum.py``; this module is kept outside the
package as the validated Pallas formulation, its benchmark yardstick
(``tools/pallas_rematch_bench.py``) and the written record of why a
hand-fused kernel loses here. It has no package dependents.

Fuses the whole post-FFT display chain — bin->pixel interpolation,
chunked bin-max, peak-decay state update and normalized dB mapping
(ref: TransformDSP.inl mapToLinearSpace :504-1135 +
mapAndTransformDFTFilters :1297-1435) — into ONE kernel so magnitudes are
read from HBM once and every intermediate lives in VMEM. The FFT itself
stays on XLA's native path (its TPU FFT is already optimal); this kernel
replaces the gather/segment/select/log tail, which XLA executes as several
HBM-bound fusions.

TPU-first re-formulation of the remap plan for the MXU/VPU (round 2 —
replaces the round-1 masked-max kernel, which did O(bins x pixels) VPU
work and measured 16 ms vs XLA's 4 ms):

* tap interpolation is a dense **matmul** ``|mags @ W|`` over the
  spectrum MAGNITUDES (the reference abs()'s csf before its loops,
  TransformDSP.inl:557-560; |.| is computed in-kernel from the (re, im)
  inputs) with a precomputed sparse-in-structure weight matrix
  W [n_values, P] — gathers become MXU work;
* chunked bin-max exploits that the plan's chunks are **contiguous bin
  ranges**: a Hillis-Steele *reset scan* (running max that restarts at
  each segment boundary, log2(n) static-shift steps on the VPU) produces
  the per-segment running max, and a **one-hot end-selector matmul**
  ``rm @ E`` picks each pixel's chunk max — O(n log n) VPU + MXU instead
  of O(n x P) VPU;
* single-bin pixels read the raw magnitude through one-hot columns
  folded into W (their interp columns are otherwise zero), so they ride
  the same matmul;
* decay + dB run on the freshly produced pixel tile in registers.

The grid is (pixel-tile, batch-tile) — pixel slowest — so the heavy
per-pixel-tile operands (W/E/S) stay resident in VMEM while the batch
sweeps (pallas skips reloads when the block index is unchanged).

**Measured rematch verdict (TPU v5 litepod, B=1024, P=1024, 8193 bins,
warm cache, 16-deep chained dispatch, scalar-checksum sync; re-measure
with tools/pallas_rematch_bench.py):**

=============================================  ========
round-1 masked-max kernel                       16.0 ms
round-2 pixel-slowest reset-scan + MXU           3.83 ms
round-3 batch-slowest, scratch-cached scan       7.96 ms
XLA dense formulation                            1.69 ms
=============================================  ========

(A complex-cell two-matmul interpolation variant was also measured at
3.93 ms before being retired — the reference's loops run over abs()'d
cells, so magnitude interpolation is the faithful form.)

max display error vs production: 6.4e-4 (bf16 chunk-max selection,
~0.05 dB). Why it loses, concretely: the dense-operand design carries
W/E selector matrices of [n_values, P] — at 8193 bins x 1024 px that is
~12.8 MB per pixel tile in bf16. Pixel-slowest grids keep them VMEM-
resident but re-scan the full bin axis per pixel tile (3.83 ms);
batch-slowest grids cache the scan in scratch but re-stream W/E per
batch step — and Mosaic further forces the last block dim to 128, so
the double-buffered operand tiles corner the 16 MB VMEM (7.96 ms). XLA's
scatter-based segment-max pipeline never materializes dense selectors at
all, which is the structural advantage a Pallas kernel of this
formulation cannot buy back. An XLA-level associative reset-scan was
also measured (5.4 ms vs 3.6 ms full-pipeline) and likewise retired.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class DisplayMapOperands(NamedTuple):
    """Per-Constant precomputed device operands."""

    interp_w: jax.Array  # [nv, P] f32 interp weights (x inv_size), plus
    #                       one-hot x inv_size columns for single-bin pixels
    end_sel: jax.Array  # [nv, P] bf16 one-hot at each pixel's chunk-end bin
    flags: jax.Array  # [1, n_values] f32 1.0 at segment starts
    select: jax.Array  # [P] 1.0 where the matmul result is used
    #                    (interp or single-bin), 0.0 where the scan max
    slope_over_lower: jax.Array  # [P] slope_map / lower_fraction


def make_display_map_operands(constant) -> DisplayMapOperands:
    """Build the dense operands from a SpectrumConstant's remap plan."""
    nv = constant.n_spectrum_values
    p = constant.axis_points
    from signalizer_tpu.core.constant import host_view

    idx = np.asarray(host_view(constant, "interp_indices"))  # [P, taps]
    wts = np.asarray(host_view(constant, "interp_weights"))  # [P, taps]
    inv = float(host_view(constant, "inv_size"))

    interp_mask = np.asarray(host_view(constant, "interp_mask"))
    interp_w = np.zeros((nv, p), np.float32)
    for px in range(p):
        for t in range(idx.shape[1]):
            interp_w[idx[px, t], px] += wts[px, t] * inv
    # the plan carries placeholder taps for non-interp pixels (production
    # masks them out via interp_mask); zero those columns so single-bin
    # one-hots can ride the same matmul
    interp_w[:, ~interp_mask] = 0.0

    seg_ids = np.asarray(host_view(constant, "segment_ids"))  # [nv] pixel id or P
    single_mask = np.asarray(host_view(constant, "single_mask"))
    single_bin = np.asarray(host_view(constant, "single_bin"))

    # segment boundaries (chunks are contiguous bin ranges by construction
    # of the reference's pixel walk — each pixel owns {oldBin+1 .. bin})
    flags = np.ones(nv, np.float32)
    flags[1:] = (seg_ids[1:] != seg_ids[:-1]).astype(np.float32)

    # per-pixel chunk-end bins; pure one-hot (exact in bf16), the
    # inv_size scale applied after the matmul. Single-bin pixels fold an
    # inv-scaled one-hot into their (otherwise zero) W column instead.
    end_sel = np.zeros((nv, p), np.float32)
    for px in range(p):
        if single_mask[px]:
            interp_w[single_bin[px], px] = inv
        else:
            owned = np.nonzero(seg_ids == px)[0]
            if len(owned):
                end_sel[owned[-1], px] = 1.0

    select = (interp_mask | single_mask).astype(np.float32)

    ln10_over_20 = 0.11512925464970229
    lower = np.exp(host_view(constant, "low_dbs") * ln10_over_20)
    slope_over_lower = (np.asarray(host_view(constant, "slope_map"), np.float64) / lower).astype(np.float32)

    # W stays f32 (bf16 Lanczos taps lose ~1% under cancellation); the
    # end selector is exact one-hot in bf16. Two matrices double-buffer
    # within the 16 MB VMEM where three f32 ones did not.
    return DisplayMapOperands(
        interp_w=jnp.asarray(interp_w),
        end_sel=jnp.asarray(end_sel, jnp.bfloat16),
        flags=jnp.asarray(flags).reshape(1, -1),
        select=jnp.asarray(select),
        slope_over_lower=jnp.asarray(slope_over_lower),
    )


def pallas_supported() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(
    mags_ref,  # [Bt, nv_padded] f32 spectrum magnitudes
    interp_w_ref,  # [nv_padded, Pt] f32
    end_sel_ref,  # [nv_padded, Pt] bf16
    flags_ref,  # [1, nv_padded] f32 (1.0 at segment starts)
    select_ref,  # [1, Pt]
    slope_ref,  # [1, Pt]
    state_ref,  # [Bt, Pt] (decay state in)
    scalars_ref,  # [1, 4] SMEM: pole, delta_y_recip, clip_db, inv_size
    out_ref,  # [Bt, Pt] display values
    new_state_ref,  # [Bt, Pt]
    vscan_ref,  # scratch [Bt, nv_padded] bf16 — segment running max cache
    *,
    n_values: int,
):
    import jax.experimental.pallas as pl

    pole = scalars_ref[0, 0]
    delta_y_recip = scalars_ref[0, 1]
    clip_db = scalars_ref[0, 2]
    inv_size = scalars_ref[0, 3]

    # batch is the SLOW grid axis and pixels the fast one, so the reset
    # scan below runs ONCE per batch tile (at the first pixel tile) into
    # VMEM scratch and every pixel tile of the sweep reuses it — the v1
    # pixel-slowest layout re-scanned the full bin axis AND re-streamed
    # the spectrum from HBM once per pixel tile (8x redundant work, the
    # measured 2x loss vs XLA)
    @pl.when(pl.program_id(1) == 0)
    def _scan():
        # segment running max via Hillis-Steele reset scan over the bin
        # axis: log2(n) static shifts, each a pad+slice+select on the VPU.
        # Flags stay f32 (1.0 = blocked) — Mosaic cannot bitcast i1
        # vectors. Stored bf16: only the (already bf16) end-selection
        # matmul consumes it.
        v = mags_ref[:]
        blocked = jnp.broadcast_to(flags_ref[0, :], v.shape)
        d = 1
        while d < n_values:
            v_prev = jnp.pad(v[:, :-d], ((0, 0), (d, 0)), constant_values=NEG_INF)
            b_prev = jnp.pad(blocked[:, :-d], ((0, 0), (d, 0)), constant_values=1.0)
            v = jnp.where(blocked > 0.5, v, jnp.maximum(v, v_prev))
            blocked = jnp.maximum(blocked, b_prev)
            d *= 2
        vscan_ref[:] = v.astype(jnp.bfloat16)

    # interpolation: one MXU matmul (weights already include inv_size;
    # |.| after the sum rectifies Lanczos negative lobes)
    interp = jnp.abs(
        jnp.dot(mags_ref[:], interp_w_ref[:], preferred_element_type=jnp.float32)
    )  # [Bt, Pt]

    # chunk max: one-hot end-selection matmul (MXU); bf16 value rounding
    # costs ~0.4% on chunk maxima (~0.03 dB displayed)
    segmax = jnp.dot(vscan_ref[:], end_sel_ref[:], preferred_element_type=jnp.float32)
    binmax = segmax * inv_size

    sel = select_ref[0, :]
    vals = sel * interp + (1.0 - sel) * binmax

    # peak decay + dB map
    new_state = jnp.maximum(pole * state_ref[:], vals)
    x = slope_ref[0, :] * new_state
    out = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-38)) * delta_y_recip, clip_db)

    out_ref[:] = out
    new_state_ref[:] = new_state


@functools.partial(jax.jit, static_argnames=("batch_tile", "pixel_tile", "interpret"))
def fused_display_map(
    spec_re: jax.Array,  # [B, n_values] spectrum real part (pre inv_size)
    spec_im: jax.Array,  # [B, n_values] spectrum imag part
    state: jax.Array,  # [B, P] decay state
    operands: DisplayMapOperands,
    pole: jax.Array,
    low_dbs: jax.Array,
    high_dbs: jax.Array,
    clip_db: jax.Array,
    inv_size: jax.Array,  # kept for API parity; folded into the operands
    *,
    batch_tile: int = 32,
    pixel_tile: int = 128,  # Mosaic: last block dim must be 128-divisible
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused remap+decay+dB: returns (display [B, P], new_state [B, P]).

    v2 layout: |spec| is one XLA elementwise pass (fused into whatever
    produced the spectrum); the pallas grid runs batch SLOWEST so each
    batch tile's reset scan happens once into VMEM scratch and the
    spectrum block streams from HBM once, while the [nv, Pt] W/E operand
    tiles stream per pixel step. See the module docstring's measured
    table for the verdict vs the XLA production tail.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nv = spec_re.shape
    p = state.shape[-1]
    batch_tile = min(batch_tile, b)
    pixel_tile = min(pixel_tile, p)
    assert b % batch_tile == 0, (b, batch_tile)
    assert p % pixel_tile == 0, (p, pixel_tile)

    # |.| outside the kernel: the reference abs()'s every spectrum cell
    # BEFORE its interpolation loops (TransformDSP.inl:557-560 etc.), so
    # every in-kernel consumer runs over MAGNITUDES
    mags = jnp.sqrt(spec_re * spec_re + spec_im * spec_im)

    # pad the bin axis to the f32 lane multiple (padded bins: spec 0,
    # weights 0, flag 1 — they form their own never-selected segment)
    nv_pad = -(-nv // 128) * 128
    if nv_pad != nv:
        pad = nv_pad - nv
        mags = jnp.pad(mags, ((0, 0), (0, pad)))
        operands = operands._replace(
            interp_w=jnp.pad(operands.interp_w, ((0, pad), (0, 0))),
            end_sel=jnp.pad(operands.end_sel, ((0, pad), (0, 0))),
            flags=jnp.pad(operands.flags, ((0, 0), (0, pad)), constant_values=1.0),
        )
        nv = nv_pad

    ln10_over_20 = 0.11512925464970229
    lower = jnp.exp(low_dbs * ln10_over_20)
    upper = jnp.exp(high_dbs * ln10_over_20)
    delta_y_recip = 1.0 / jnp.log(upper / lower)
    scalars = jnp.stack([pole, delta_y_recip, clip_db, inv_size]).reshape(1, 4).astype(jnp.float32)

    # batch SLOWEST, pixels fastest: the [Bt, nv] spectrum block and the
    # scratch scan persist across the pixel sweep; only the [nv, Pt] W/E
    # tiles stream per step
    grid = (b // batch_tile, p // pixel_tile)
    kernel = functools.partial(_kernel, n_values=nv)

    out, new_state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, nv), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nv), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, pixel_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((batch_tile, pixel_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, pixel_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p), jnp.float32),
            jax.ShapeDtypeStruct((b, p), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch_tile, nv), jnp.bfloat16)],
        interpret=interpret,
    )(
        mags,
        operands.interp_w,
        operands.end_sel,
        operands.flags,
        operands.select.reshape(1, -1),
        operands.slope_over_lower.reshape(1, -1),
        state,
        scalars,
    )
    return out, new_state


def reference_display_map(
    spec_re, spec_im, state, operands, pole, low_dbs, high_dbs, clip_db, inv_size
):
    """XLA (non-pallas) evaluation of the same formulation — used to
    validate the kernel and as the fallback on non-TPU backends."""
    mags = jnp.sqrt(spec_re * spec_re + spec_im * spec_im)
    interp = jnp.abs(mags @ operands.interp_w)

    flags = operands.flags[0] > 0.5

    def combine(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf)

    v, _ = jax.lax.associative_scan(
        combine, (mags, jnp.broadcast_to(flags, mags.shape)), axis=-1
    )
    segmax = v @ operands.end_sel.astype(jnp.float32)
    binmax = segmax * inv_size
    vals = operands.select * interp + (1.0 - operands.select) * binmax
    new_state = jnp.maximum(pole * state, vals)
    ln10_over_20 = 0.11512925464970229
    lower = jnp.exp(low_dbs * ln10_over_20)
    upper = jnp.exp(high_dbs * ln10_over_20)
    delta_y_recip = 1.0 / jnp.log(upper / lower)
    x = operands.slope_over_lower * new_state
    out = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-38)) * delta_y_recip, clip_db)
    return out, new_state

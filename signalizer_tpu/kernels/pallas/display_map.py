"""Fused spectrum display-map Pallas kernel (the BASELINE north star).

Fuses the whole post-FFT display chain — bin->pixel interpolation,
chunked bin-max, peak-decay state update and normalized dB mapping
(ref: TransformDSP.inl mapToLinearSpace :504-1135 +
mapAndTransformDFTFilters :1297-1435) — into ONE kernel so magnitudes are
read from HBM once and every intermediate lives in VMEM. The FFT itself
stays on XLA's native path (its TPU FFT is already optimal); this kernel
replaces the gather/segment/select/log tail, which XLA executes as several
HBM-bound fusions.

TPU-first re-formulation of the remap plan for the MXU/VPU:

* tap interpolation becomes a dense **matmul** ``mags @ W`` with a
  precomputed sparse-in-structure weight matrix W [n_values, P]
  (taps-per-pixel scattered into rows) — gathers become MXU work;
* chunked bin-max becomes a **masked max**: ``max_v(mags[v] + M[v, p])``
  with M[v, p] = 0 where bin v belongs to pixel p's chunk and -inf
  elsewhere — streamed over bin chunks in VMEM;
* decay + dB run on the freshly produced pixel tile in registers.

The kernel runs on a (batch-tile x pixel-tile) grid; every operand is
produced once per Constant by :func:`make_display_map_operands`.

**Measured verdict (TPU v5 lite, B=1024, P=1024, 2049 bins):** the kernel
is numerically correct on hardware (max err 6e-4 vs production) but the
masked-max bin-max formulation performs O(bins x pixels) VPU work where
the production segment-max does O(bins); measured 16.0 ms vs 4.0 ms for
the XLA gather pipeline. Production therefore keeps the XLA path
(kernels/spectrum.py) — "let XLA fuse what it already fuses well" — and
this kernel is retained as a validated alternative formulation and a
pallas reference for future fusions where XLA's scheduling falls short.
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

    interp_w: jax.Array  # [n_values, P] interp weight matrix (x inv_size)
    seg_mask: jax.Array  # [n_values, P] 0 / -inf chunk membership
    select: jax.Array  # [P] 1.0 where interpolation, 0.0 where bin-max
    slope_over_lower: jax.Array  # [P] slope_map / lower_fraction
    single_scale: jax.Array  # [P] inv_size replicated (bin-max scaling)


def make_display_map_operands(constant) -> DisplayMapOperands:
    """Build the dense operands from a SpectrumConstant's remap plan."""
    nv = constant.n_spectrum_values
    p = constant.axis_points
    from signalizer_tpu.core.constant import host_view

    idx = np.asarray(host_view(constant, "interp_indices"))  # [P, taps]
    wts = np.asarray(host_view(constant, "interp_weights"))  # [P, taps]
    inv = float(host_view(constant, "inv_size"))

    interp_w = np.zeros((nv, p), np.float32)
    for px in range(p):
        for t in range(idx.shape[1]):
            interp_w[idx[px, t], px] += wts[px, t] * inv

    seg_ids = np.asarray(host_view(constant, "segment_ids"))  # [nv] pixel id or P
    seg_mask = np.full((nv, p), NEG_INF, np.float32)
    owned = seg_ids < p
    seg_mask[np.nonzero(owned)[0], seg_ids[owned]] = 0.0
    # single-bin pixels: their chunk is exactly one bin
    single_mask = np.asarray(host_view(constant, "single_mask"))
    single_bin = np.asarray(host_view(constant, "single_bin"))
    for px in np.nonzero(single_mask)[0]:
        seg_mask[:, px] = NEG_INF
        seg_mask[single_bin[px], px] = 0.0

    select = np.asarray(host_view(constant, "interp_mask")).astype(np.float32)

    ln10_over_20 = 0.11512925464970229
    lower = np.exp(host_view(constant, "low_dbs") * ln10_over_20)
    slope_over_lower = (np.asarray(host_view(constant, "slope_map"), np.float64) / lower).astype(np.float32)

    return DisplayMapOperands(
        interp_w=jnp.asarray(interp_w),
        seg_mask=jnp.asarray(seg_mask),
        select=jnp.asarray(select),
        slope_over_lower=jnp.asarray(slope_over_lower),
        single_scale=jnp.full((p,), inv, jnp.float32),
    )


def pallas_supported() -> bool:
    """Pallas TPU kernels need a real TPU backend."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(
    mags_ref,  # [Bt, nv_padded] f32
    interp_w_ref,  # [nv_padded, Pt]
    seg_mask_ref,  # [nv_padded, Pt]
    select_ref,  # [1, Pt]
    slope_ref,  # [1, Pt]
    state_ref,  # [Bt, Pt] (decay state in)
    scalars_ref,  # [1, 4] SMEM: pole, delta_y_recip, clip_db, inv_size
    out_ref,  # [Bt, Pt] display values
    new_state_ref,  # [Bt, Pt]
    *,
    v_chunk: int,
    n_values: int,
):
    from jax.experimental import pallas as pl

    pole = scalars_ref[0, 0]
    delta_y_recip = scalars_ref[0, 1]
    clip_db = scalars_ref[0, 2]
    inv_size = scalars_ref[0, 3]

    # interpolation: MXU matmul (weights already include inv_size and abs
    # is applied after the sum — matches the reference's |interp(complex)|
    # up to the documented magnitude-interp convention)
    interp = jnp.abs(
        jnp.dot(mags_ref[:], interp_w_ref[:], preferred_element_type=jnp.float32)
    )  # [Bt, Pt]

    # bin-max: streamed masked max over bin chunks (ref slices use pl.ds —
    # pallas TPU cannot lower dynamic_slice on materialized values).
    # n_values is pre-padded to a multiple of v_chunk; padded rows carry
    # mags 0 / mask -inf so they never win the max.
    bt = out_ref.shape[0]
    pt = out_ref.shape[1]
    num_chunks = n_values // v_chunk

    def chunk_body(c, acc):
        m = mags_ref[:, pl.ds(c * v_chunk, v_chunk)]
        mask = seg_mask_ref[pl.ds(c * v_chunk, v_chunk), :]
        contrib = jnp.max(m[:, :, None] + mask[None, :, :], axis=1)
        return jnp.maximum(acc, contrib)

    segmax = jax.lax.fori_loop(
        0, num_chunks, chunk_body, jnp.full((bt, pt), NEG_INF, jnp.float32)
    )
    binmax = jnp.maximum(segmax, 0.0) * inv_size

    sel = select_ref[0, :]
    vals = sel * interp + (1.0 - sel) * binmax

    # peak decay + dB map
    new_state = jnp.maximum(pole * state_ref[:], vals)
    x = slope_ref[0, :] * new_state
    out = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-38)) * delta_y_recip, clip_db)

    out_ref[:] = out
    new_state_ref[:] = new_state


@functools.partial(jax.jit, static_argnames=("batch_tile", "pixel_tile", "v_chunk"))
def fused_display_map(
    mags: jax.Array,  # [B, n_values] linear bin magnitudes (pre inv_size)
    state: jax.Array,  # [B, P] decay state
    operands: DisplayMapOperands,
    pole: jax.Array,
    low_dbs: jax.Array,
    high_dbs: jax.Array,
    clip_db: jax.Array,
    inv_size: jax.Array,
    *,
    batch_tile: int = 8,
    pixel_tile: int = 128,
    v_chunk: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Fused remap+decay+dB: returns (display [B, P], new_state [B, P])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nv = mags.shape
    p = state.shape[-1]
    assert b % batch_tile == 0, (b, batch_tile)
    assert p % pixel_tile == 0, (p, pixel_tile)

    # pad the bin axis to a multiple of v_chunk (padded rows: mags 0,
    # interp weight 0, seg mask -inf — inert in both reductions)
    nv_pad = -(-nv // v_chunk) * v_chunk
    if nv_pad != nv:
        pad = nv_pad - nv
        mags = jnp.pad(mags, ((0, 0), (0, pad)))
        operands = operands._replace(
            interp_w=jnp.pad(operands.interp_w, ((0, pad), (0, 0))),
            seg_mask=jnp.pad(
                operands.seg_mask, ((0, pad), (0, 0)), constant_values=NEG_INF
            ),
        )
        nv = nv_pad

    ln10_over_20 = 0.11512925464970229
    lower = jnp.exp(low_dbs * ln10_over_20)
    upper = jnp.exp(high_dbs * ln10_over_20)
    delta_y_recip = 1.0 / jnp.log(upper / lower)
    scalars = jnp.stack([pole, delta_y_recip, clip_db, inv_size]).reshape(1, 4).astype(jnp.float32)

    grid = (b // batch_tile, p // pixel_tile)
    kernel = functools.partial(_kernel, v_chunk=v_chunk, n_values=nv)

    out, new_state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, nv), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, pixel_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
    )(
        mags,
        operands.interp_w,
        operands.seg_mask,
        operands.select.reshape(1, -1),
        operands.slope_over_lower.reshape(1, -1),
        state,
        scalars,
    )
    return out, new_state


def reference_display_map(mags, state, operands, pole, low_dbs, high_dbs, clip_db, inv_size):
    """XLA (non-pallas) evaluation of the same dense formulation — used to
    validate the kernel and as the fallback on non-TPU backends."""
    interp = jnp.abs(mags @ operands.interp_w)
    segmax = jnp.max(mags[:, :, None] + operands.seg_mask[None], axis=1)
    binmax = jnp.maximum(segmax, 0.0) * inv_size
    vals = operands.select * interp + (1.0 - operands.select) * binmax
    new_state = jnp.maximum(pole * state, vals)
    ln10_over_20 = 0.11512925464970229
    lower = jnp.exp(low_dbs * ln10_over_20)
    upper = jnp.exp(high_dbs * ln10_over_20)
    delta_y_recip = 1.0 / jnp.log(upper / lower)
    x = operands.slope_over_lower * new_state
    out = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-38)) * delta_y_recip, clip_db)
    return out, new_state

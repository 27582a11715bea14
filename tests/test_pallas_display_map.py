"""Fused display-map: dense formulation vs the production gather pipeline,
and the pallas kernel vs the dense reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signalizer_tpu.core.config import (
    BinInterpolation,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.core.constant import make_spectrum_constant
from signalizer_tpu.kernels.pallas.display_map import (
    make_display_map_operands,
    reference_display_map,
)
from signalizer_tpu.kernels.spectrum import (
    _half_spectrum,
    _pack_channels,
    analyze_frames,
    init_line_graph_state,
)

FS = 48_000.0


def _constant(axis_points=256, window=1024, interp=BinInterpolation.LINEAR):
    return make_spectrum_constant(
        axis_points=axis_points,
        window_size=window,
        sample_rate=FS,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=interp,
        view_scaling=ViewScaling.LOGARITHMIC,
        decay_seconds=(0.1,),
        num_line_graphs=1,
    )


def _mags(constant, b=8, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((b, 2, constant.window_size)).astype(np.float32) * 0.3
    rows = _pack_channels(constant, jnp.asarray(frames))
    return jnp.abs(_half_spectrum(constant, rows))[:, 0, :], frames


@pytest.mark.parametrize("interp", [BinInterpolation.NONE, BinInterpolation.LINEAR, BinInterpolation.LANCZOS])
def test_dense_formulation_matches_production_pipeline(interp):
    """The matmul+masked-max formulation must reproduce the gather/segment
    pipeline's post-processed output."""
    constant = _constant(interp=interp)
    operands = make_display_map_operands(constant)
    mags, frames = _mags(constant)
    state = jnp.zeros((8, constant.axis_points), jnp.float32)
    out, new_state = reference_display_map(
        mags, state, operands,
        constant.decay_poles[0], constant.low_dbs, constant.high_dbs,
        constant.clip_db, constant.inv_size,
    )
    # production path
    ref_state = init_line_graph_state(constant, (8,))
    ref = analyze_frames(constant, ref_state, jnp.asarray(frames)[:, None])
    want = np.asarray(ref.results)[:, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(new_state), np.asarray(ref.state.magnitude)[:, 0, 0], rtol=1e-3, atol=1e-5
    )


def test_pallas_kernel_matches_dense_reference_interpret():
    """Run the actual pallas kernel in interpreter mode and compare."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from signalizer_tpu.kernels.pallas import display_map as dm

    constant = _constant(axis_points=256, window=512)
    operands = make_display_map_operands(constant)
    mags, _ = _mags(constant, b=8, seed=3)
    state = jnp.asarray(np.random.default_rng(4).random((8, 256)).astype(np.float32))
    args = (
        constant.decay_poles[0],
        constant.low_dbs,
        constant.high_dbs,
        constant.clip_db,
        constant.inv_size,
    )
    want, want_state = reference_display_map(mags, state, operands, *args)

    # interpret-mode pallas_call (monkeypatch through the module's pl)
    b, nv = mags.shape
    p = 256
    bt, pt, vc = 8, 128, 128
    ln10_over_20 = 0.11512925464970229
    lower = jnp.exp(args[1] * ln10_over_20)
    upper = jnp.exp(args[2] * ln10_over_20)
    scalars = jnp.stack(
        [args[0], 1.0 / jnp.log(upper / lower), args[3], args[4]]
    ).reshape(1, 4).astype(jnp.float32)
    kernel = functools.partial(dm._kernel, v_chunk=vc, n_values=nv)
    out, new_state = pl.pallas_call(
        kernel,
        grid=(b // bt, p // pt),
        in_specs=[
            pl.BlockSpec((bt, nv), lambda i, j: (i, 0)),
            pl.BlockSpec((nv, pt), lambda i, j: (0, j)),
            pl.BlockSpec((nv, pt), lambda i, j: (0, j)),
            pl.BlockSpec((1, pt), lambda i, j: (0, j)),
            pl.BlockSpec((1, pt), lambda i, j: (0, j)),
            pl.BlockSpec((bt, pt), lambda i, j: (i, j)),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bt, pt), lambda i, j: (i, j)),
            pl.BlockSpec((bt, pt), lambda i, j: (i, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p), jnp.float32),
            jax.ShapeDtypeStruct((b, p), jnp.float32),
        ),
        interpret=True,
    )(
        mags,
        operands.interp_w,
        operands.seg_mask,
        operands.select.reshape(1, -1),
        operands.slope_over_lower.reshape(1, -1),
        state,
        scalars,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(want_state), rtol=1e-4, atol=1e-5)

"""Fused display-map: dense formulation vs the production gather pipeline,
and the pallas kernel vs the dense reference (interpret mode on CPU).

The kernel was retired from the package to tools/pallas_display_map.py in
round 3 (it loses to XLA's fused tail — see its docstring); these tests
keep the retired yardstick honest against the production pipeline."""

import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from signalizer_tpu.core.config import (
    BinInterpolation,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.core.constant import make_spectrum_constant
from pallas_display_map import (
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


def _spec(constant, b=8, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.standard_normal((b, 2, constant.window_size)).astype(np.float32) * 0.3
    rows = _pack_channels(constant, jnp.asarray(frames))
    spec = _half_spectrum(constant, rows)[:, 0, :]
    return jnp.real(spec), jnp.imag(spec), frames


@pytest.mark.parametrize("interp", [BinInterpolation.NONE, BinInterpolation.LINEAR, BinInterpolation.LANCZOS])
def test_dense_formulation_matches_production_pipeline(interp):
    """The matmul+masked-max formulation must reproduce the gather/segment
    pipeline's post-processed output."""
    constant = _constant(interp=interp)
    operands = make_display_map_operands(constant)
    re, im, frames = _spec(constant)
    state = jnp.zeros((8, constant.axis_points), jnp.float32)
    out, new_state = reference_display_map(
        re, im, state, operands,
        constant.decay_poles[0], constant.low_dbs, constant.high_dbs,
        constant.clip_db, constant.inv_size,
    )
    # production path
    ref_state = init_line_graph_state(constant, (8,))
    ref = analyze_frames(constant, ref_state, jnp.asarray(frames)[:, None])
    want = np.asarray(ref.results)[:, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)
    # linear decay state carries the bf16 operand precision (~0.4% rel) —
    # self-consistent within the fused path, ~2.5e-4 of the dB display
    np.testing.assert_allclose(
        np.asarray(new_state), np.asarray(ref.state.magnitude)[:, 0, 0], rtol=1.5e-2, atol=1e-5
    )


def test_pallas_kernel_matches_dense_reference_interpret():
    """Run the actual pallas kernel (interpreter mode) through the real
    fused_display_map wrapper and compare with the dense reference."""
    from pallas_display_map import fused_display_map

    constant = _constant(axis_points=256, window=512)
    operands = make_display_map_operands(constant)
    re, im, _ = _spec(constant, b=8, seed=3)
    state = jnp.asarray(np.random.default_rng(4).random((8, 256)).astype(np.float32))
    args = (
        constant.decay_poles[0],
        constant.low_dbs,
        constant.high_dbs,
        constant.clip_db,
        constant.inv_size,
    )
    want, want_state = reference_display_map(re, im, state, operands, *args)
    out, new_state = fused_display_map(
        re, im, state, operands, *args, batch_tile=8, pixel_tile=128, interpret=True
    )
    # kernel casts the scanned values to bf16 for the selector matmuls;
    # the dense reference keeps them f32 — ~0.4% relative on the state
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(new_state), np.asarray(want_state), rtol=6e-3, atol=1e-4)


def test_single_bin_pixels_read_raw_magnitude():
    """Single-bin pixels must read the RAW magnitude at their bin, not the
    running segment max (the reset-scan must not leak across them)."""
    constant = _constant(axis_points=256, window=2048)
    from signalizer_tpu.core.constant import host_view
    single = np.asarray(host_view(constant, "single_mask"))
    if not single.any():
        pytest.skip("no single-bin pixels in this configuration")
    operands = make_display_map_operands(constant)
    re, im, frames = _spec(constant, b=4, seed=9)
    state = jnp.zeros((4, constant.axis_points), jnp.float32)
    out, _ = reference_display_map(
        re, im, state, operands,
        constant.decay_poles[0], constant.low_dbs, constant.high_dbs,
        constant.clip_db, constant.inv_size,
    )
    ref_state = init_line_graph_state(constant, (4,))
    ref = analyze_frames(constant, ref_state, jnp.asarray(frames)[:, None])
    want = np.asarray(ref.results)[:, 0, 0, 0]
    np.testing.assert_allclose(
        np.asarray(out)[:, single], want[:, single], rtol=1e-3, atol=1e-3
    )

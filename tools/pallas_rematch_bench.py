"""Measure the pallas fused display-map against the XLA production tail.

Reproduces the module-docstring rematch table of
``tools/pallas_display_map.py`` (B=1024 batch, P=1024 pixels, 8193
bins, 16-deep chained dispatch, warm cache) so the recorded numbers stay
honest after kernel changes. The kernel was retired from the package in
round 3 (it loses to XLA's fused tail); this yardstick keeps the record
reproducible. Run on the real TPU:

    python tools/pallas_rematch_bench.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import make_spectrum_constant
    from pallas_display_map import (
        fused_display_map,
        make_display_map_operands,
        pallas_supported,
        reference_display_map,
    )
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state

    dev = jax.devices()[0]
    print(f"device: {dev}")
    b, window = 1024, 16384
    constant = make_spectrum_constant(
        axis_points=1024,
        window_size=window,
        sample_rate=48_000.0,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
        decay_seconds=(0.1,),
        num_line_graphs=1,
    )
    operands = make_display_map_operands(constant)
    nv = int(np.asarray(operands.interp_w.shape)[0])
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((b, nv)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((b, nv)).astype(np.float32))
    state = jnp.zeros((b, constant.axis_points), jnp.float32)
    args = (
        constant.decay_poles[0],
        constant.low_dbs,
        constant.high_dbs,
        constant.clip_db,
        constant.inv_size,
    )

    def timeit(fn, reps=5, chain=16):
        # every fn returns a SCALAR checksum: block_until_ready on remote
        # ARRAYS can return lazily on this transport (bisected round 3 —
        # see bench.py), which would make these numbers dispatch-rate
        # fiction
        out = fn()
        assert out.ndim == 0, "rematch fns must return scalar checksums"
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(chain):
                out = fn()
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / chain)
        return sorted(ts)[len(ts) // 2]

    # XLA dense formulation (the kernel's own reference)
    dense = jax.jit(
        lambda: jnp.sum(reference_display_map(re, im, state, operands, *args)[0])
    )
    t_dense = timeit(dense)
    print(f"XLA dense formulation      {t_dense * 1e3:8.2f} ms", flush=True)

    # XLA production tail on equivalent work (full pipeline minus FFT is
    # not separable; report the whole production step for context)
    frames = jnp.asarray(
        rng.standard_normal((8, b // 8, 2, window)).astype(np.float32)
    )
    pstate = init_line_graph_state(constant, (8,))
    prod = jax.jit(lambda: jnp.sum(analyze_frames(constant, pstate, frames).results))
    t_prod = timeit(prod, chain=4)
    print(f"XLA production (incl FFT)  {t_prod * 1e3:8.2f} ms / {b} frames", flush=True)

    if pallas_supported():
        pl = jax.jit(lambda: jnp.sum(fused_display_map(re, im, state, operands, *args)[0]))
        t_pl = timeit(pl)
        print(f"pallas fused kernel        {t_pl * 1e3:8.2f} ms", flush=True)
    else:
        print("pallas kernel: no TPU backend (skipped)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

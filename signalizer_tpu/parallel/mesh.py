"""Multi-chip scaling: mesh construction and sharded analysis steps.

The framework's parallelism story (SURVEY.md §2.10/§5.8): the reference's
concurrency is (a) a thread pool over channel pairs and (b) an in-process
multi-instance mix — both map to **data parallelism over the stream/pair
batch axis** here. There is no intrinsic cross-frame dependency except the
peak-decay state, which is per-stream (scan over the time axis, parallel
over streams/pixels), so the scaling layout is:

* mesh axis ``data``: channel pairs / independent streams,
* every Constant leaf replicated,
* per-pair filter states sharded with their frames (state stays resident
  on its chip across steps — no per-step collectives at all),
* diagnostics reductions (global peak, levels) ride ICI via ``psum``/
  ``pmax`` inside ``shard_map``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from signalizer_tpu.core.constant import SpectrumConstant
from signalizer_tpu.kernels.spectrum import (
    LineGraphState,
    analyze_frames,
    init_line_graph_state,
)


def make_analysis_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the batch axis.

    Fails fast when fewer than ``n_devices`` devices exist — silently
    truncating would build a smaller mesh and defer the failure to a
    shape assert deep inside the first sharded step.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_analysis_mesh: requested {n_devices} devices but the "
                f"{devices[0].platform} backend has only {len(devices)}. "
                "For CPU testing set jax.config.update('jax_num_cpu_devices', n) "
                "before any jax op (see tests/conftest.py)."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree with leading batch axes onto the mesh, sharded on
    axis 0, so XLA never inserts resharding collectives on the hot path."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def sharded_spectrum_step(
    constant: SpectrumConstant, mesh: Mesh, axis: str = "data"
):
    """Build a jitted multi-chip spectrum step.

    Returns ``step(state, frames) -> (results, new_state, global_peak)``
    where frames [pairs, T, C, W] and state are sharded over ``axis`` on
    their leading dimension and pairs %% n_devices == 0.
    """
    try:
        from jax import shard_map  # jax >= 0.5
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    spec_b = P(axis)

    def shard_fn(state: LineGraphState, frames: jax.Array):
        result = analyze_frames(constant, state, frames)
        local_peak = jnp.max(result.results)
        peak = jax.lax.pmax(local_peak, axis)  # rides ICI
        return result.results, result.state, peak

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            LineGraphState(magnitude=spec_b, phase=spec_b),
            spec_b,
        ),
        out_specs=(spec_b, LineGraphState(magnitude=spec_b, phase=spec_b), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def global_peak_level(results: jax.Array) -> jax.Array:
    """Cross-shard diagnostic reduction (works on sharded arrays under jit:
    XLA inserts the all-reduce)."""
    return jnp.max(results)


def init_sharded_state(
    constant: SpectrumConstant, pairs: int, mesh: Mesh, axis: str = "data"
) -> LineGraphState:
    state = init_line_graph_state(constant, (pairs,))
    return shard_batch(state, mesh, axis)

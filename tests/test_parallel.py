"""Multi-chip sharding for every view (8 virtual CPU devices via conftest).

Each test asserts (a) oracle equality with the single-device path and
(b) output sharding — state stays resident on its chip across steps, so
the hot loop runs with zero resharding collectives (the only cross-chip
traffic is the explicit diagnostic reduction). Matches the reference's
pairs-parallel design (ref: SpectrumDSP.cpp:83 parallel_for; CHANGELOG
0.4.0 'parallelized all views over channel pairs')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from signalizer_tpu.core.config import (
    BinInterpolation,
    OscChannels,
    SpectrumChannels,
    ViewScaling,
)
from signalizer_tpu.core.constant import make_spectrum_constant
from signalizer_tpu.parallel.mesh import (
    make_analysis_mesh,
    shard_batch,
    sharded_fused_step,
    sharded_oscilloscope_step,
    sharded_spectrogram_step,
    sharded_vectorscope_step,
)

PAIRS = 16  # 2 per chip


def _mesh():
    return make_analysis_mesh(8)


def _frames(pairs, t, c, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((pairs, t, c, w)).astype(np.float32)


def test_make_analysis_mesh_fails_fast_on_short_device_list():
    with pytest.raises(RuntimeError, match="requested 9"):
        make_analysis_mesh(9)


def test_sharded_oscilloscope_matches_single_device():
    from signalizer_tpu.views.oscilloscope import (
        AutoGain,
        OscilloscopeProcessor,
        TriggerMode,
        make_oscilloscope_constant,
    )

    constant = make_oscilloscope_constant(
        channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.ZERO_CROSSING,
        pixels=128,
        lookahead=512,
        trigger_threshold=0.1,
        autogain=AutoGain.PEAK_DECAY,
        colour_enabled=True,
    )
    h = 2048
    hist_host = np.sin(
        2 * np.pi * 440.0 * np.arange(h) / 48_000.0
        + np.arange(PAIRS)[:, None, None] * 0.3
    ).astype(np.float32) * np.ones((PAIRS, 2, h), np.float32)

    # single-device reference path
    ref = OscilloscopeProcessor(constant, pairs=PAIRS, window_samples=500.0)
    ref_frame1 = ref.process(hist_host)
    ref_frame2 = ref.process(hist_host)

    mesh = _mesh()
    step = sharded_oscilloscope_step(constant, mesh)
    sharded = OscilloscopeProcessor(constant, pairs=PAIRS, window_samples=500.0)
    state = shard_batch(sharded._state, mesh)
    hist = shard_batch(jnp.asarray(hist_host), mesh)
    w = jnp.asarray(500.0, jnp.float32)
    z = jnp.asarray(0.0, jnp.float32)
    n = jnp.asarray(float(h), jnp.float32)

    frame1, state, level = step(state, hist, w, z, n)
    frame2, state2, _ = step(state, hist, w, z, n)

    assert len(frame1.waveform.sharding.device_set) == 8
    # state residency: the carried state keeps the same sharding layout
    assert state2.peak_env.sharding == state.peak_env.sharding
    np.testing.assert_allclose(
        np.asarray(frame1.waveform), np.asarray(ref_frame1.waveform), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(frame2.waveform), np.asarray(ref_frame2.waveform), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(frame2.colours), np.asarray(ref_frame2.colours), atol=1e-5
    )
    assert float(level) == pytest.approx(float(np.abs(hist_host).max()), rel=1e-6)


def test_sharded_vectorscope_matches_single_device():
    from signalizer_tpu.kernels.vectorscope import init_meter_state
    from signalizer_tpu.views.vectorscope import (
        AutoGain,
        OperationalMode,
        VectorscopeProcessor,
    )

    frames_host = _frames(PAIRS, 2, 1, 256, seed=1)[:, 0]  # [pairs, 2, W] stereo
    frames_host = _frames(PAIRS, 1, 2, 256, seed=1)[:, 0]

    ref = VectorscopeProcessor(pairs=PAIRS, autogain=AutoGain.PEAK_DECAY,
                               mode=OperationalMode.LISSAJOUS)
    ref_f1 = ref.process(frames_host)
    ref_f2 = ref.process(frames_host)

    mesh = _mesh()
    step = sharded_vectorscope_step(
        mesh,
        mode=OperationalMode.LISSAJOUS,
        autogain=AutoGain.PEAK_DECAY,
        rotation=0.0,
        scale_to_fill=False,
    )
    state = shard_batch(init_meter_state((PAIRS,)), mesh)
    peak_env = shard_batch(jnp.zeros((PAIRS, 2), jnp.float32), mesh)
    frames = shard_batch(jnp.asarray(frames_host), mesh)
    ep = jnp.asarray(ref.envelope_pole, jnp.float32)
    sp = jnp.asarray(ref.stereo_pole, jnp.float32)
    ug = jnp.asarray(1.0, jnp.float32)
    pc = ep ** (256 / 60.0)

    ns = jnp.float32(frames_host.shape[-1])  # whole window is new audio
    f1, state, peak_env, level = step(state, peak_env, frames, ep, sp, ug, pc, ns)
    f2, state2, peak_env2, _ = step(state, peak_env, frames, ep, sp, ug, pc, ns)

    assert len(f1.vertices.sharding.device_set) == 8
    assert state2.envelope.sharding == state.envelope.sharding
    np.testing.assert_allclose(np.asarray(f1.vertices), np.asarray(ref_f1.vertices), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2.balance), np.asarray(ref_f2.balance), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f2.correlation_bars), np.asarray(ref_f2.correlation_bars), atol=1e-5
    )
    assert float(level) == pytest.approx(float(np.abs(frames_host).max()), rel=1e-6)


def test_sharded_spectrogram_matches_single_device():
    from signalizer_tpu.kernels.colormap import normalize_ratios, spectrogram_columns
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state
    from signalizer_tpu.views.spectrogram import DEFAULT_GRADIENT, DEFAULT_RATIOS

    constant = make_spectrum_constant(
        axis_points=64,
        window_size=256,
        configuration=SpectrumChannels.LEFT,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    t = 3
    frames_host = _frames(PAIRS, t, 2, 256, seed=2) * 0.5
    colours_host = np.broadcast_to(DEFAULT_GRADIENT, (PAIRS, 6, 3)).copy()
    ratios = jnp.asarray(normalize_ratios(DEFAULT_RATIOS), jnp.float32)

    # single-device reference
    s0 = init_line_graph_state(constant, (PAIRS,))
    r = analyze_frames(constant, s0, jnp.asarray(frames_host))
    ref_cols = np.asarray(
        spectrogram_columns(r.results[:, :, 0, 0, :], jnp.asarray(colours_host), ratios)
    )

    mesh = _mesh()
    step = sharded_spectrogram_step(constant, mesh)
    state = shard_batch(init_line_graph_state(constant, (PAIRS,)), mesh)
    frames = shard_batch(jnp.asarray(frames_host), mesh)
    colours = shard_batch(jnp.asarray(colours_host), mesh)

    cols, state2 = step(state, frames, colours, ratios, jnp.ones((t,), bool))
    assert state2.magnitude.sharding == state.magnitude.sharding
    got = np.asarray(cols)
    assert got.shape == ref_cols.shape == (t, 64, 4)
    # blend runs in the log domain across chips: equal after quantization
    # up to one 8-bit step
    assert np.max(np.abs(got.astype(int) - ref_cols.astype(int))) <= 1


def test_sharded_fused_pipeline_matches_single_device():
    from signalizer_tpu.kernels.oscilloscope import (
        minmax_decimate,
        sinc_resample_matrix,
        sinc_resample_static,
    )
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state
    from signalizer_tpu.kernels.vectorscope import (
        correlation,
        init_meter_state,
        update_meters,
    )

    constant = make_spectrum_constant(
        axis_points=64,
        window_size=256,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    t = 2
    pixels = 32
    frames_host = _frames(PAIRS, t, 2, 256, seed=3)
    m = sinc_resample_matrix(256, 0.0, 256.0 / pixels, pixels)

    # single-device reference
    s0 = init_line_graph_state(constant, (PAIRS,))
    v0 = init_meter_state((PAIRS,))
    fj = jnp.asarray(frames_host)
    r = analyze_frames(constant, s0, fj)
    ref_wave = np.asarray(sinc_resample_static(fj[..., 0, :], m))
    ref_mins, ref_maxs = minmax_decimate(fj[..., 0, :], pixels)
    ref_corr = np.asarray(correlation(fj))
    ref_v = update_meters(v0, fj[:, -1], envelope_pole=0.999, stereo_pole=0.99)

    mesh = _mesh()
    step = sharded_fused_step(constant, m, mesh, pixels=pixels)
    state = shard_batch(init_line_graph_state(constant, (PAIRS,)), mesh)
    vstate = shard_batch(init_meter_state((PAIRS,)), mesh)
    frames = shard_batch(fj, mesh)

    results, wave, mins, maxs, corr, state2, vstate2, peak = step(
        state, vstate, frames, jnp.ones((frames.shape[1],), bool)
    )
    assert len(results.sharding.device_set) == 8
    assert state2.magnitude.sharding == state.magnitude.sharding
    assert vstate2.envelope.sharding == vstate.envelope.sharding
    np.testing.assert_allclose(np.asarray(results), np.asarray(r.results), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wave), ref_wave, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mins), np.asarray(ref_mins), atol=1e-6)
    np.testing.assert_allclose(np.asarray(maxs), np.asarray(ref_maxs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(corr), ref_corr, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vstate2.envelope), np.asarray(ref_v.envelope), atol=1e-5
    )
    assert float(peak) == pytest.approx(float(np.asarray(r.results).max()), rel=1e-6)


def test_sharded_pipeline_end_to_end():
    """ShardedAnalysisPipeline: host ingest -> shard -> fused step.
    Per-pair sine frequencies land on their own spectral peaks, output
    stays sharded over 8 devices, state carries across ticks."""
    from signalizer_tpu.parallel.pipeline import ShardedAnalysisPipeline

    fs = 48_000.0
    constant = make_spectrum_constant(
        axis_points=256,
        window_size=1024,
        sample_rate=fs,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
    )
    pairs = 16
    pipe = ShardedAnalysisPipeline(
        constant, pairs=pairs, mesh=_mesh(), pixels=64, frames_per_tick=2
    )
    assert pipe.tick() is None  # nothing fed yet

    # pair p gets a sine at (p+1) kHz on both channels
    n = 1024 * 2  # two frames worth
    t = np.arange(n) / fs
    block = np.stack(
        [np.sin(2 * np.pi * 1000.0 * (p // 2 + 1) * t) for p in range(pairs * 2)]
    ).astype(np.float32)
    pipe.push(block)
    assert pipe.ready()
    out = pipe.tick()
    assert out is not None
    assert len(out.results.sharding.device_set) == 8
    assert out.waveform.shape == (pairs, 2, 64)
    # spectral peaks per pair (linear axis 0..24 kHz over 256 px)
    res = np.asarray(out.results)  # [pairs, T, K, rows, P]
    for p in range(pairs):
        peak_px = int(np.argmax(res[p, -1, 0, 0]))
        expect_px = (p + 1) * 1000.0 / (fs / 2) * 255
        assert abs(peak_px - expect_px) <= 2, (p, peak_px, expect_px)
    assert float(out.global_peak) > 0
    # stereo correlation of identical channels ~ 1 (skip the first-sample
    # IIR warmup of each pair)
    corr = np.asarray(out.correlation)
    np.testing.assert_allclose(corr[..., 8:], 1.0, atol=1e-3)
    # state carried: a second tick decays from the first (peak hold)
    pipe.push(np.zeros_like(block))
    out2 = pipe.tick()
    assert out2 is not None and pipe.ticks == 2
    assert np.asarray(out2.results)[0, -1, 0, 0].max() <= res[0, -1, 0, 0].max() + 1e-5


def _collective_counts(compiled_text: str) -> dict:
    """Count collective ops in compiled HLO (resharding shows up as
    all-gather / collective-permute / all-to-all beyond the intended
    reductions)."""
    import re

    return {
        op: len(re.findall(rf"\b{op}\b", compiled_text))
        for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all")
    }


@pytest.mark.parametrize("view", ["spectrum", "spectrogram", "oscilloscope", "vectorscope"])
def test_sharded_pipeline_every_view(view):
    """One ShardedAnalysisPipeline parameterization per view: ingest
    drives the sharded step, outputs/state stay sharded (or replicated
    where specified), and the compiled step contains NO resharding
    collectives — only the intended reductions (pmax/psum all-reduce)."""
    from signalizer_tpu.parallel.pipeline import (
        OscilloscopeOutput,
        ShardedAnalysisPipeline,
        SpectrogramOutput,
        SpectrumOutput,
        VectorscopeOutput,
    )

    fs = 48_000.0
    pairs = 16
    constant = make_spectrum_constant(
        axis_points=128,
        window_size=512,
        sample_rate=fs,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LINEAR,
    )
    kwargs = dict(pairs=pairs, mesh=_mesh(), view=view, frames_per_tick=2)
    if view == "oscilloscope":
        from signalizer_tpu.views.oscilloscope import (
            TriggerMode,
            make_oscilloscope_constant,
        )

        kwargs.update(
            osc_constant=make_oscilloscope_constant(
                channel_mode=OscChannels.SEPARATE,
                trigger_mode=TriggerMode.ZERO_CROSSING,
                pixels=64,
                lookahead=256,
                trigger_threshold=0.1,
            ),
            window_samples=128.0,
            history_samples=1024,
        )
    if view == "vectorscope":
        kwargs.update(history_samples=1024)
    pipe = ShardedAnalysisPipeline(
        constant if view in ("spectrum", "spectrogram") else None, **kwargs
    )
    assert pipe.tick() is None

    rng = np.random.default_rng(17)
    block = (rng.standard_normal((pairs * 2, 1024)) * 0.5).astype(np.float32)
    pipe.push(block)
    out = pipe.tick()
    assert out is not None and pipe.ticks == 1

    if view == "spectrum":
        assert isinstance(out, SpectrumOutput)
        assert len(out.results.sharding.device_set) == 8
        assert len(pipe._state.magnitude.sharding.device_set) == 8
    elif view == "spectrogram":
        assert isinstance(out, SpectrogramOutput)
        assert out.columns.sharding.is_fully_replicated  # blended via psum
        assert len(pipe._state.magnitude.sharding.device_set) == 8
    elif view == "oscilloscope":
        assert isinstance(out, OscilloscopeOutput)
        assert len(out.frame.waveform.sharding.device_set) == 8
        assert len(pipe._state.peak_env.sharding.device_set) == 8
    else:
        assert isinstance(out, VectorscopeOutput)
        assert len(out.frame.vertices.sharding.device_set) == 8
        assert len(pipe._state.envelope.sharding.device_set) == 8

    # a second tick keeps state chip-resident (no device movement)
    pipe.push(block)
    out2 = pipe.tick()
    assert out2 is not None and pipe.ticks == 2

    # compiled-HLO residency: only the intended reduction collectives
    # appear — any all-gather / permute / all-to-all means XLA had to
    # reshard the hot path. Lower the step with the same sharded arg
    # shapes the tick used.
    mesh = pipe.mesh
    if view in ("spectrum", "spectrogram"):
        frames_dev = shard_batch(
            jnp.zeros((pairs, 2, 2, constant.window_size), jnp.float32), mesh
        )
        if view == "spectrum":
            lowered = pipe._step.lower(
                pipe._state, frames_dev, jnp.ones((2,), bool)
            )
        else:
            lowered = pipe._step.lower(
                pipe._state, frames_dev, pipe._colours, pipe._ratios,
                jnp.ones((2,), bool),
            )
    elif view == "oscilloscope":
        hist_dev = shard_batch(jnp.zeros((pairs, 2, 1024), jnp.float32), mesh)
        lowered = pipe._step.lower(
            pipe._state, hist_dev, jnp.float32(128.0), jnp.float32(0.0), jnp.float32(64.0)
        )
    else:
        hist_dev = shard_batch(jnp.zeros((pairs, 2, 1024), jnp.float32), mesh)
        ep, sp, ug, pc = pipe._vs_scalars
        lowered = pipe._step.lower(
            pipe._state, pipe._peak_env, hist_dev, ep, sp, ug, pc,
            jnp.float32(64.0),
        )
    counts = _collective_counts(lowered.compile().as_text())
    assert counts["all-gather"] == 0, counts
    assert counts["collective-permute"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    # the diagnostic/blend reduction is present (pmax / psum all-reduce)
    assert counts["all-reduce"] >= 1, counts


def test_sharded_oscilloscope_spectral_custom_trigger():
    """The heaviest oscilloscope path (spectral FFT search + Goertzel phase
    lock + custom trigger) shards identically to the single-device run."""
    from signalizer_tpu.views.oscilloscope import (
        OscilloscopeProcessor,
        TriggerMode,
        make_oscilloscope_constant,
    )

    constant = make_oscilloscope_constant(
        channel_mode=OscChannels.LEFT,
        trigger_mode=TriggerMode.SPECTRAL,
        pixels=128,
        lookahead=1024,
        custom_trigger=True,
        custom_trigger_frequency=441.3,
    )
    h = 4096
    phases = np.arange(PAIRS) * 0.37
    hist_host = np.sin(
        2 * np.pi * 441.3 * np.arange(h) / 48_000.0 + phases[:, None, None]
    ).astype(np.float32) * np.ones((PAIRS, 2, h), np.float32)

    ref = OscilloscopeProcessor(constant, pairs=PAIRS, window_samples=500.0)
    want = ref.process(hist_host)

    mesh = _mesh()
    step = sharded_oscilloscope_step(constant, mesh)
    sharded = OscilloscopeProcessor(constant, pairs=PAIRS, window_samples=500.0)
    state = shard_batch(sharded._state, mesh)
    hist = shard_batch(jnp.asarray(hist_host), mesh)
    frame, _, _ = step(
        state, hist,
        jnp.asarray(500.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
        jnp.asarray(float(h), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(frame.waveform), np.asarray(want.waveform), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(frame.fundamental), 441.3, rtol=1e-6)
    # phase lock: all pairs display (nearly) the same window despite
    # different input phases
    w = np.asarray(frame.waveform)[:, 0, 16:-16]
    for p in range(1, PAIRS):
        np.testing.assert_allclose(w[p], w[0], atol=0.06)


def test_sharded_mix_collective():
    """The multi-instance mix gather as a psum over the mesh
    (ref: MixGraphListener.cpp:247-334 / SURVEY.md §5.8): 16 sources
    sharded over 8 chips mix into one replicated presentation block."""
    from signalizer_tpu.parallel.mesh import sharded_mix_step

    mesh = _mesh()
    sources, in_ch, out_ch, t = 16, 2, 16, 256
    rng = np.random.default_rng(3)
    src = rng.standard_normal((sources, in_ch, t)).astype(np.float32)
    # identity-ish routing: source s sends channel c to output (2s+c) % out_ch
    routing = np.zeros((sources, in_ch, out_ch), np.float32)
    for s in range(sources):
        for c in range(in_ch):
            routing[s, c, (2 * s + c) % out_ch] = 0.5 + 0.5 * (s % 3 == 0)
    step = sharded_mix_step(mesh)
    mixed, peak = step(shard_batch(src, mesh), shard_batch(routing, mesh))

    oracle = np.einsum("sct,sco->ot", src.astype(np.float64), routing.astype(np.float64))
    np.testing.assert_allclose(np.asarray(mixed), oracle, atol=1e-4)
    assert float(peak) == pytest.approx(np.abs(oracle).max(), rel=1e-5)
    # the mix is fully replicated: every chip holds the whole block
    assert mixed.sharding.is_fully_replicated


def test_multipair_hue_rotation_matches_sharded():
    """Pairs beyond the first draw with hue-rotated key colours
    (ref: CHANGELOG 0.4.0), identically on the single-device and sharded
    paths."""
    from signalizer_tpu.views.oscilloscope import (
        OscilloscopeProcessor,
        TriggerMode,
        make_oscilloscope_constant,
    )

    mesh = _mesh()
    pairs = PAIRS
    oc = make_oscilloscope_constant(
        channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.NONE,
        pixels=64,
        lookahead=128,
        key_colour=(0.2, 0.9, 0.3),
        secondary_colour=(0.9, 0.2, 0.3),
        colour_enabled=False,
    )
    proc = OscilloscopeProcessor(oc, pairs=pairs, window_samples=128.0)
    hist = np.random.default_rng(0).standard_normal((pairs, 2, 256)).astype(np.float32)
    frame = proc.process(hist)
    cols = np.asarray(frame.colours)  # [pairs, rows, pixels, 3]
    # pair 0 keeps the user colours; later pairs differ but keep luminance class
    np.testing.assert_allclose(cols[0, 0, 0], (0.2, 0.9, 0.3), atol=1e-6)
    np.testing.assert_allclose(cols[0, 1, 0], (0.9, 0.2, 0.3), atol=1e-6)
    distinct = {tuple(np.round(cols[p, 0, 0], 4)) for p in range(pairs)}
    assert len(distinct) == pairs

    # sharded path produces the same colours
    step = sharded_oscilloscope_step(oc, mesh, pairs=pairs)
    proc2 = OscilloscopeProcessor(oc, pairs=pairs, window_samples=128.0)
    sframe, _, _ = step(
        shard_batch(proc2.state, mesh), shard_batch(hist, mesh),
        jnp.float32(128.0), jnp.float32(0.0), jnp.float32(256.0),
    )
    np.testing.assert_allclose(np.asarray(sframe.colours), cols, atol=1e-6)


def test_sharded_resonator_step_matches_single_device():
    """RSNT over the mesh: pairs-sharded bank state, chip-resident tick,
    float parity with the single-device processor (atol 2e-5 — sharded
    reduction order differs), and HLO residency (only the intended pmax
    all-reduce)."""
    from signalizer_tpu.core.config import TransformAlgorithm
    from signalizer_tpu.parallel.mesh import sharded_resonator_step
    from signalizer_tpu.views.spectrum import ResonatorSpectrumProcessor

    constant = make_spectrum_constant(
        axis_points=64,
        window_size=1024,
        configuration=SpectrumChannels.SEPARATE,
        algo=TransformAlgorithm.RESONATOR,
    )
    ref = ResonatorSpectrumProcessor(constant, pairs=PAIRS)
    rng = np.random.default_rng(5)
    t, w = 4, 512
    blocks_host = rng.standard_normal((PAIRS, 2, t, w)).astype(np.float32)
    valid = np.ones(t, bool)
    want = np.asarray(ref.process_chunks(blocks_host, valid))

    mesh = _mesh()
    sharded = ResonatorSpectrumProcessor(constant, pairs=PAIRS)
    plan = sharded.block_plan(w)
    step = sharded_resonator_step(constant, sharded.resonator, plan, mesh)
    res_state = shard_batch(sharded.res_state, mesh)
    graph_state = shard_batch(sharded.graph_state, mesh)
    blocks = shard_batch(jnp.asarray(blocks_host), mesh)
    results, res_state, graph_state, peak = step(
        res_state, graph_state, blocks, jnp.asarray(valid)
    )
    np.testing.assert_allclose(np.asarray(results), want, atol=2e-5)
    np.testing.assert_allclose(float(peak), float(np.max(want)), rtol=1e-6)

    # second tick: state threads through the sharded carry
    blocks2_host = rng.standard_normal((PAIRS, 2, t, w)).astype(np.float32)
    want2 = np.asarray(ref.process_chunks(blocks2_host, valid))
    results2, _, _, _ = step(
        res_state, graph_state, shard_batch(jnp.asarray(blocks2_host), mesh),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(results2), want2, atol=2e-5)

    # HLO residency: no resharding collectives; the pmax all-reduce only
    lowered = step.lower(
        shard_batch(sharded.res_state, mesh),
        shard_batch(sharded.graph_state, mesh),
        shard_batch(jnp.asarray(blocks_host), mesh),
        jnp.asarray(valid),
    )
    counts = _collective_counts(lowered.compile().as_text())
    assert counts["all-gather"] == 0, counts
    assert counts["collective-permute"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["all-reduce"] >= 1, counts


def test_framed_padding_masks_filter_state():
    """Review regression: zero frames padded onto a short batch under
    backpressure must not advance the peak-decay state — the sharded step's
    valid mask must make (real frames + padding) leave the same state as
    the real frames alone."""
    from signalizer_tpu.kernels.spectrum import init_line_graph_state
    from signalizer_tpu.parallel.mesh import sharded_spectrum_step

    mesh = _mesh()
    constant = make_spectrum_constant(
        axis_points=64, window_size=128,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
    )
    step = sharded_spectrum_step(constant, mesh)
    rng = np.random.default_rng(3)
    t = 4
    real = rng.standard_normal((PAIRS, 2, 2, 128)).astype(np.float32)
    padded = np.zeros((PAIRS, t, 2, 128), np.float32)
    padded[:, :2] = real
    valid = jnp.asarray(np.arange(t) < 2)

    s0 = shard_batch(init_line_graph_state(constant, (PAIRS,)), mesh)
    _, s_pad, _ = step(s0, shard_batch(jnp.asarray(padded), mesh), valid)

    s0b = shard_batch(init_line_graph_state(constant, (PAIRS,)), mesh)
    _, s_real, _ = step(
        s0b,
        shard_batch(jnp.asarray(np.pad(real, ((0, 0), (0, 2), (0, 0), (0, 0)))), mesh),
        valid,
    )
    np.testing.assert_array_equal(np.asarray(s_pad.magnitude), np.asarray(s_real.magnitude))

    # and WITHOUT the mask the padding visibly decays the state (the bug)
    s0c = shard_batch(init_line_graph_state(constant, (PAIRS,)), mesh)
    _, s_nomask, _ = step(
        s0c, shard_batch(jnp.asarray(padded), mesh), jnp.ones((t,), bool)
    )
    assert not np.array_equal(np.asarray(s_nomask.magnitude), np.asarray(s_pad.magnitude))


def test_vectorscope_new_samples_meter_mask():
    """Review regression: a rolling-history caller re-reads overlapping
    windows; the meters must integrate each sample exactly once. The masked
    block update over [old | new] with new_samples=n must equal the
    unmasked update over the new suffix alone."""
    from signalizer_tpu.kernels.vectorscope import init_meter_state, update_meters

    rng = np.random.default_rng(4)
    old = rng.standard_normal((3, 2, 96)).astype(np.float32)
    new = rng.standard_normal((3, 2, 32)).astype(np.float32)
    window = jnp.asarray(np.concatenate([old, new], axis=-1))
    st = init_meter_state((3,))
    # warm the state so decays matter
    st = update_meters(st, jnp.asarray(old), envelope_pole=0.99, stereo_pole=0.97)

    masked = update_meters(
        st, window, envelope_pole=0.99, stereo_pole=0.97,
        new_samples=jnp.float32(32.0),
    )
    suffix = update_meters(
        st, jnp.asarray(new), envelope_pole=0.99, stereo_pole=0.97
    )
    for a, b in zip(masked, suffix):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # new_samples=0 is a hold (pure redraw tick)
    held = update_meters(
        st, window, envelope_pole=0.99, stereo_pole=0.97,
        new_samples=jnp.float32(0.0),
    )
    for a, b in zip(held, st):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pipeline_oscilloscope_transport_position():
    """Review regression: TriggerMode.WINDOW scrolls the display against
    the playhead; the pipeline must expose transport_position (it was
    hardcoded to 0.0, pinning the window to the history end)."""
    from signalizer_tpu.core.config import OscChannels
    from signalizer_tpu.parallel.pipeline import ShardedAnalysisPipeline
    from signalizer_tpu.views.oscilloscope import TriggerMode, make_oscilloscope_constant

    mesh = _mesh()
    oc = make_oscilloscope_constant(
        channel_mode=OscChannels.SEPARATE,
        trigger_mode=TriggerMode.WINDOW,
        pixels=64,
        lookahead=256,
    )
    rng = np.random.default_rng(5)
    block = rng.standard_normal((PAIRS * 2, 2048)).astype(np.float32)

    waves = {}
    for transport in (0.0, 300.0):
        pipe = ShardedAnalysisPipeline(
            pairs=PAIRS, mesh=mesh, view="oscilloscope",
            osc_constant=oc, window_samples=512.0, history_samples=2048,
        )
        pipe.push(block)
        out = pipe.tick(transport_position=transport)
        waves[transport] = np.asarray(out.frame.waveform)
    assert not np.array_equal(waves[0.0], waves[300.0])


def test_mix_step_enforces_max_channels():
    """Review regression: the documented out_ch <= max_channels contract
    is enforced instead of being a dead parameter."""
    from signalizer_tpu.parallel.mesh import sharded_mix_step

    mesh = _mesh()
    step = sharded_mix_step(mesh, max_channels=4)
    src = jnp.zeros((8, 2, 64), jnp.float32)
    routing = jnp.zeros((8, 2, 8), jnp.float32)  # out_ch 8 > max 4
    with pytest.raises(ValueError, match="max_channels"):
        step(shard_batch(src, mesh), shard_batch(routing, mesh))

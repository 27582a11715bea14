"""HostGraph topology + MixGraph alignment tests (SURVEY.md §5.8)."""

import numpy as np
import pytest

from signalizer_tpu.stream.audio_stream import AudioStream, AudioStreamInfo, Playhead
from signalizer_tpu.stream.host_graph import (
    HostGraph,
    PortPair,
    SerializationControl,
)
from signalizer_tpu.stream.mix_graph import MixGraph
from signalizer_tpu.state.serialize import Archive


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    for node in HostGraph.live_nodes():
        node.close()
    HostGraph._alias_chains.clear()


class _Sink:
    def __init__(self):
        self.blocks = []

    def on_stream_audio(self, ctx, block):
        self.blocks.append(block.copy())

    def on_stream_properties_changed(self, ctx, before):
        pass

    def on_stream_died(self, ctx):
        pass

    def concat(self):
        return np.concatenate(self.blocks, axis=1) if self.blocks else np.zeros((0, 0))


def _make_instance(name, channels=2, history=65536):
    inp, out = AudioStream.create(
        threaded=False, info=AudioStreamInfo(channels=channels, audio_history_capacity=history)
    )
    graph = HostGraph(name, channels=channels)
    graph.stream_output = out
    return inp, out, graph


# ---------------------------------------------------------------------------
# host graph
# ---------------------------------------------------------------------------


def test_connect_disconnect_and_model():
    _, _, a = _make_instance("a")
    _, _, b = _make_instance("b")
    assert a.connect(b.node_id, PortPair(0, 1))
    model = a.get_model()
    assert len(model.edges) == 1
    assert model.edges[0][2] == PortPair(0, 1)
    assert not model.missing
    assert a.disconnect(b.node_id, PortPair(0, 1))
    assert not a.get_model().edges


def test_toggle_set_default_layout():
    _, _, a = _make_instance("a")
    _, _, b = _make_instance("b")
    assert a.toggle_set(b.node_id)  # connect i->i
    assert a.topology[b.node_id] == {PortPair(0, 0), PortPair(1, 1)}
    assert not a.toggle_set(b.node_id)  # disconnects
    assert b.node_id not in a.topology


def test_edges_survive_peer_death_and_rebind():
    """ref: liveReference == nullptr keeps edges; tryRebuildTopology
    rebinds when a matching identity reappears (HostGraph.cpp:334-364,
    :736-749)."""
    _, _, a = _make_instance("a")
    _, _, b = _make_instance("b")
    b_id = b.node_id
    a.connect(b_id, PortPair(0, 0))
    # serialize b, kill it
    ar = Archive()
    b.serialize(ar)
    b.close()
    model = a.get_model()
    assert model.missing == [b_id.hex()]
    assert a.expected_nodes_to_resurrect() == 1
    # resurrect: a new instance loads b's state -> assumes its identity
    _, _, b2 = _make_instance("b-reborn")
    b2.deserialize(ar)
    assert b2.node_id == b_id
    assert a.expected_nodes_to_resurrect() == 0
    assert not a.get_model().missing


def test_alias_chain_resurrection():
    """Two instances loading the same identity: second becomes an alias;
    on canonical death the alias takes over (ref: resurrectNextAlias)."""
    _, _, original = _make_instance("orig")
    ar = Archive()
    original.serialize(ar)
    _, _, clone = _make_instance("clone")
    clone.deserialize(ar)  # identity collision -> alias
    assert clone.node_id != original.node_id
    orig_id = original.node_id
    original.close()
    assert clone.node_id == orig_id  # promoted
    assert HostGraph.find(orig_id) is clone


def test_serialization_control_modes():
    _, _, a = _make_instance("a")
    _, _, b = _make_instance("b")
    a.connect(b.node_id, PortPair(0, 0))
    a.serialization_control = SerializationControl.IGNORE_ALWAYS
    ar = Archive()
    a.serialize(ar)
    assert ar.find_child("edges") is None
    a.serialization_control = SerializationControl.FULL
    ar2 = Archive()
    a.serialize(ar2)
    _, _, c = _make_instance("c")
    c.serialization_control = SerializationControl.IGNORE_SESSION
    before = dict(c.topology)
    ar2_copy = Archive.from_bytes(ar2.to_bytes())
    ar2_copy["control"] = int(SerializationControl.IGNORE_SESSION)
    c.deserialize(ar2_copy)
    assert c.topology == before  # topology not restored


def test_invalid_connects_rejected():
    _, _, a = _make_instance("a", channels=2)
    _, _, b = _make_instance("b")
    assert not a.connect(b.node_id, PortPair(0, 5))  # dest out of range
    assert not a.connect(b.node_id, PortPair(-1, 0))


# ---------------------------------------------------------------------------
# mix graph
# ---------------------------------------------------------------------------


def test_self_default_layout_passthrough():
    """With no explicit topology, the self stream passes through i->i."""
    inp, out, graph = _make_instance("solo")
    mix = MixGraph(graph, out)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    block = np.random.default_rng(0).standard_normal((2, 256)).astype(np.float32)
    ph = Playhead(steady_clock=0, is_playing=True)
    inp.process_incoming_audio(block, ph)
    got = sink.concat()
    np.testing.assert_allclose(got, block, atol=1e-7)
    assert mix.perf.synchronized
    mix.close()


def test_two_instance_mixing_aligned():
    """Peer audio mixes into the destination channels, clock-aligned."""
    inp_a, out_a, ga = _make_instance("a")
    inp_b, out_b, gb = _make_instance("b")
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)

    ga.topology[ga.node_id] = {PortPair(0, 0), PortPair(1, 1)}
    ga.connect(gb.node_id, PortPair(0, 1))  # b's left into our right

    a_block = np.zeros((2, 128), np.float32)
    a_block[0] = 1.0
    b_block = np.zeros((2, 128), np.float32)
    b_block[0] = 0.5

    # interleaved delivery, same clocks
    for i in range(4):
        ph = Playhead(steady_clock=i * 128)
        inp_b.process_incoming_audio(b_block, ph)
        inp_a.process_incoming_audio(a_block, ph)

    got = sink.concat()
    assert got.shape[0] == 2
    # after alignment settles, channel 0 = a left (1.0), channel 1 = a right
    # (0.0) + b left (0.5)
    np.testing.assert_allclose(got[0, -128:], 1.0, atol=1e-6)
    np.testing.assert_allclose(got[1, -128:], 0.5, atol=1e-6)
    assert mix.perf.synchronized
    mix.close()


def test_clock_offset_between_sources():
    """Sources with different steady-clock origins still align by offset."""
    inp_a, out_a, ga = _make_instance("a")
    inp_b, out_b, gb = _make_instance("b")
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0)}
    ga.connect(gb.node_id, PortPair(0, 1))

    rng = np.random.default_rng(1)
    b_sig = rng.standard_normal((2, 512)).astype(np.float32)
    # b's clock starts at 10_000, a's at 0 — content must still line up
    for i in range(4):
        inp_b.process_incoming_audio(
            b_sig[:, i * 128 : (i + 1) * 128], Playhead(steady_clock=10_000 + i * 128)
        )
        inp_a.process_incoming_audio(
            np.zeros((2, 128), np.float32), Playhead(steady_clock=i * 128)
        )
    got = sink.concat()
    # channel 1 should reproduce b's stream (modulo initial alignment)
    tail = got[1, -128:]
    expect = b_sig[0, got.shape[1] - 128 : got.shape[1]]
    np.testing.assert_allclose(tail, expect, atol=1e-6)
    mix.close()


def test_stalled_source_inserts_silence_and_recovers():
    """A source that stops delivering must not stall the mix; it re-anchors
    on return (drift repair, ref: deliver drop/insert logic)."""
    inp_a, out_a, ga = _make_instance("a")
    inp_b, out_b, gb = _make_instance("b")
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0)}
    ga.connect(gb.node_id, PortPair(0, 1))

    ones = np.ones((2, 128), np.float32)
    # prime: a's first block attaches the source listeners (topology
    # commands apply on the self delivery path, like the reference)
    inp_a.process_incoming_audio(ones, Playhead(steady_clock=0))
    # b delivers once, then goes silent while a keeps running
    inp_b.process_incoming_audio(ones * 0.5, Playhead(steady_clock=128))
    for i in range(1, 10):
        inp_a.process_incoming_audio(ones, Playhead(steady_clock=i * 128))
    got = sink.concat()
    # the mix kept flowing (bounded staleness): everything a delivered is
    # emitted except at most the latency window + the pre-sync gating
    assert got.shape[1] >= 10 * 128 - mix.maximum_latency - 2 * 128
    assert mix.perf.discontinuities >= 1
    # b returns with a huge clock jump: must re-anchor, not crash
    inp_b.process_incoming_audio(ones * 0.25, Playhead(steady_clock=999_999))
    inp_a.process_incoming_audio(ones, Playhead(steady_clock=10 * 128))
    mix.close()


def test_mono_source_safe():
    """Bugs.txt #2: connecting a port beyond a mono source's channel count
    must produce silence, not an out-of-bounds read."""
    inp_a, out_a, ga = _make_instance("a")
    inp_m, out_m, gm = _make_instance("mono", channels=1)
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0)}
    ga.connect(gm.node_id, PortPair(1, 1))  # channel 1 of a mono source!

    inp_m.process_incoming_audio(np.ones((1, 128), np.float32), Playhead(steady_clock=0))
    inp_a.process_incoming_audio(np.ones((2, 128), np.float32), Playhead(steady_clock=0))
    got = sink.concat()
    np.testing.assert_allclose(got[1], 0.0)  # silent, no crash
    mix.close()


def test_channel_names_propagate():
    inp_a, out_a, ga = _make_instance("alpha")
    inp_b, out_b, gb = _make_instance("beta")
    mix = MixGraph(ga, out_a)
    ga.topology[ga.node_id] = {PortPair(0, 0)}
    ga.connect(gb.node_id, PortPair(0, 1))
    inp_a.process_incoming_audio(np.zeros((2, 64), np.float32), Playhead())
    names = mix.presentation_input._stream.info.channel_names
    assert any("beta:0" in n for n in names)
    mix.close()


# ---------------------------------------------------------------------------
# multi-chip sharding (8 virtual CPU devices via conftest)
# ---------------------------------------------------------------------------


def test_sharded_spectrum_step_matches_single_device():
    import jax
    import jax.numpy as jnp

    from signalizer_tpu.core.config import (
        BinInterpolation,
        SpectrumChannels,
        ViewScaling,
    )
    from signalizer_tpu.core.constant import make_spectrum_constant
    from signalizer_tpu.kernels.spectrum import analyze_frames, init_line_graph_state
    from signalizer_tpu.parallel.mesh import (
        init_sharded_state,
        make_analysis_mesh,
        shard_batch,
        sharded_spectrum_step,
    )

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_analysis_mesh(8)
    constant = make_spectrum_constant(
        axis_points=128,
        window_size=256,
        configuration=SpectrumChannels.SEPARATE,
        bin_interpolation=BinInterpolation.LINEAR,
        view_scaling=ViewScaling.LOGARITHMIC,
    )
    pairs, t = 16, 2
    rng = np.random.default_rng(0)
    frames_host = rng.standard_normal((pairs, t, 2, 256)).astype(np.float32)

    step = sharded_spectrum_step(constant, mesh)
    state = init_sharded_state(constant, pairs, mesh)
    frames = shard_batch(jnp.asarray(frames_host), mesh)
    results, new_state, peak = step(state, frames, jnp.ones((t,), bool))
    jax.block_until_ready(results)
    # must equal the single-device result bit-for-bit (pure data parallel)
    ref_state = init_line_graph_state(constant, (pairs,))
    ref = analyze_frames(constant, ref_state, jnp.asarray(frames_host))
    np.testing.assert_allclose(np.asarray(results), np.asarray(ref.results), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(peak), float(np.max(np.asarray(ref.results))), rtol=1e-6)
    # sharding preserved on outputs (state stays resident per chip)
    assert len(results.sharding.device_set) == 8


def test_property_random_delivery_alignment():
    """Property test (SURVEY.md §4): random block sizes and interleavings
    must still produce sample-exact aligned content."""
    rng = np.random.default_rng(42)
    inp_a, out_a, ga = _make_instance("a")
    inp_b, out_b, gb = _make_instance("b")
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0)}
    ga.connect(gb.node_id, PortPair(0, 1))

    total = 8192
    a_sig = rng.standard_normal((2, total)).astype(np.float32)
    b_sig = rng.standard_normal((2, total)).astype(np.float32)
    a_pos = b_pos = 0
    b_clock_offset = 5_000  # b lives on a shifted clock
    while a_pos < total:
        # b delivers 0..2 blocks of random size, then a delivers one
        for _ in range(int(rng.integers(0, 3))):
            if b_pos < total:
                n = int(rng.integers(16, 400))
                n = min(n, total - b_pos)
                inp_b.process_incoming_audio(
                    b_sig[:, b_pos : b_pos + n],
                    Playhead(steady_clock=b_clock_offset + b_pos),
                )
                b_pos += n
        n = int(rng.integers(16, 400))
        n = min(n, total - a_pos)
        inp_a.process_incoming_audio(a_sig[:, a_pos : a_pos + n], Playhead(steady_clock=a_pos))
        a_pos += n

    got = sink.concat()
    emitted = got.shape[1]
    assert emitted > total // 2
    # system invariants: every emitted sample sits at a known position on
    # the self clock; bounded-latency drops are accounted, never silent.
    last_emit = int(mix._emitted_up_to)
    dropped = mix.perf.samples_dropped
    assert emitted + dropped == last_emit
    # channel 0 tail == a's content at the emitted clock positions
    tail = min(2048, emitted)
    np.testing.assert_allclose(
        got[0, emitted - tail :], a_sig[0, last_emit - tail : last_emit], atol=0.0
    )
    # channel 1 tail == b's content at (self clock - offset - b clock base)
    st = mix._sources[gb.node_id]
    b_lo = last_emit - st.offset - 5_000 - tail
    if b_lo >= 0:
        seg_want = b_sig[0, b_lo : b_lo + tail]
        matches = np.isclose(got[1, emitted - tail :], seg_want, atol=1e-7).mean()
        assert matches > 0.95, f"only {matches:.0%} aligned"
    mix.close()


def test_sidechain_connect_does_not_displace_self_stream():
    """Regression: connecting a peer BEFORE any audio flowed must not
    silence the host's own channels — the default self layout applies once
    at stream bring-up as explicit topology (ref: prepareToPlay ->
    applyDefaultLayoutFromRuntime, PluginProcessor.cpp:152-156), so later
    connects ADD to it."""
    inp_a, out_a, graph_a = _make_instance("self-main")
    mix = MixGraph(graph_a, out_a)
    inp_b, out_b, graph_b = _make_instance("self-side")
    graph_b.stream_output = out_b
    # connect the sidechain before ANY audio
    assert graph_a.connect(graph_b.node_id, PortPair(0, 1))
    sink = _Sink()
    mix.presentation_output.add_listener(sink)

    own = np.full((2, 256), 0.5, np.float32)
    side = np.full((2, 256), 0.25, np.float32)
    ph = Playhead(steady_clock=0, is_playing=True)
    inp_b.process_incoming_audio(side, ph)
    inp_a.process_incoming_audio(own, ph)
    inp_b.process_incoming_audio(side, Playhead(steady_clock=256, is_playing=True))
    inp_a.process_incoming_audio(own, Playhead(steady_clock=256, is_playing=True))

    got = sink.concat()
    assert got.shape[1] > 0
    # ch0: own audio alone; ch1: own + sidechain
    np.testing.assert_allclose(got[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(got[1, 256:], 0.75, atol=1e-6)
    mix.close()


def test_deliver_native_matches_numpy_rings(monkeypatch):
    """The fused native gather+accumulate (sz_mix_accumulate) produces the
    exact same presentation stream as the numpy read_at + add path."""
    import functools

    import signalizer_tpu.stream.mix_graph as mg
    from signalizer_tpu.stream.ring_buffer import make_ring_buffer

    rng = np.random.default_rng(11)
    blocks = [rng.standard_normal((2, 128)).astype(np.float32) for _ in range(6)]
    outs = []
    for prefer in (True, False):
        monkeypatch.setattr(
            mg, "make_ring_buffer",
            functools.partial(make_ring_buffer, prefer_native=prefer),
        )
        inp_a, out_a, ga = _make_instance(f"na-{prefer}")
        inp_b, out_b, gb = _make_instance(f"nb-{prefer}")
        mix = MixGraph(ga, out_a)
        sink = _Sink()
        mix.presentation_output.add_listener(sink)
        ga.topology[ga.node_id] = {PortPair(0, 0), PortPair(1, 1)}
        ga.connect(gb.node_id, PortPair(0, 1))
        ga.connect(gb.node_id, PortPair(1, 0))
        for i, blk in enumerate(blocks):
            ph = Playhead(steady_clock=i * 128)
            inp_b.process_incoming_audio(blk[::-1].copy(), ph)
            inp_a.process_incoming_audio(blk, ph)
        outs.append(sink.concat())
        mix.close()
    native_out, numpy_out = outs
    n = min(native_out.shape[1], numpy_out.shape[1])
    assert n >= 128
    np.testing.assert_array_equal(native_out[:, -n:], numpy_out[:, -n:])

def test_source_channel_count_change_mid_stream():
    """A peer reconfiguring its channel count (initialize_info) must not
    raise into the peer's delivery thread; the mix rebuilds the source ring
    in the new geometry and keeps mixing (regression: the per-source ring
    was fixed at construction and every later delivery ValueError'd)."""
    inp_a, out_a, ga = _make_instance("a")
    inp_b, out_b, gb = _make_instance("b")
    mix = MixGraph(ga, out_a)
    sink = _Sink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0), PortPair(1, 1)}
    ga.connect(gb.node_id, PortPair(0, 1))

    a_block = np.zeros((2, 128), np.float32)
    b2 = np.zeros((2, 128), np.float32)
    b2[0] = 0.5
    for i in range(3):
        ph = Playhead(steady_clock=i * 128)
        inp_b.process_incoming_audio(b2, ph)
        inp_a.process_incoming_audio(a_block, ph)

    # b grows to 4 channels mid-stream
    inp_b.initialize_info(lambda info: setattr(info, "channels", 4))
    b4 = np.zeros((4, 128), np.float32)
    b4[0] = 0.25
    for i in range(3, 8):
        ph = Playhead(steady_clock=i * 128)
        inp_b.process_incoming_audio(b4, ph)  # must not raise
        inp_a.process_incoming_audio(a_block, ph)

    got = sink.concat()
    # after realignment settles the new-geometry audio mixes through
    np.testing.assert_allclose(got[1, -128:], 0.25, atol=1e-6)
    mix.close()


def test_emitted_playhead_matches_emitted_range():
    """The presentation block's playhead must describe the emitted range,
    not the raw input block: consecutive deliveries tile exactly
    (steady_clock advances by the previous block's length), so chained
    clock-aligned consumers place the audio correctly."""
    inp_a, out_a, ga = _make_instance("a")
    mix = MixGraph(ga, out_a)

    class _PhSink(_Sink):
        def __init__(self):
            super().__init__()
            self.clocks = []

        def on_stream_audio(self, ctx, block):
            super().on_stream_audio(ctx, block)
            self.clocks.append(ctx.playhead.steady_clock)

    sink = _PhSink()
    mix.presentation_output.add_listener(sink)
    ga.topology[ga.node_id] = {PortPair(0, 0), PortPair(1, 1)}
    block = np.random.default_rng(0).standard_normal((2, 96)).astype(np.float32)
    for i in range(6):
        inp_a.process_incoming_audio(block, Playhead(steady_clock=i * 96))
    assert len(sink.blocks) >= 2
    for k in range(1, len(sink.blocks)):
        assert sink.clocks[k] == sink.clocks[k - 1] + sink.blocks[k - 1].shape[1]
    mix.close()


def test_threaded_listener_fault_does_not_kill_delivery():
    """A raising listener must not kill the threaded delivery worker —
    the stream keeps delivering to healthy listeners (Protected.h parity)."""
    inp, out = AudioStream.create(
        threaded=True, info=AudioStreamInfo(channels=2, audio_history_capacity=4096)
    )

    class _Bomb(_Sink):
        def on_stream_audio(self, ctx, block):
            raise RuntimeError("listener bug")

    healthy = _Sink()
    out.add_listener(_Bomb())
    out.add_listener(healthy)
    block = np.ones((2, 256), np.float32)
    for i in range(4):
        inp.process_incoming_audio(block, Playhead(steady_clock=i * 256))
    assert inp._stream.wait_for_drain(timeout=5.0)
    # the healthy listener (registered AFTER the bomb) still gets every
    # block: containment is per listener, not per fan-out
    assert len(healthy.blocks) == 4
    inp.process_incoming_audio(block, Playhead(steady_clock=4 * 256))
    assert inp._stream.wait_for_drain(timeout=5.0)
    assert len(healthy.blocks) == 5
    inp._stream.close()

def test_closed_alias_is_never_promoted():
    """An alias that closed before the canonical node must be dropped from
    the chain — promoting it would install a dead node in the registry
    under the canonical identity, permanently (regression)."""
    _, _, original = _make_instance("orig")
    ar = Archive()
    original.serialize(ar)
    _, _, clone1 = _make_instance("clone1")
    clone1.deserialize(Archive.from_bytes(ar.to_bytes()))
    _, _, clone2 = _make_instance("clone2")
    clone2.deserialize(Archive.from_bytes(ar.to_bytes()))
    orig_id = original.node_id
    clone1.close()  # first alias dies BEFORE the canonical node
    original.close()
    survivor = HostGraph.find(orig_id)
    assert survivor is clone2 and survivor._alive
    assert all(n._alive for n in HostGraph.live_nodes())


def test_promotion_drops_edges_to_dead_holder():
    """Bugs.txt #1: when an alias is promoted to the canonical identity,
    its edges to the DEAD holder of that identity must not become
    self-loops; its self-edges must follow its identity."""
    _, _, original = _make_instance("orig")
    ar = Archive()
    original.serialize(ar)
    _, _, clone = _make_instance("clone")
    clone.deserialize(Archive.from_bytes(ar.to_bytes()))
    old_clone_id = clone.node_id
    # clone mixes from the original (a genuine cross-edge) and monitors
    # itself
    clone.topology[original.node_id] = {PortPair(0, 0)}
    clone.topology[old_clone_id] = {PortPair(1, 1)}
    original.close()  # clone promoted to original's identity
    assert clone.node_id == original.node_id
    # the cross-edge to the dead holder did NOT become a self-loop...
    assert clone.topology.get(clone.node_id) == {PortPair(1, 1)}
    # ...and the old-identity self-edge followed the identity change
    assert old_clone_id not in clone.topology


def test_assume_identity_notifies_peers():
    """assume_identity_of must broadcast a topology change (peers with
    edges to the assumed identity have to learn it is live again), move
    the node's self-edges to the new identity, and drop edges that would
    self-loop (Bugs.txt #1)."""
    import uuid as _uuid

    _, _, b = _make_instance("b")
    _, _, watcher = _make_instance("w")
    dead_id = _uuid.uuid4().bytes  # an identity with no live holder
    HostGraph._alias_chains[dead_id] = [b]
    old_id = b.node_id
    b.topology[old_id] = {PortPair(0, 0)}      # self-monitor
    b.topology[dead_id] = {PortPair(1, 1)}     # edge to the dead holder
    watcher.connect(dead_id, PortPair(0, 0))
    fired = []
    watcher.add_topology_listener(lambda: fired.append(1))
    assert b.assume_identity_of(dead_id)
    assert fired, "peers must be notified when an identity resurrects"
    assert HostGraph.find(dead_id) is b
    assert dead_id not in HostGraph._alias_chains  # chain cleaned up
    # self-edges followed the identity; the dead-holder edge did not
    # become a self-loop
    assert b.topology.get(dead_id) == {PortPair(0, 0)}
    assert old_id not in b.topology


def test_mix_graph_close_unregisters_topology_listener():
    """A closed MixGraph must stop receiving topology callbacks — a
    leaked listener accumulates rebuild commands forever and keeps the
    rings alive (round-3 review)."""
    _, out, g = _make_instance("mix-close-test")
    mix = MixGraph(g, out)
    assert mix._on_topology_changed in g._topology_listeners
    mix.close()
    assert mix._on_topology_changed not in g._topology_listeners
    g.close()


def test_alias_chain_dedupes_repeated_deserialize():
    """Hosts re-send state routinely: deserializing the same colliding
    identity twice must not enter the alias chain twice (close() removes
    ONE occurrence — a duplicate would leave a dead node promotable)."""
    from signalizer_tpu.state.serialize import Archive
    from signalizer_tpu.stream.host_graph import HostGraph

    holder = HostGraph("alias-holder", channels=2)
    other = HostGraph("alias-joiner", channels=2)
    ar = Archive()
    ar["name"] = "joiner"
    ar["node_id"] = holder.node_id
    other.deserialize(ar)
    other.deserialize(ar)  # the re-send
    chain = HostGraph._alias_chains.get(holder.node_id, [])
    assert chain.count(other) == 1
    other.close()
    assert other not in HostGraph._alias_chains.get(holder.node_id, [])
    holder.close()

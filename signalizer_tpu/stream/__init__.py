from signalizer_tpu.stream.ring_buffer import RingBuffer  # noqa: F401
from signalizer_tpu.stream.batcher import FrameBatcher  # noqa: F401
from signalizer_tpu.stream.frame_pipeline import FramePipeline  # noqa: F401
from signalizer_tpu.stream.audio_stream import (  # noqa: F401
    AudioStream,
    AudioStreamInfo,
    Playhead,
    StreamListener,
)

from signalizer_tpu.state.serialize import Archive, SerializableObject  # noqa: F401
from signalizer_tpu.state.presets import PresetManager  # noqa: F401

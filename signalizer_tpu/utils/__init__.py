from signalizer_tpu.utils.diagnostics import Diagnostics, SharedBehaviour, assumption  # noqa: F401

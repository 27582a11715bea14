from signalizer_tpu.core.config import (  # noqa: F401
    SpectrumChannels,
    OscChannels,
    BinInterpolation,
    ViewScaling,
    DisplayMode,
    TransformAlgorithm,
    MAX_INPUT_CHANNELS,
    STREAM_PACKET_SIZE,
)
from signalizer_tpu.core.windows import (  # noqa: F401
    WindowType,
    generate_window,
    window_scale,
    window_coefficients,
    window_scallop_loss,
)
from signalizer_tpu.core.scaling import (  # noqa: F401
    db_to_fraction,
    fraction_to_db,
    unity_scale_linear,
    unity_scale_linear_inv,
    unity_scale_exp,
    unity_scale_exp_inv,
    peak_decay_pole,
)

from signalizer_tpu.params.parameters import (  # noqa: F401
    Parameter,
    ParameterSet,
    ParameterMap,
    LinearRange,
    ExponentialRange,
    UnityRange,
    BooleanRange,
    IntegerLinearRange,
    BasicFormatter,
    UnitFormatter,
    DBFormatter,
    PercentageFormatter,
    IntegerFormatter,
    BooleanFormatter,
    ChoiceFormatter,
)
from signalizer_tpu.params.values import (  # noqa: F401
    ColourValue,
    WindowDesignValue,
    PowerSlopeValue,
    TransformValue,
)
from signalizer_tpu.params.transformatters import (  # noqa: F401
    AudioHistoryTransformatter,
    WindowSizeTransformatter,
    LinearHzFormatter,
    TimeMode,
)

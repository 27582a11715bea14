from signalizer_tpu.kernels.spectrum import (  # noqa: F401
    spectrum_values,
    post_process,
    analyze_frames,
    init_line_graph_state,
)
from signalizer_tpu.kernels.peak_decay import (  # noqa: F401
    peak_decay_step,
    peak_decay_scan,
)

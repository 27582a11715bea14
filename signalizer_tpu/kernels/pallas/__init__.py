from signalizer_tpu.kernels.pallas.display_map import (  # noqa: F401
    fused_display_map,
    make_display_map_operands,
    pallas_supported,
)

"""I/O: RAW frame readers/writers, flow visualization, VTK export."""

from tpuflow.io.raw import (  # noqa: F401
    read_raw_u8,
    read_raw_f32,
    write_raw_u8,
    write_raw_f32,
)
from tpuflow.io.flow_viz import (  # noqa: F401
    flow_to_rgb,
    write_flow_image_rgb,
    write_magnitude_f32,
)

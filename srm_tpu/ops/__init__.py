from srm_tpu.ops.stencil import (  # noqa: F401
    pad_symmetric,
    neighbors,
    Neighbors,
    harmonic_faces,
    average_faces,
    upstream_faces,
    five_point_divergence,
)

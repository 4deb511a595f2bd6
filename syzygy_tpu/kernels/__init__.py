from syzygy_tpu.kernels.raster import (
    TriSetup,
    VisibilityBuffer,
    rasterize,
    setup_triangles,
)

__all__ = [
    "TriSetup",
    "VisibilityBuffer",
    "rasterize",
    "setup_triangles",
]

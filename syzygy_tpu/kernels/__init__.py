from syzygy_tpu.kernels.raster import (
    TriSetup,
    VisibilityBuffer,
    rasterize,
    setup_triangles,
)
from syzygy_tpu.kernels.resolve import (
    GBuffer,
    resolve_gbuffer,
    sample_atlas_repeat,
    sample_bilinear_repeat,
    transform_normals,
    transform_positions,
)
from syzygy_tpu.kernels.lighting import convert_pbr, deferred_lighting
from syzygy_tpu.kernels.transfer import (
    gradient_color,
    matrix_color,
    oetf_pure_gamma,
    oetf_srgb,
)

__all__ = [
    "TriSetup",
    "VisibilityBuffer",
    "rasterize",
    "setup_triangles",
    "GBuffer",
    "resolve_gbuffer",
    "sample_atlas_repeat",
    "sample_bilinear_repeat",
    "transform_normals",
    "transform_positions",
    "convert_pbr",
    "deferred_lighting",
    "gradient_color",
    "matrix_color",
    "oetf_pure_gamma",
    "oetf_srgb",
]

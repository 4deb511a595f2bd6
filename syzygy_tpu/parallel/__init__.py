from syzygy_tpu.parallel.sharding import (
    batch_params,
    make_mesh,
    render_frames_sharded,
    replicate_to_mesh,
)

__all__ = [
    "batch_params",
    "make_mesh",
    "render_frames_sharded",
    "replicate_to_mesh",
]

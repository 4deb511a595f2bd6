from syzygy_tpu.renderer.frame import RenderConfig, render_frame, render_frame_packed

__all__ = ["RenderConfig", "render_frame", "render_frame_packed"]

from syzygy_tpu.renderer.frame import RenderConfig, render_frame

__all__ = ["RenderConfig", "render_frame"]

from syzygy_tpu.utils.metrics import RingBuffer, TickTiming
from syzygy_tpu.utils.png import read_png, write_png

__all__ = ["RingBuffer", "TickTiming", "read_png", "write_png"]

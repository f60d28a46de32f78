from cdae_tpu.utils.timer import Timer
from cdae_tpu.utils.logging import get_logger

__all__ = ["Timer", "get_logger"]

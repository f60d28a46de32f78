from cdae_tpu.models.base import RecsysModel
from cdae_tpu.models.cdae import CDAE, CDAEConfig

__all__ = ["RecsysModel", "CDAE", "CDAEConfig"]

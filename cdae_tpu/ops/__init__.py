from cdae_tpu.ops.losses import Loss, LossType
from cdae_tpu.ops.penalties import Penalty, PenaltyType

__all__ = ["Loss", "LossType", "Penalty", "PenaltyType"]

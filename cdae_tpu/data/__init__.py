from cdae_tpu.data.vocab import Vocab
from cdae_tpu.data.dataset import Interactions, PaddedUserBatch
from cdae_tpu.data import io

__all__ = ["Vocab", "Interactions", "PaddedUserBatch", "io"]

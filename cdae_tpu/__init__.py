"""cdae_tpu — a TPU-native collaborative-filtering / recommender framework.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of the
reference C++ library libcf (jasonyaw/CDAE, WSDM'16): denoising-autoencoder
training over sparse user-item interactions (CDAE), a model zoo of MF/ranking/
neighborhood models, pluggable losses and penalties, AdaGrad optimization, and
batched on-device top-N evaluation — designed TPU-first (batched SPMD training
over device meshes instead of sequential per-user SGD).

Layer map (mirrors reference /root/reference layering, see SURVEY.md §1):
  data/     — datasets, vocabularies, splits, caching (ref src/base/)
  ops/      — losses, penalties, corruption, sampling, top-k, metrics
              (ref src/model/loss.hpp, penalty.hpp, evaluation.hpp)
  models/   — CDAE + model zoo (ref src/model/, src/model/recsys/)
  solver/   — training loop, SGD solver, AdaGrad (ref src/solver/)
  parallel/ — device meshes, sharded training/eval (new; no ref equivalent)
  utils/    — config, logging, timers, checkpointing (ref src/base/)
"""

__version__ = "0.1.0"

from cdae_tpu.data.dataset import Interactions
from cdae_tpu.ops.losses import Loss, LossType
from cdae_tpu.ops.penalties import Penalty, PenaltyType

__all__ = [
    "Interactions",
    "Loss",
    "LossType",
    "Penalty",
    "PenaltyType",
    "__version__",
]

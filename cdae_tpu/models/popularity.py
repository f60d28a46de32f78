"""Global item-popularity baseline (ref: src/model/recsys/popularity.hpp).

The reference counts item occurrences at reset, sorts descending, and
recommends the most popular unrated items (popularity.hpp:43-61, :23-41).
TPU-native: the count vector IS the score vector; recommendation is the
standard masked top-k over broadcast scores. Tie order may differ from the
reference's sort (both are arbitrary among equal counts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cdae_tpu.data.dataset import Interactions
from cdae_tpu.models.base import ModelState, RecsysModel


class Popularity(RecsysModel):
    name = "Popularity"

    def reset(self, data: Interactions, seed: int = 0) -> ModelState:
        counts = np.bincount(data.items, minlength=data.num_items).astype(
            np.float32
        )
        return ModelState(
            params={"counts": jnp.asarray(counts)},
            padded=data.padded(),
            num_users=data.num_users,
            num_items=data.num_items,
        )

    def train_one_iteration(self, state, rng_key):
        return state  # ref popularity.hpp:19-21: training is a no-op

    def batch_scores(self, state, uids, rated_items, rated_mask):
        B = np.asarray(uids).shape[0]
        return jnp.broadcast_to(
            state.params["counts"][None, :], (B, state.num_items)
        )

    def predict(self, state, users, items):
        return state.params["counts"][jnp.asarray(items)]

"""Batched masked top-k over the item catalog.

Replaces the reference's per-user bounded-heap scan over all items
(ref: src/model/recsys/recsys_model_base.hpp:77-104, heap.hpp:12-88) with a
single on-device ``jax.lax.top_k`` over score rows, after masking out each
user's already-rated items at -inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain float, not a jnp array: module import must not initialize the XLA
# backend (jax.distributed.initialize has to run first on multi-host)
NEG_INF = float("-inf")


def mask_rated(
    scores: jnp.ndarray,  # (B, I) float
    rated_items: jnp.ndarray,  # (B, L) int32, padded with I (out of range)
) -> jnp.ndarray:
    """Set each user's rated item scores to -inf (padding ids are dropped)."""
    B, I = scores.shape
    # scatter -inf at rated positions; padded ids (== I) fall outside and are
    # dropped by scatter's OOB semantics
    return scores.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], rated_items
    ].set(NEG_INF, mode="drop")


def topk_unrated(
    scores: jnp.ndarray,  # (B, I)
    rated_items: jnp.ndarray,  # (B, L) padded with I
    k: int,
):
    """Top-k item ids + scores excluding rated items. Returns (ids, vals).

    Catalogs smaller than k are padded with -inf slots whose ids come back
    as the sentinel ``I`` (never matches a real item in the metrics)."""
    I = scores.shape[1]
    masked = mask_rated(scores, rated_items)
    if I < k:
        masked = jnp.pad(
            masked, ((0, 0), (0, k - I)), constant_values=NEG_INF
        )
    vals, ids = jax.lax.top_k(masked, k)
    ids = jnp.where(ids >= I, I, ids)
    return ids.astype(jnp.int32), vals

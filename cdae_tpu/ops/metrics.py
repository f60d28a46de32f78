"""Batched ranking metrics.

Bit-exact re-implementations (as array ops over padded per-user lists) of the
reference's per-user scoring loops:

  - TOPN:  P@1/5/10, R@1/5/10, MAP@5/10 over a length-10 rec list
           (ref: src/model/evaluation.hpp:183-218, evaluate_rec_list)
  - RANKING: NDCG@5/10 (natural-log discount, 2^rel-1 gains), Prec/Recall@5/10
           with relevance>=4 threshold, MAP@5/10
           (ref: src/model/evaluation.hpp:309-361)

Both evaluators average per-user rows over the number of VALIDATION users
(users with >=1 validation item), matching evaluation.hpp:160-166.
"""

from __future__ import annotations

import jax.numpy as jnp

TOPN_COLUMNS = ("P@1", "P@5", "P@10", "R@1", "R@5", "R@10", "MAP@5", "MAP@10")
RANKING_COLUMNS = (
    "NDCG@5", "NDCG@10", "Prec@5", "Prec@10",
    "Recall@5", "Recall@10", "MAP@5", "MAP@10",
)


def _membership(rec: jnp.ndarray, val_items: jnp.ndarray, val_mask: jnp.ndarray):
    """member[b,k] = rec[b,k] ∈ validation set of user b; (B,K) bool."""
    eq = rec[:, :, None] == val_items[:, None, :]
    return jnp.any(jnp.logical_and(eq, val_mask[:, None, :]), axis=-1)


def topn_user_metrics(
    rec: jnp.ndarray,  # (B, 10) int32 recommended item ids, ranked
    val_items: jnp.ndarray,  # (B, Lv) int32, padded
    val_mask: jnp.ndarray,  # (B, Lv) bool
) -> jnp.ndarray:
    """Per-user (B, 8) metric rows in TOPN_COLUMNS order."""
    K = rec.shape[1]
    assert K >= 10, "TOPN evaluation requires a length-10 rec list"
    member = _membership(rec[:, :10], val_items, val_mask).astype(jnp.float32)
    hit_cum = jnp.cumsum(member, axis=1)  # hits within top-(idx+1)
    nval = jnp.sum(val_mask, axis=1).astype(jnp.float32)
    nval_safe = jnp.maximum(nval, 1.0)

    p1 = hit_cum[:, 0]
    p5 = hit_cum[:, 4] / 5.0
    p10 = hit_cum[:, 9] / 10.0
    r1 = hit_cum[:, 0] / nval_safe
    r5 = hit_cum[:, 4] / nval_safe
    r10 = hit_cum[:, 9] / nval_safe

    ranks = jnp.arange(1, 11, dtype=jnp.float32)[None, :]
    prec_at_rank = member * hit_cum / ranks
    map5 = jnp.sum(prec_at_rank[:, :5], axis=1) / jnp.minimum(5.0, nval_safe)
    map10 = jnp.sum(prec_at_rank[:, :10], axis=1) / jnp.minimum(10.0, nval_safe)

    rows = jnp.stack([p1, p5, p10, r1, r5, r10, map5, map10], axis=1)
    # users with no validation items contribute zero rows
    return rows * (nval > 0).astype(jnp.float32)[:, None]


def topn_mean(rows: jnp.ndarray, val_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over validation users (ref evaluation.hpp:160-166); (8,)."""
    num_val_users = jnp.maximum(
        jnp.sum(jnp.any(val_mask, axis=1).astype(jnp.float32)), 1.0
    )
    return jnp.sum(rows, axis=0) / num_val_users


def ranking_user_metrics(
    rec: jnp.ndarray,  # (B, 10) int32
    val_items: jnp.ndarray,  # (B, Lv) int32, padded
    val_ratings: jnp.ndarray,  # (B, Lv) float32 relevances
    val_mask: jnp.ndarray,  # (B, Lv) bool
    rel_threshold: float = 4.0,  # relevance cut for a "hit" (ref >=4)
) -> jnp.ndarray:
    """Per-user (B, 8) rows in RANKING_COLUMNS order (rel>=threshold counts
    a hit; the reference hardcodes 4, ref evaluation.hpp:309-331)."""
    member = _membership(rec[:, :10], val_items, val_mask)
    # relevance of each recommended item (0 if not in validation set)
    eq = jnp.logical_and(
        rec[:, :10, None] == val_items[:, None, :], val_mask[:, None, :]
    )
    rel = jnp.max(
        jnp.where(eq, val_ratings[:, None, :], 0.0), axis=-1, initial=0.0
    )
    nval = jnp.sum(val_mask, axis=1).astype(jnp.float32)

    discount = 1.0 / jnp.log(jnp.arange(10, dtype=jnp.float32) + 2.0)[None, :]
    gains = (jnp.exp2(rel) - 1.0) * member.astype(jnp.float32) * discount
    dcg5 = jnp.sum(gains[:, :5], axis=1)
    dcg10 = jnp.sum(gains, axis=1)

    # ideal DCG from the validation relevances sorted descending
    sorted_rel = -jnp.sort(
        jnp.where(val_mask, -val_ratings, jnp.inf), axis=1
    )[:, :10]
    in_gt = jnp.arange(10, dtype=jnp.float32)[None, :] < nval[:, None]
    pad10 = 10 - sorted_rel.shape[1]
    if pad10 > 0:
        sorted_rel = jnp.pad(sorted_rel, ((0, 0), (0, pad10)))
    igains = (jnp.exp2(jnp.where(in_gt, sorted_rel, 0.0)) - 1.0) * in_gt * discount
    idcg5 = jnp.sum(igains[:, :5], axis=1)
    idcg10 = jnp.sum(igains, axis=1)

    relevant = jnp.logical_and(member, rel >= rel_threshold).astype(jnp.float32)
    hit_cum = jnp.cumsum(relevant, axis=1)
    hit5 = hit_cum[:, 4]
    hit10 = hit_cum[:, 9]
    ranks = jnp.arange(1, 11, dtype=jnp.float32)[None, :]
    prec_at_rank = relevant * hit_cum / ranks
    map5 = jnp.sum(prec_at_rank[:, :5], axis=1)
    map10 = jnp.sum(prec_at_rank, axis=1)

    num_rels = jnp.sum(
        jnp.logical_and(val_mask, val_ratings >= rel_threshold).astype(jnp.float32),
        axis=1
    )
    has_rel = (num_rels > 0).astype(jnp.float32)
    num_rels_safe = jnp.maximum(num_rels, 1.0)
    nval_safe = jnp.maximum(nval, 1.0)

    rows = jnp.stack(
        [
            dcg5 / jnp.maximum(idcg5, 1e-12),
            dcg10 / jnp.maximum(idcg10, 1e-12),
            hit5 / 5.0,
            hit10 / 10.0,
            has_rel * hit5 / num_rels_safe,
            has_rel * hit10 / num_rels_safe,
            has_rel * map5 / jnp.minimum(5.0, nval_safe),
            has_rel * map10 / jnp.minimum(10.0, nval_safe),
        ],
        axis=1,
    )
    return rows * (nval > 0).astype(jnp.float32)[:, None]


def rmse(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Root-mean-square error (ref evaluation.hpp:46-61)."""
    err = preds - labels
    return jnp.sqrt(jnp.mean(err * err))


def mae(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (ref evaluation.hpp:74-89)."""
    return jnp.mean(jnp.abs(preds - labels))

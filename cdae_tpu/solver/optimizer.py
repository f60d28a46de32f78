"""AdaGrad-style updates used across the model zoo.

The reference updates parameters per-touch with per-coordinate AdaGrad
accumulators initialized at 1e-4 and step ``lr * g / (beta + sqrt(acc))``
(e.g. ref src/model/recsys/cdae.hpp:230-236, imf.hpp:95-106). The TPU build
accumulates gradients over a synchronous user minibatch (segment-sum) and
applies one AdaGrad step per batch — the standard accelerator reformulation
of Hogwild-style per-example updates.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

ADAGRAD_INIT = 1e-4  # ref: DMatrix::Constant(..., 0.0001) accumulators


def adagrad_update(
    param: jnp.ndarray,
    acc: jnp.ndarray,
    grad: jnp.ndarray,
    learn_rate: float,
    beta: float = 0.0,
    use_adagrad: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense AdaGrad step. Zero-gradient coordinates are untouched."""
    if use_adagrad:
        acc = acc + grad * grad
        param = param - learn_rate * grad / (beta + jnp.sqrt(acc))
    else:
        param = param - learn_rate * grad
    return param, acc


def adagrad_row_update(
    param: jnp.ndarray,  # (N, D) or (N,)
    acc: jnp.ndarray,
    rows: jnp.ndarray,  # (B,) int32 — must be unique within the batch
    grad_rows: jnp.ndarray,  # (B, D) or (B,)
    row_weight: jnp.ndarray,  # (B,) 0/1 — padded batch rows get 0
    learn_rate: float,
    beta: float = 0.0,
    use_adagrad: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse row-wise AdaGrad step via delta scatter-ADD: zero-weight
    (padding) rows contribute zero deltas, so duplicate row ids (padding
    reusing a live uid) cannot clobber a live update the way a duplicate
    .set could (scatter order is undefined)."""
    w = row_weight.astype(param.dtype)
    w = w.reshape((-1,) + (1,) * (grad_rows.ndim - 1))
    g = grad_rows * w
    if use_adagrad:
        gsq = g * g
        a_rows = acc[rows] + gsq
        acc = acc.at[rows].add(gsq, mode="drop")
        step = learn_rate * g / (beta + jnp.sqrt(a_rows))
    else:
        step = learn_rate * g
    param = param.at[rows].add(-step * (w > 0), mode="drop")
    return param, acc


def dense_adagrad_step(
    param: jnp.ndarray,
    acc: jnp.ndarray,
    grad: jnp.ndarray,
    learn_rate: float,
    beta: float = 0.0,
    use_adagrad: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Accumulate-then-apply AdaGrad with f32 optimizer arithmetic
    (accumulators stored f32; bf16 params round-trip through f32). The
    single shared implementation used by every model's dense updates."""
    g32 = grad.astype(jnp.float32)
    if use_adagrad:
        acc = acc + g32 * g32
        param = (
            param.astype(jnp.float32)
            - learn_rate * g32 / (beta + jnp.sqrt(acc))
        ).astype(param.dtype)
    else:
        param = (param.astype(jnp.float32) - learn_rate * g32).astype(
            param.dtype
        )
    return param, acc


def row_adagrad_delta(
    param: jnp.ndarray,  # (N, ...) table
    acc: jnp.ndarray,
    rows: jnp.ndarray,  # (B,) row ids; batch padding may DUPLICATE live ids
    grad_rows: jnp.ndarray,  # (B, ...) per-row grads (already weighted)
    live,  # (B, ...) bool broadcastable to grad_rows
    learn_rate: float,
    beta: float = 0.0,
    use_adagrad: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse per-row AdaGrad via delta scatter-ADD, f32 optimizer math.
    Delta-adds (never .set): zero-weight padding rows contribute zero
    deltas, so duplicate row ids cannot clobber a live update (scatter
    order is undefined for duplicate .set)."""
    g32 = grad_rows.astype(jnp.float32)
    if use_adagrad:
        gsq = jnp.where(live, g32 * g32, 0.0)
        a_rows = acc[rows] + gsq
        acc = acc.at[rows].add(gsq, mode="drop")
        step = learn_rate * g32 / (beta + jnp.sqrt(a_rows))
    else:
        step = learn_rate * g32
    delta = jnp.where(live, -step, 0.0).astype(param.dtype)
    param = param.at[rows].add(delta, mode="drop")
    return param, acc


def inverse_time_decay(lr0: float, reg: float, steps: jnp.ndarray) -> jnp.ndarray:
    """SGD learn-rate schedule lr0 / (1 + lr0*reg*steps)
    (ref src/solver/sgd-inl.hpp:84-91; off by default)."""
    return lr0 / (1.0 + lr0 * reg * steps)

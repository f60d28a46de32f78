"""Input mask-out (denoising) corruption.

Reference semantics (src/model/recsys/cdae.hpp:361-371): each observed item
is independently KEPT with probability ``Random::uniform() > ratio``, i.e.
kept w.p. (1 - ratio). When ``scaled`` is on, kept inputs are multiplied by
1/(1 - ratio) (ref cdae.hpp:88-91, 202-205).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def corrupt_mask(
    key: jax.Array,
    mask: jnp.ndarray,  # (B, L) bool — real (unpadded) positions
    corruption_ratio: float,
) -> jnp.ndarray:
    """Bernoulli keep-mask over real positions; (B, L) bool."""
    if corruption_ratio <= 0.0:
        return mask
    keep = jax.random.uniform(key, mask.shape) > corruption_ratio
    return jnp.logical_and(mask, keep)


def input_scale(corruption_ratio: float, scaled: bool) -> float:
    """Static input rescale factor (ref cdae.hpp:202-205)."""
    if scaled and corruption_ratio < 1.0:
        return 1.0 / (1.0 - corruption_ratio)
    return 1.0

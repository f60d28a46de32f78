"""On-device negative sampling.

The reference rejection-samples uniform item ids until one is outside the
user's rated set (ref: src/model/recsys/recsys_model_base.hpp:46-70). That
data-dependent loop is hostile to XLA; we instead sample EXACTLY from the
complement of the rated set in closed form:

Given a user's rated items R sorted ascending (padded with num_items), the
u-th unrated item (u in [0, num_items - |R|)) is ``u + k`` where k is the
number of rated items r_j with ``r_j - j <= u``. Since ``R[j] - j`` is
non-decreasing, k is one searchsorted. This is an exact, rejection-free
equivalent of uniform sampling over unrated items.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_seed(key: jax.Array) -> jnp.ndarray:
    """Cheap int32 seed from PRNG key state (reads the key words, no
    threefry rounds). Keys produced by jax.random.split along a training
    scan have distinct word pairs, so the derived seeds differ per step."""
    kd = jax.random.key_data(key).ravel()
    return (kd[0] ^ kd[-1]).astype(jnp.int32)


def hw_randint(
    key: jax.Array,
    shape,
    maxval: jnp.ndarray,  # scalar or broadcastable to ``shape``; >= 1
    salt: int = 0,
) -> jnp.ndarray:
    """Uniform int32 in [0, maxval) via the TPU hardware PRNG
    (ops/pallas_kernels.hw_uniform) — ~free vs threefry, which costs real
    step time in the fused training epochs (CLAUDE.md / BASELINE.md).
    Float-scaling bias is < maxval·2⁻²⁴ per draw — negligible for catalog
    sizes (< 16M). TPU-only (hw_uniform has no interpret-mode path);
    ``salt`` decorrelates multiple draws from the same step key."""
    from cdae_tpu.ops.pallas_kernels import hw_uniform

    seed = key_seed(key) ^ jnp.int32(salt)
    u01 = hw_uniform(seed, tuple(shape))
    mx = jnp.asarray(maxval, jnp.float32)
    return jnp.minimum(
        (u01 * mx).astype(jnp.int32), jnp.asarray(maxval, jnp.int32) - 1
    )


def sample_unrated(
    key: jax.Array,
    sorted_items: jnp.ndarray,  # (B, L) int32, ascending, padded with num_items
    lengths: jnp.ndarray,  # (B,) int32 — number of real (unpadded) entries
    num_items: int,
    num_samples: int,
    *,
    hw: bool = False,  # TPU hardware PRNG for the uniform draws (fast_rng)
) -> jnp.ndarray:
    """Uniform samples from each user's UNRATED items; (B, num_samples) int32.

    Rows where lengths == num_items have an empty complement: their samples
    come back as the SENTINEL id ``num_items`` (out of catalog). Callers
    must zero-weight slots with id >= num_items — clipping the sentinel to
    num_items-1 would turn a RATED item into a live negative.
    """
    B, L = sorted_items.shape
    free = jnp.maximum(num_items - lengths, 1)  # complement size per user
    if hw:
        u = hw_randint(key, (B, num_samples), free[:, None])
    else:
        u = jax.random.randint(
            key, (B, num_samples), minval=0, maxval=free[:, None],
            dtype=jnp.int32,
        )  # uniform over [0, free) per row; free >= 1
    # rank transform: R[j] - j is the count of unrated ids below R[j].
    # Padded slots must not perturb the (sorted) rank array: force them to
    # num_items, which exceeds every valid query u <= num_items - |R| - 1.
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    ranks = jnp.where(valid, sorted_items - pos, num_items)
    # k = number of rated ids skipped before reaching the u-th unrated id
    # = #{j : ranks[j] <= u}. ranks is already materialized, so count via a
    # fused compare+reduce on the VPU (B·L·S ops) instead of a vmapped
    # searchsorted — the binary-search while_loop serializes on TPU
    # (measured 3.8 ms/batch at (4096, 1041) for S=5, 37 s/epoch for
    # WARP's S=320, vs ~0.1-2 ms for the reduce). Chunk S to bound the
    # (B, L, chunk) fusion working set.
    chunk = 32
    if num_samples <= chunk:
        k = jnp.sum(
            (ranks[:, :, None] <= u[:, None, :]).astype(jnp.int32), axis=1
        )
    elif num_samples <= 512:
        # mid-size S (e.g. WARP's nn·num_tries=320): chunked compare-sum
        # still beats the serialized search (37 s/epoch -> ms, measured)
        S_pad = -(-num_samples // chunk) * chunk
        u_p = jnp.pad(u, ((0, 0), (0, S_pad - num_samples)))
        u_c = u_p.reshape(B, S_pad // chunk, chunk)

        def body(_, uc):
            return None, jnp.sum(
                (ranks[:, :, None] <= uc[:, None, :]).astype(jnp.int32),
                axis=1,
            )

        _, k_c = jax.lax.scan(body, None, jnp.moveaxis(u_c, 1, 0))
        k = jnp.moveaxis(k_c, 0, 1).reshape(B, S_pad)[:, :num_samples]
    else:
        # huge S (CDAE's num_neg·L): B·L·S compare volume loses to the
        # vectorized search (measured 3k vs 22.7k users/s at S=4000,
        # L=800 on the 200k x 50k smoke). method='sort' (concat + one
        # XLA sort instead of the binary-search while_loop, which
        # serializes on TPU) measured 4.7x faster than the default scan
        # at (B=1024, L=680, S=3400): 86 vs 405 ms, bitwise-equal ranks
        # (round 5) — the sampler was ~29% of the exact sparse step.
        k = jax.vmap(
            lambda r, q: jnp.searchsorted(r, q, side="right",
                                          method="sort"),
            in_axes=(0, 0),
        )(ranks, u)
    return (u + k).astype(jnp.int32)


def is_rated(
    sorted_items: jnp.ndarray,  # (B, L) int32, ascending, padded with num_items
    lengths: jnp.ndarray,  # (B,) int32 — number of real entries per row
    queries: jnp.ndarray,  # (Q,) shared or (B, Q) per-row int32 ids < num_items
) -> jnp.ndarray:
    """Membership of ``queries`` in each row's rated set; (B, Q) bool.

    The CSR-gathered replacement for ``dense_mask[uids][:, queries]`` when
    the (U, I) rated mask is never built (huge catalogs — see
    MFConfig.warp_pool). Fused compare+any on the VPU, chunked over Q to
    bound the (B, L, chunk) working set; the vmapped binary search
    serializes on TPU (see sample_unrated's measured notes).
    """
    B, L = sorted_items.shape
    if queries.ndim == 1:
        q = jnp.broadcast_to(queries[None, :], (B, queries.shape[0]))
    else:
        q = queries
    Q = q.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    # padding slots -> -1 so they can never match a valid (>= 0) query
    rows = jnp.where(pos < lengths[:, None], sorted_items, -1)
    chunk = 32
    if Q <= chunk:
        return jnp.any(rows[:, :, None] == q[:, None, :], axis=1)
    Q_pad = -(-Q // chunk) * chunk
    q_p = jnp.pad(q, ((0, 0), (0, Q_pad - Q)), constant_values=-1)
    q_c = jnp.moveaxis(q_p.reshape(B, Q_pad // chunk, chunk), 1, 0)

    def body(_, qc):
        return None, jnp.any(rows[:, :, None] == qc[:, None, :], axis=1)

    _, hit = jax.lax.scan(body, None, q_c)
    return jnp.moveaxis(hit, 0, 1).reshape(B, Q_pad)[:, :Q]

"""Pallas kernels vs XLA reference paths (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdae_tpu.ops.pallas_kernels import (
    adagrad_update, decode_scores, streaming_topk_scores,
)
from cdae_tpu.ops.topk import topk_unrated


@pytest.fixture(scope="module")
def rng_np():
    return np.random.default_rng(11)


def test_decode_scores_matches_xla(rng_np):
    B, D, I = 48, 20, 700  # deliberately unaligned
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    got = decode_scores(z, W, bp, tile_b=16, tile_i=256)
    ref = z @ W.T + bp[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_adagrad_update_matches_reference(rng_np):
    N, D = 300, 17
    p = rng_np.standard_normal((N, D)).astype(np.float32)
    a = np.abs(rng_np.standard_normal((N, D))).astype(np.float32) + 1e-4
    g = rng_np.standard_normal((N, D)).astype(np.float32)
    lr, beta = 0.1, 1.0
    a_ref = a + g * g
    p_ref = p - lr * g / (beta + np.sqrt(a_ref))
    p_new, a_new = adagrad_update(
        jnp.asarray(p), jnp.asarray(a), jnp.asarray(g), lr, beta, tile=128
    )
    np.testing.assert_allclose(np.asarray(a_new), a_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_new), p_ref, rtol=1e-5, atol=1e-6)


def test_adagrad_update_1d(rng_np):
    N = 97
    p = rng_np.standard_normal(N).astype(np.float32)
    a = np.full(N, 1e-4, np.float32)
    g = rng_np.standard_normal(N).astype(np.float32)
    p_new, a_new = adagrad_update(
        jnp.asarray(p), jnp.asarray(a), jnp.asarray(g), 0.05, 0.0
    )
    assert p_new.shape == (N,)
    a_ref = a + g * g
    np.testing.assert_allclose(
        np.asarray(p_new), p - 0.05 * g / np.sqrt(a_ref), rtol=1e-5, atol=1e-6
    )


def test_streaming_topk_matches_dense(rng_np):
    B, D, I, L, K = 12, 16, 1000, 8, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    rated = np.sort(
        rng_np.choice(I, size=(B, L), replace=False), axis=1
    ).astype(np.int32)
    scores = z @ W.T + bp[None, :]
    ids_ref, vals_ref = topk_unrated(scores, jnp.asarray(rated), K)
    ids, vals = streaming_topk_scores(z, W, bp, jnp.asarray(rated),
                                      k=K, block=256)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_fused_topk_matches_dense(rng_np):
    from cdae_tpu.ops.pallas_kernels import fused_topk_scores

    B, D, I, L, K = 8, 16, 300, 6, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    rated = np.zeros((B, I), dtype=np.int8)
    rated_list = np.sort(rng_np.choice(I, size=(B, L), replace=False), axis=1)
    for b in range(B):
        rated[b, rated_list[b]] = 1
    scores = z @ W.T + bp[None, :]
    ids_ref, vals_ref = topk_unrated(
        scores, jnp.asarray(rated_list.astype(np.int32)), K
    )
    ids, vals = fused_topk_scores(z, W, bp, jnp.asarray(rated), k=K, block=64)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))

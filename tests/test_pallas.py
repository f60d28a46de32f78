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


def test_fused_topk_csr_matches_dense(rng_np):
    """CSR-fused rated exclusion (per-block compact query lists, no (B, I)
    mask) returns exactly the dense-path ids/vals for both merges and
    several w, incl. a non-divisible catalog (ref behavior: skip rated
    during the full-catalog scan, cdae.hpp:176-186)."""
    from cdae_tpu.ops.pallas_kernels import fused_topk_scores_csr

    B, D, I, K = 12, 16, 333, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    L = 24
    rated = np.full((B, L), I, np.int32)
    for b in range(B):
        n = int(rng_np.integers(1, L))
        rated[b, :n] = np.sort(rng_np.choice(I, n, replace=False))
    rated = jnp.asarray(rated)
    scores = z @ W.T + bp[None, :]
    ids_ref, vals_ref = topk_unrated(scores, rated, K)
    for merge in ("argmax", "grouped"):
        for w in (8, 32):
            ids, vals = fused_topk_scores_csr(
                z, W, bp, rated, k=K, block=128, w=w, merge=merge)
            np.testing.assert_array_equal(
                np.asarray(ids), np.asarray(ids_ref),
                err_msg=f"{merge}/w={w}")
            np.testing.assert_allclose(
                np.asarray(vals), np.asarray(vals_ref), rtol=1e-5,
                atol=1e-5)


def test_fused_topk_csr_overflow_fallback(rng_np):
    """A row whose rated ids cluster past w in one catalog block trips the
    overflow cond -> the streaming fallback keeps the result EXACT; with
    fallback='none' the same batch is (deliberately) wrong — proving the
    guard is what provides exactness."""
    from cdae_tpu.ops.pallas_kernels import (
        csr_block_queries, fused_topk_scores_csr)

    B, D, I, K = 6, 8, 400, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    L = 32
    rated = np.full((B, L), I, np.int32)
    rated[0, :30] = np.arange(50, 80)  # 30 contiguous ids in one block
    for b in range(1, B):
        rated[b, :4] = np.sort(rng_np.choice(I, 4, replace=False))
    rated = jnp.asarray(rated)
    _, overflow = csr_block_queries(rated, I, 128, 8)
    assert bool(overflow)
    scores = z @ W.T + bp[None, :]
    ids_ref, _ = topk_unrated(scores, rated, K)
    ids, _ = fused_topk_scores_csr(z, W, bp, rated, k=K, block=128, w=8)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    # sanity: the guard is load-bearing for this batch
    ids_bad, _ = fused_topk_scores_csr(z, W, bp, rated, k=K, block=128,
                                       w=8, fallback="none")
    rated0 = set(np.asarray(rated)[0].tolist())
    assert any(int(i) in rated0 for i in np.asarray(ids_bad)[0])


def test_fused_topk_csr_chunked_large_batch(rng_np):
    """Batches above the 256-row kernel chunk split inside one jit and
    concatenate exactly (incl. a non-multiple remainder chunk)."""
    import cdae_tpu.ops.pallas_kernels as pk

    B, D, I, K = 300, 8, 400, 10  # 256 + remainder 44
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    L = 16
    rated = np.full((B, L), I, np.int32)
    for b in range(B):
        n = int(rng_np.integers(1, L))
        rated[b, :n] = np.sort(rng_np.choice(I, n, replace=False))
    rated = jnp.asarray(rated)
    scores = z @ W.T + bp[None, :]
    ids_ref, vals_ref = topk_unrated(scores, rated, K)
    blk = pk.fused_topk_csr_plan(B, K, block=128)
    qd, w_used, ov = pk.csr_block_queries_np(np.asarray(rated), I, blk, None)
    assert not ov
    ids, vals = pk.fused_topk_scores_csr(
        z, W, bp, rated, k=K, block=128, w=w_used, qd=jnp.asarray(qd))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref),
                               rtol=1e-5, atol=1e-5)


def test_csr_block_queries_pads_and_counts(rng_np):
    """Pad slots (>= num_items) never inflate the last block's count; local
    ids and slot validity match a direct per-block enumeration."""
    from cdae_tpu.ops.pallas_kernels import csr_block_queries

    I, block, w = 200, 64, 4
    rated = jnp.asarray(np.array([
        [3, 64, 65, 199, I, I],        # pads at the tail
        [0, 1, 2, 3, 63, 66],          # 5 in block 0 -> overflow at w=4
    ], np.int32))
    qd, overflow = csr_block_queries(rated, I, block, w)
    assert bool(overflow)
    nblk = -(-I // block)
    qd = np.asarray(qd).reshape(2, nblk, w)
    # row 0: block0 {3}, block1 {0, 1}, block3 {7} (199-192)
    assert qd[0, 0, 0] == 3 and (qd[0, 0, 1:] == -1).all()
    assert list(qd[0, 1, :2]) == [0, 1] and (qd[0, 1, 2:] == -1).all()
    assert qd[0, 3, 0] == 199 - 3 * block
    # row 1: block 0 overflows w -> first w listed, flag covers the rest
    assert list(qd[1, 0]) == [0, 1, 2, 3]


def test_warp_violator_select_counts_and_membership(rng_np):
    """Kernel nviol matches the XLA count exactly; every selected j is a
    violator; selection is deterministic per seed."""
    from cdae_tpu.ops.pallas_kernels import warp_violator_select

    B, I, D, nn = 21, 333, 7, 4
    uv = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    iv = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    ib = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    mask = jnp.asarray(rng_np.integers(0, 2, size=(B, I)).astype(np.int8))
    thr = jnp.asarray((rng_np.standard_normal(B) * 2).astype(np.float32))
    nviol, j = warp_violator_select(jnp.int32(42), uv, iv, ib, thr, mask,
                                    nn, block_b=8, block_i=128)
    scores = np.asarray(uv @ iv.T + ib[None, :])
    viol = (scores > np.asarray(thr)[:, None]) & (np.asarray(mask) == 0)
    np.testing.assert_array_equal(np.asarray(nviol), viol.sum(1))
    jn = np.asarray(j)
    for b in range(B):
        if viol[b].any():
            assert all(viol[b, jn[b, k]] for k in range(nn))
    nv2, j2 = warp_violator_select(jnp.int32(42), uv, iv, ib, thr, mask,
                                   nn, block_b=8, block_i=128)
    np.testing.assert_array_equal(jn, np.asarray(j2))


def test_warp_violator_select_block_invariance(rng_np):
    """Counts AND selections are independent of the tiling (the noise is a
    hash of global coordinates, not of grid position)."""
    from cdae_tpu.ops.pallas_kernels import warp_violator_select

    B, I, D, nn = 9, 200, 5, 3
    uv = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    iv = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    ib = jnp.zeros((I,), jnp.float32)
    mask = jnp.zeros((B, I), jnp.int8)
    thr = jnp.zeros((B,), jnp.float32)
    n1, j1 = warp_violator_select(jnp.int32(7), uv, iv, ib, thr, mask, nn,
                                  block_b=8, block_i=128)
    n2, j2 = warp_violator_select(jnp.int32(7), uv, iv, ib, thr, mask, nn,
                                  block_b=4, block_i=256)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))


def test_warp_dense_path_kernel_trains(movielens_path):
    """WARP with the fused violator kernel reaches the same recall ballpark
    as the XLA dense path (distribution-identical selection, different RNG
    stream)."""
    from cdae_tpu.data.dataset import Interactions, movielens_line_parser
    from cdae_tpu.models.mf import WARP, MFConfig
    from cdae_tpu.solver.solver import Solver

    data = Interactions.from_text(movielens_path, movielens_line_parser)
    train, test = data.split_by_user(0.2, seed=20141119)
    res = {}
    for use_pallas, label in ((False, "xla"), (True, "kernel")):
        model = WARP(MFConfig(num_dim=8, batch_size=128, num_neg=3,
                              num_tries=32, use_pallas=use_pallas,
                              dense_mode=True))
        solver = Solver(model, max_iteration=8, eval_iterations=8,
                        seed=3, verbose=False)
        solver.train(train, test, ["TOPN"])
        res[label] = solver.history[-1]["R@10"]
    assert res["kernel"] > 0.5 * res["xla"], res
    assert abs(res["kernel"] - res["xla"]) < 0.12, res


def test_gather_rows_mxu_exact(rng_np):
    from cdae_tpu.ops.pallas_kernels import gather_rows_mxu

    N, D, P = 777, 13, 301
    t = jnp.asarray(rng_np.standard_normal((N, D)).astype(np.float32))
    ix = jnp.asarray(rng_np.integers(0, N, P).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(gather_rows_mxu(t, ix, block_p=128, block_q=128)),
        np.asarray(t)[np.asarray(ix)],
    )
    # out-of-catalog rows come back zero (sentinel handling upstream)
    ix2 = ix.at[0].set(N + 3)
    assert np.all(np.asarray(
        gather_rows_mxu(t, ix2, block_p=128, block_q=128))[0] == 0)


def test_bpr_step_mxu_gather_near_bitwise(movielens_path):
    """The packed MXU gather is exact per row, so a BPR step with
    gather_mode='mxu' matches the native-gather step to float-fusion
    noise (XLA fuses the downstream pair math differently around the
    kernel boundary — observed max |delta| 5e-10)."""
    from cdae_tpu.data.dataset import Interactions, movielens_line_parser
    from cdae_tpu.models.mf import BPR, MFConfig

    data = Interactions.from_text(movielens_path, movielens_line_parser)
    states = {}
    for gm in ("native", "mxu"):
        model = BPR(MFConfig(num_dim=8, batch_size=64, num_neg=3,
                             gather_mode=gm))
        state = model.reset(data, seed=7)
        state = model.train_one_iteration(state, jax.random.PRNGKey(1))
        states[gm] = state.params
    for k in states["native"]:
        np.testing.assert_allclose(np.asarray(states["native"][k]),
                                   np.asarray(states["mxu"][k]),
                                   rtol=1e-6, atol=1e-8, err_msg=k)


def test_warp_mshift_selection_uniformity():
    """Pooled-slot chi-square bound on the default ("mshift") selection
    noise stream (ADVICE r3): with every item a violator, each (row, slot)
    selection must be uniform over the catalog. The broken single-base
    multiply-shift variant measured pooled chi2 350-411 at dof 255 (see
    the kernel comment); the shipped 2-base family measures ~282 and the
    full per-slot murmur hash ~259 — the 330 bound separates them. A
    regression in the mixing constants moves this statistic far past the
    bound (deterministic: fixed seeds)."""
    from cdae_tpu.ops.pallas_kernels import warp_violator_select

    B, I, D, nn = 64, 256, 4, 4
    uv = jnp.ones((B, D), jnp.float32)
    iv = jnp.ones((I, D), jnp.float32)
    ib = jnp.zeros((I,), jnp.float32)
    mask = jnp.zeros((B, I), jnp.int8)
    thr = jnp.full((B,), -1e9, jnp.float32)  # everything violates
    counts = np.zeros(I)
    per_slot = np.zeros((nn, I))
    for s in range(8):
        _, j = warp_violator_select(
            jnp.int32(1000 + s * 7919), uv, iv, ib, thr, mask, nn,
            block_b=32, block_i=128, noise="mshift",
        )
        jn = np.asarray(j)
        counts += np.bincount(jn.ravel(), minlength=I)
        per_slot += np.stack(
            [np.bincount(jn[:, k], minlength=I) for k in range(nn)]
        )
    E = counts.sum() / I
    chi2 = ((counts - E) ** 2 / E).sum()
    assert chi2 < 330.0, chi2  # dof 255: good ~282, broken variant >=350
    # per-slot coarse uniformity (32 bins, dof 31): catches a single bad
    # slot multiplier that the pooled statistic could average away
    for k in range(nn):
        c = per_slot[k].reshape(32, -1).sum(1)
        Ek = c.sum() / 32
        assert ((c - Ek) ** 2 / Ek).sum() < 65.0, k


def test_fused_topk_block_clamp():
    """VMEM-frame clamp for fused_topk_scores: must keep the measured-OK
    points and exclude the measured-OOM points from the round-4 TPU sweep
    at a 1M-item catalog (B, block): OK (256, 2048), (512, 1024); OOM
    (256, 4096), (512, 2048), (1024, 1024)."""
    from cdae_tpu.ops.pallas_kernels import _fused_topk_block

    k = 10
    # measured-OK points survive a same-size request
    assert _fused_topk_block(256, 2048, k) == 2048
    assert _fused_topk_block(512, 1024, k) == 1024
    # measured-OOM points get clamped strictly below the failing block
    assert _fused_topk_block(256, 4096, k) < 4096
    assert _fused_topk_block(512, 2048, k) < 2048
    assert _fused_topk_block(1024, 1024, k) < 1024
    # monotone non-increasing in B, never below the 128-lane tile
    prev = None
    for B in (8, 64, 256, 1024, 8192):
        blk = _fused_topk_block(B, 1 << 20, k)
        assert blk >= 128
        if prev is not None:
            assert blk <= prev
        prev = blk


def test_fused_topk_grouped_matches_argmax(rng_np):
    """The grouped-merge kernel must reproduce the plain argmax merge (and
    the dense reference) exactly — ids included — across unaligned
    catalogs, rated masks, and k values."""
    from cdae_tpu.ops.pallas_kernels import fused_topk_scores

    for B, D, I, L, K in ((8, 16, 300, 6, 10), (5, 9, 1000, 40, 3),
                          (16, 32, 517, 2, 7)):
        z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
        W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
        bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
        rated = np.zeros((B, I), dtype=np.int8)
        rl = np.sort(rng_np.choice(I, size=(B, L), replace=False), axis=1)
        for b in range(B):
            rated[b, rl[b]] = 1
        scores = z @ W.T + bp[None, :]
        ids_ref, vals_ref = topk_unrated(
            scores, jnp.asarray(rl.astype(np.int32)), K
        )
        ids_g, vals_g = fused_topk_scores(
            z, W, bp, jnp.asarray(rated), k=K, block=256, merge="grouped"
        )
        np.testing.assert_allclose(np.asarray(vals_g), np.asarray(vals_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_ref))


def test_fused_topk_grouped_fewer_than_k_candidates(rng_np):
    """Rows where fewer than k items are unrated: the tail must be the NEG
    sentinel in both merges, with matching ids."""
    from cdae_tpu.ops.pallas_kernels import fused_topk_scores

    B, D, I, K = 4, 8, 140, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    rated = np.ones((B, I), dtype=np.int8)
    rated[0, :5] = 0   # 5 unrated < k
    rated[1, :] = 0    # everything unrated
    # rows 2-3: nothing unrated at all
    ids_a, vals_a = fused_topk_scores(z, W, bp, jnp.asarray(rated),
                                      k=K, block=128, merge="argmax")
    ids_g, vals_g = fused_topk_scores(z, W, bp, jnp.asarray(rated),
                                      k=K, block=128, merge="grouped")
    np.testing.assert_array_equal(np.asarray(vals_g), np.asarray(vals_a))
    np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_a))


def test_fused_topk_small_block_unaligned(rng_np):
    """Unaligned catalog + small block exercises the padded tail path."""
    from cdae_tpu.ops.pallas_kernels import fused_topk_scores

    B, D, I, L, K = 8, 16, 1100, 9, 10
    z = jnp.asarray(rng_np.standard_normal((B, D)).astype(np.float32))
    W = jnp.asarray(rng_np.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng_np.standard_normal(I).astype(np.float32))
    rated = np.zeros((B, I), dtype=np.int8)
    rl = np.sort(rng_np.choice(I, size=(B, L), replace=False), axis=1)
    for b in range(B):
        rated[b, rl[b]] = 1
    scores = z @ W.T + bp[None, :]
    ids_ref, vals_ref = topk_unrated(
        scores, jnp.asarray(rl.astype(np.int32)), K
    )
    ids, vals = fused_topk_scores(z, W, bp, jnp.asarray(rated),
                                  k=K, block=128)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))

#!/usr/bin/env python
"""Granular timing of the WARP dense-violator path on TPU — breaks the
step into its pipeline stages (score matmul / violation mask+count /
cumsum / bisection rank-select / pair grads+scatter / adagrad) so the
next optimization targets the measured bottleneck, not a guess.

Every dispatch is small and followed by a forced readback (CLAUDE.md:
block_until_ready lies over the axon tunnel).

usage: python scripts/diag_warp.py [--batch 4096] [--platform cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=6040)
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--deg", type=int, default=160)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--scatter", default="factored")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from cdae_tpu.models import mf as mf_mod

    sys.path.insert(0, "scripts")
    from bench_zoo import synthetic

    log(f"devices: {jax.devices()}")
    data = synthetic(args.users, args.items, args.deg)

    model = mf_mod.WARP(mf_mod.MFConfig(
        num_dim=args.dim, batch_size=args.batch, scatter_mode=args.scatter,
        loss="HINGE", beta=0.0, lambda_=0.1,
    ))
    state = model.reset(data, seed=0)
    users, items, ratings, pad_items, pad_lengths = model._device_data(state)
    extras = model._epoch_extras(state)
    assert extras, "dense path requires the rated mask"
    rated_mask = extras[0]

    def readback(x):
        return float(jnp.sum(x)) if hasattr(x, "shape") else x

    B = args.batch
    I = args.items
    nn = max(model.cfg.num_neg, 1)
    key = jax.random.PRNGKey(0)
    u = users[:B]; i = items[:B]
    w = jnp.ones((B,), jnp.float32)
    params = state.params

    def time_fn(name, fn, *a, reps=20):
        f = jax.jit(fn)
        out = f(*a)
        readback(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        readback(jax.tree_util.tree_leaves(out)[0])
        log(f"{name}: {(time.perf_counter()-t0)/reps*1000:.3f} ms")
        return out

    # stage 1: score row matmul (B, I)
    def f_scores(p, u):
        return p["uv"][u] @ p["iv"].T + p["ib"][None, :]

    scores = time_fn("scores (B,I) matmul", f_scores, params, u)

    # stage 2: violation mask + count
    def f_viol(scores, u, i, mask):
        yui = jnp.take_along_axis(scores, i[:, None], axis=1)[:, 0]
        viol = (scores > (yui[:, None] - 1.0)) & (mask[u] == 0)
        return viol, jnp.sum(viol.astype(jnp.int32), axis=1)

    viol, nviol = time_fn("viol mask + nviol", f_viol, scores, u, i,
                          rated_mask)

    # stage 2b: the mask gather alone (B, I) int8
    time_fn("mask_rows gather", lambda m, u: m[u] == 0, rated_mask, u)

    # stage 3: cumsum (B, I) int32
    cumviol = time_fn("cumviol int32 cumsum",
                      lambda v: jnp.cumsum(v.astype(jnp.int32), axis=1), viol)
    time_fn("cumviol int16 cumsum",
            lambda v: jnp.cumsum(v.astype(jnp.int16), axis=1), viol)

    # stage 4: bisection rank-select
    v = jax.random.randint(key, (B, nn), 0, jnp.maximum(nviol, 1)[:, None])
    time_fn("bisection rank-select", mf_mod._rank_select_first_gt, cumviol, v)

    # stage 5: pair grads + scatter
    j = jnp.clip(mf_mod._rank_select_first_gt(cumviol, v), 0, I - 1)
    pair_w = jnp.tile(w[:, None], (1, nn))

    def f_grads(p, u, i, j, pw):
        return mf_mod._pairwise_grads(p, u, i, j, pw, model.cfg, model.loss,
                                      rank_weight=pw, update_bias=False)

    grads = time_fn("pair grads + scatter", f_grads, params, u, i, j, pair_w)

    # stage 6: adagrad apply
    def f_ada(p, g):
        return mf_mod._adagrad_apply(p, g, model.cfg)

    time_fn("adagrad table apply", f_ada, params,
            {k: v for k, v in grads.items()})

    # whole step for reference
    def f_step(p, u, i, w, lengths, key, mask):
        return mf_mod.WARP._dense_path(p, u, i, w, lengths, key, mask[u],
                                       cfg=model.cfg, loss=model.loss)

    time_fn("WHOLE dense step", f_step, params, u, i, w, pad_lengths[u],
            key, rated_mask)
    log("done")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Granular timing of the BPR train path on TPU — finds where the fused
epoch spends its time (compile vs sample vs scatter) with every device
dispatch kept small so a hang can be localized and nothing crashes the
axon worker (>60s device programs do; see CLAUDE.md).

usage: python scripts/diag_bpr.py [--batch 1024] [--scatter matmul]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=6040)
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--deg", type=int, default=160)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--scatter", default="matmul")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax.numpy as jnp

    from cdae_tpu.models import mf as mf_mod
    from cdae_tpu.ops import sampling

    sys.path.insert(0, "scripts")
    from bench_zoo import synthetic

    log(f"devices: {jax.devices()}")
    data = synthetic(args.users, args.items, args.deg)
    log(f"data: {data.num_users}u x {data.num_items}i nnz={len(data.users)}")

    model = mf_mod.BPR(mf_mod.MFConfig(
        num_dim=args.dim, batch_size=args.batch, loss="LOG",
        scatter_mode=args.scatter,
    ))
    state = model.reset(data, seed=0)
    users, items, ratings, pad_items, pad_lengths = model._device_data(state)
    log(f"padded rated table: {pad_items.shape}")

    def readback(x):
        return float(jnp.sum(x)) if hasattr(x, "shape") else x

    B = args.batch
    key = jax.random.PRNGKey(0)
    u = users[:B]; i = items[:B]; r = ratings[:B]
    w = jnp.ones((B,), jnp.float32)

    # phase 1: sample_unrated alone
    t0 = time.perf_counter()
    f_samp = jax.jit(lambda k, rated, lens: sampling.sample_unrated(
        k, rated, lens, args.items, model.cfg.num_neg))
    neg = f_samp(key, pad_items[u], pad_lengths[u])
    readback(neg)
    log(f"sample_unrated compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    for _ in range(10):
        neg = f_samp(jax.random.fold_in(key, 1), pad_items[u], pad_lengths[u])
    readback(neg)
    log(f"sample_unrated 10x steady: {(time.perf_counter()-t0)*100:.1f} ms/call")

    # phase 1b: step components (sampling / pair grads / scatter / adagrad)
    from cdae_tpu.ops.scatter import scatter_add_rows

    nn = max(model.cfg.num_neg, 1)
    negs = f_samp(key, pad_items[u], pad_lengths[u])

    def time_fn(name, fn, *a, reps=10):
        out = fn(*a)
        readback(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        readback(jax.tree_util.tree_leaves(out)[0])
        log(f"{name}: {(time.perf_counter()-t0)/reps*1000:.2f} ms")

    pair_w = jnp.ones((B, nn), jnp.float32)
    params0 = state.params

    def grads_only(p, u, i, j, w):
        return mf_mod._pairwise_grads(p, u, i, j, w, model.cfg, model.loss)

    time_fn("pairwise grads+scatter", jax.jit(grads_only),
            params0, u, i, negs % args.items, pair_w)

    P = B * (nn + 1)
    ids = jnp.concatenate([i, (negs % args.items).reshape(-1)])
    vals11 = jnp.ones((P, args.dim + 1), jnp.float32)

    def scat_only(ids, vals):
        return scatter_add_rows(
            jnp.zeros((args.items, args.dim + 1)), ids, vals,
            mode=args.scatter)

    time_fn(f"scatter_add_rows[{args.scatter}] P={P}",
            jax.jit(scat_only), ids, vals11)

    def adagrad_only(p):
        g = {k: v * 1e-3 for k, v in p.items() if not k.endswith("_ag")}
        return mf_mod._adagrad_apply(dict(p), g, model.cfg)

    time_fn("adagrad table apply", jax.jit(adagrad_only), params0)

    # phase 2: one train step
    step = model._jit_step
    t0 = time.perf_counter()
    params = {k: v.copy() for k, v in state.params.items()}
    params = step(params, u, i, r, w, pad_items[u], pad_lengths[u], key)
    readback(params["iv"])
    log(f"single step compile+run: {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    n = 20
    for s in range(n):
        params = step(params, u, i, r, w, pad_items[u], pad_lengths[u],
                      jax.random.fold_in(key, s))
    readback(params["iv"])
    dt = time.perf_counter() - t0
    log(f"single step steady: {dt/n*1000:.1f} ms/step "
        f"-> est {args.users/( dt/n*(len(data.users)/B)):,.0f} users/s/epoch")

    # phase 3: small fused scans of increasing length (each < 60s device time)
    for nb in (8, 64):
        ep = model._build_epoch(nb)
        sel = slice(0, nb * B)
        t0 = time.perf_counter()
        p2 = ep({k: v.copy() for k, v in state.params.items()},
                users[sel], items[sel], ratings[sel], pad_items, pad_lengths,
                key)
        readback(p2["iv"])
        log(f"fused scan x{nb}: compile+run {time.perf_counter()-t0:.2f}s")
        t0 = time.perf_counter()
        p2 = ep(p2, users[sel], items[sel], ratings[sel], pad_items,
                pad_lengths, jax.random.fold_in(key, 9))
        readback(p2["iv"])
        dt = time.perf_counter() - t0
        log(f"fused scan x{nb}: steady {dt:.2f}s = {dt/nb*1000:.1f} ms/batch")

    log("done")


if __name__ == "__main__":
    main()

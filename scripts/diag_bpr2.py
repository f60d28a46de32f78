#!/usr/bin/env python
"""In-scan attribution of the BPR fused-epoch step cost.

Standalone per-op dispatches over the axon tunnel carry a ~1.5 ms floor,
so they cannot attribute a ~1 ms step. Instead: time x64 fused scans of
step VARIANTS with one component knocked out each, on the real workload;
the deltas vs the full step are the in-scan component costs.

variants:
  full        — the production step
  nosample    — negatives replaced by a cheap deterministic formula
  noscatter   — pair contribs computed, but aggregated with segment-free
                dense means (no row aggregation into (I, C)/(U, D))
  noadagrad   — plain SGD apply (no accumulator update / rsqrt)
  nomath      — constant contribution rows (skips gathers + pair math,
                keeps the aggregation + adagrad)

usage: python scripts/diag_bpr2.py [--batch 4096] [--platform cpu]
"""
import argparse
import functools
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--scatter", default="factored")
    ap.add_argument("--nb", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from cdae_tpu.models import mf as mf_mod
    from cdae_tpu.ops import sampling
    from cdae_tpu.ops.scatter import scatter_add_rows

    sys.path.insert(0, "scripts")
    from bench_zoo import synthetic

    log(f"devices: {jax.devices()}")
    data = synthetic(args.users, args.items, args.deg)
    model = mf_mod.BPR(mf_mod.MFConfig(
        num_dim=args.dim, batch_size=args.batch, loss="LOG",
        scatter_mode=args.scatter,
    ))
    cfg, loss = model.cfg, model.loss
    state = model.reset(data, seed=0)
    users, items, ratings, pad_items, pad_lengths = model._device_data(state)
    I = args.items
    nn = max(cfg.num_neg, 1)
    B = args.batch
    nb = args.nb

    def make_step(variant):
        def step(params, u, i, w, rated, lengths, key):
            if variant == "nosample":
                neg = (u[:, None] * 7919 + jnp.arange(nn)[None, :] * 104729
                       ) % I
                pair_w = w[:, None] * jnp.ones((1, nn), w.dtype)
            else:
                neg_raw = sampling.sample_unrated(key, rated, lengths, I, nn)
                pair_w = w[:, None] * (neg_raw < I).astype(w.dtype)
                neg = jnp.clip(neg_raw, 0, I - 1)
            if variant == "nomath":
                d_uv_rows = jnp.full((B, cfg.num_dim), 1e-6, jnp.float32)
                pos_vals = jnp.full((B, cfg.num_dim + 1), 1e-6, jnp.float32)
                neg_vals = jnp.full((B, nn, cfg.num_dim + 1), 1e-6,
                                    jnp.float32)
                with_bias = True
            else:
                d_uv_rows, pos_vals, neg_vals, with_bias = \
                    mf_mod._pair_contribs(
                        params["uv"][u], params["iv"][i], params["iv"][neg],
                        params["ib"][i], params["ib"][neg], pair_w, cfg,
                        loss)
            D = cfg.num_dim
            if variant == "noscatter":
                # keep the math, drop the row aggregation: rank-1 dense
                # outer products stand in (same output shapes, no scatter)
                mu = jnp.mean(d_uv_rows, 0)
                mi = jnp.mean(pos_vals, 0) + jnp.mean(
                    neg_vals.reshape(-1, pos_vals.shape[-1]), 0)
                grads = {
                    "uv": jnp.ones((params["uv"].shape[0], 1)) * mu[None, :],
                    "iv": jnp.ones((I, 1)) * mi[None, :D],
                    "ib": jnp.full((I,), mi[D]),
                }
            else:
                C = pos_vals.shape[-1]
                acc_idx = jnp.concatenate([i, neg.reshape(-1)])
                acc_vals = jnp.concatenate(
                    [pos_vals, neg_vals.reshape(-1, C)])
                acc = scatter_add_rows(jnp.zeros((I, C), jnp.float32),
                                       acc_idx, acc_vals,
                                       mode=cfg.scatter_mode)
                grads = {
                    "uv": scatter_add_rows(jnp.zeros_like(params["uv"]), u,
                                           d_uv_rows, mode=cfg.scatter_mode),
                    "iv": acc[:, :D],
                    "ib": acc[:, D],
                }
            if variant == "noadagrad":
                out = dict(params)
                for name, g in grads.items():
                    out[name] = params[name] - cfg.learn_rate * g
                return out
            return mf_mod._adagrad_apply(params, grads, cfg)
        return step

    key = jax.random.PRNGKey(0)
    sel = np.random.default_rng(0).integers(0, len(data.users),
                                            (nb, B)).astype(np.int32)
    sel = jnp.asarray(sel)

    for variant in ("full", "nosample", "nomath", "noscatter", "noadagrad"):
        step = make_step(variant)

        def epoch(params, sel, key):
            def body(carry, s):
                params, key = carry
                key, sub = jax.random.split(key)
                u = users[s]
                params = step(params, u, items[s], jnp.ones((B,),
                              jnp.float32), pad_items[u], pad_lengths[u],
                              sub)
                return (params, key), None
            (params, _), _ = jax.lax.scan(body, (params, key), sel)
            return params

        f = jax.jit(epoch)
        p = {k: v.copy() for k, v in state.params.items()}
        t0 = time.perf_counter()
        p = f(p, sel, key)
        float(jnp.sum(p["iv"]))
        log(f"{variant}: compile+run {time.perf_counter()-t0:.2f}s")
        t0 = time.perf_counter()
        p = f(p, sel, key)
        float(jnp.sum(p["iv"]))
        dt = time.perf_counter() - t0
        log(f"{variant}: steady {dt/nb*1000:.3f} ms/step")


if __name__ == "__main__":
    main()

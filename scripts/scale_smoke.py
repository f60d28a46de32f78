#!/usr/bin/env python
"""Scale smoke toward BASELINE.json config 5 (10M users / 1M items).

Single-chip slice of the sharded design: CSR streaming batches (no padded
matrix), sparse train steps over the 1M-item table, and streaming blockwise
top-k eval (no (B, I) score materialization). Runs a PARTIAL epoch (the full
10M-user epoch belongs on a pod slice) and prints measured rates.

Usage: python scripts/scale_smoke.py [--users 10000000 --items 1000000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cdae_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()  # persistent XLA cache (CDAE_COMPILE_CACHE=off to skip)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=10_000_000)
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--degree", type=int, default=50)
    ap.add_argument("--dim", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=4096,
                    help="MAX batch size; with --slots the per-bucket "
                         "size adapts to the token budget")
    ap.add_argument("--train_batches", type=int, default=30)
    ap.add_argument("--slots", type=int, default=262144,
                    help="token-budget batching: per-bucket batch size "
                         "fits B*L to this budget (0 = fixed batch_size; "
                         "fixed bs4096 CRASHES on the L=1024 bucket)")
    ap.add_argument("--eval_batches", type=int, default=3)
    ap.add_argument("--neg_pool", type=int, default=0,
                    help="pooled negatives (CDAEConfig.neg_pool); 0 = exact")
    ap.add_argument("--fast_rng", action="store_true",
                    help="TPU hardware PRNG for corruption + pool "
                         "selection draws (CDAEConfig.fast_rng)")
    ap.add_argument("--row_update", default="auto",
                    help="CDAEConfig.row_update: auto|true|false "
                         "(touched-rows delta AdaGrad; auto = on past "
                         "~128k items)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import synthetic_interactions
    from cdae_tpu.models.base import (
        count_user_batches_csr,
        iter_user_batches_csr,
    )
    from cdae_tpu.models.cdae import CDAE, CDAEConfig

    t0 = time.perf_counter()
    data = synthetic_interactions(args.users, args.items, args.degree)
    print(f"# generated {data} in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    model = CDAE(CDAEConfig(
        num_dim=args.dim, loss="SQUARE", corruption_ratio=0.5, scaled=True,
        num_neg=5, user_factor=True, batch_size=args.batch_size,
        cache_device_batches=False, use_pallas=False,
        neg_pool=args.neg_pool or None,
        fast_rng=args.fast_rng,
        row_update=(None if args.row_update == "auto"
                    else args.row_update.lower() in ("1", "true", "yes")),
    ))
    t0 = time.perf_counter()
    state = model.reset(data, seed=0)
    print(f"# reset in {time.perf_counter()-t0:.0f}s "
          f"(streaming={state.padded is None}, "
          f"dense={'dense_R' in state.aux})", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    params = state.params
    # STRATIFIED batch sample: iter_user_batches_csr sorts users by row
    # length, so "the first N batches" are the dataset's SHORTEST users —
    # a bias that grows with user count (measured: the head batches of the
    # 10M-user table trained 2.4x faster than the same uid count of the
    # 1M-user table; round-3's head-sampled numbers were inflated the same
    # way). Taking every (total/N)-th batch across the sorted order makes
    # the timed mix match the true epoch mix of length buckets.
    total_b = count_user_batches_csr(
        state.aux["csr"], args.batch_size,
        slots_per_batch=args.slots or None,
    )
    n_timed = min(args.train_batches, total_b)
    keep = set(np.linspace(0, total_b - 1, n_timed).round().astype(int))
    batches = [
        tuple(jnp.asarray(x) for x in (b.uids, b.items, b.mask,
                                       b.lengths, b.weight))
        for i, b in enumerate(iter_user_batches_csr(
            state.aux["csr"], state.num_items, args.batch_size,
            slots_per_batch=args.slots or None,
        ))
        if i in keep
    ]
    shapes = sorted({tuple(b[1].shape) for b in batches})
    print(f"# {len(batches)} timed batches spread over {total_b} "
          f"(length-stratified incl. tail), shapes {shapes}",
          file=sys.stderr)
    # warm pass: length-bucketed batches have MANY distinct (B, L) shapes
    # and each one compiles its own program (~seconds over the tunnel) —
    # "first batch pays the compile" was wrong and this loop used to
    # measure mostly COMPILATION (measured 5.1k "users/s" where the
    # steady state is >100k). Real multi-epoch training amortizes the
    # per-bucket compiles exactly like this warm pass does.
    for d in batches:
        key, sub = jax.random.split(key)
        params = model._train_step(params, *d, sub)
    float(jnp.sum(params["W"]))
    done = int(sum(float(np.asarray(d[4]).sum()) for d in batches))
    t0 = time.perf_counter()
    for d in batches:
        key, sub = jax.random.split(key)
        params = model._train_step(params, *d, sub)
    float(jnp.sum(params["W"]))  # forced readback
    train_dt = time.perf_counter() - t0
    state.params = params
    print(f"# trained {done} users over the {args.items}-item table in "
          f"{train_dt:.1f}s (post-compile) = {done/max(train_dt,1e-9):,.0f} "
          f"users/s", file=sys.stderr)

    # streaming top-k eval over the full 1M-item catalog. Timing protocol
    # matches the training loop (and BASELINE.md's serving re-measures):
    # (1) host-side batch prep OUTSIDE the timed region, (2) a warm pass
    # compiles every distinct (B, L) program, (3) the timed loop queues all
    # batches with ONE forced readback at the end — per-batch readbacks pay
    # the ~30 ms tunnel RTT each and understated this line ~3 orders
    # (22 "users/s" printed where the kernel measures 14.9k; ROADMAP r3).
    # eval batch 1024: the fused-csr path chunks it into 256-row kernel
    # calls whose queued dispatches overlap — measured 18.8k users/s at
    # B=1024 vs 13.5k at B=256 (kernel-side, warmed device; round 5)
    B = 1024
    prep = []
    for j in range(args.eval_batches):
        uids = np.arange(j * B, (j + 1) * B)
        ri, rm = model._user_rows(state, uids)
        prep.append((jnp.asarray(uids), jnp.asarray(ri), jnp.asarray(rm)))

    # both lines measure the production CDAE.batch_topk program shapes
    # (one jitted program: hidden encode + mask + blockwise top-k —
    # eager per-op mask dispatch alone used to cost more than the fused
    # kernel: 3.3k vs 14.4k users/s, round 4).
    import functools

    from cdae_tpu.models.cdae import _batch_topk_impl

    modes = [("streaming", "streaming")]
    if jax.devices()[0].platform != "cpu":
        modes.append(("fused_csr", "fused-kernel"))
    for mode, label in modes:
        if mode == "fused_csr":
            # the production CDAE.batch_topk API: rated exclusion fused
            # in-kernel from HOST-built per-block query lists, cached per
            # batch (round 5 — no (B, I) mask build in the program at
            # all). The training model pins use_pallas=False (its step is
            # XLA-only); serving wants the kernel, so clone the config.
            import dataclasses as _dc

            fused_model = CDAE(_dc.replace(model.cfg, use_pallas=True))

            def ev_call(u, ri, rm):
                return fused_model.batch_topk(state, u, ri, rm, 10)
        else:
            ev = jax.jit(functools.partial(
                _batch_topk_impl, cfg=model.cfg, mode=mode, k=10,
                num_items=args.items,
            ))

            def ev_call(u, ri, rm):
                return ev(state.params, u, ri, rm, None)
        for u, ri, rm in prep:  # warm: compile each (B, L) bucket program
            ids = ev_call(u, ri, rm)
        float(jnp.sum(ids))
        if mode == "fused_csr":
            stats = [(e[3], e[2]) for e in fused_model._qd_cache.values()]
            print(f"#   qd cache (w, overflow) per batch: {stats}",
                  file=sys.stderr)
        t0 = time.perf_counter()
        for u, ri, rm in prep:
            ids = ev_call(u, ri, rm)
        float(jnp.sum(ids))  # one forced readback for the whole queue
        eval_dt = time.perf_counter() - t0
        n_eval = B * len(prep)
        print(f"# {label} top-10 over {args.items} items: "
              f"{n_eval/max(eval_dt,1e-9):,.0f} users/s "
              f"({n_eval} users in {eval_dt:.2f}s post-compile, "
              f"{n_eval*args.items/max(eval_dt,1e-9)/1e9:.1f}B scorings/s)",
              file=sys.stderr)
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

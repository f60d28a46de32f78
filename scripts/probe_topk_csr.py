"""Measure the CSR-fused top-k against the dense-mask kernel at the
huge-catalog serving shape (VERDICT r4 #1: close the 6.9k -> 14.4k gap).

Timing protocol: warm every program first, then reps with ONE forced
readback at the end of each rep burst (per-call timing over the axon
tunnel measures the RTT, not compute — CLAUDE.md).

Run from /root/repo on the real TPU:
  python scripts/probe_topk_csr.py --items 1000000 --batch 256
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def bench(fn, reps=5):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # forced readback (block_until_ready lies over the tunnel)
    float(jnp.sum(out[1] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=50)
    ap.add_argument("--lmax", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="dense,csr8,csr16,csr8g")
    args = ap.parse_args()

    from cdae_tpu.ops.pallas_kernels import (
        csr_block_queries, fused_topk_scores, fused_topk_scores_csr,
        _fused_topk_block)

    B, D, I, L = args.batch, args.dim, args.items, args.lmax
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    bp = jnp.asarray(rng.standard_normal(I), jnp.float32)
    # config-5-like degree tail: exponential lengths capped at L
    lens = np.minimum(rng.exponential(100, B).astype(np.int64) + 1, L)
    rated = np.full((B, L), I, np.int32)
    for b in range(B):
        rated[b, : lens[b]] = np.sort(
            rng.choice(I, lens[b], replace=False))
    ratedj = jnp.asarray(rated)
    dense = np.zeros((B, I), np.int8)
    for b in range(B):
        dense[b, rated[b, : lens[b]]] = 1
    densej = jnp.asarray(dense)
    print(f"B={B} D={D} I={I} mean_len={lens.mean():.0f} max={lens.max()}")

    variants = args.variants.split(",")
    ref_ids = None
    if "dense" in variants:
        blk = _fused_topk_block(B, 4096, 10)
        dt = bench(lambda: fused_topk_scores(z, W, bp, densej, k=10),
                   args.reps)
        ids_d, _ = fused_topk_scores(z, W, bp, densej, k=10)
        ref_ids = np.asarray(ids_d)
        print(f"dense-mask kernel (block {blk}): {dt*1e3:.2f} ms "
              f"-> {B/dt:.0f} users/s")
    from cdae_tpu.ops.pallas_kernels import (
        csr_block_queries_np, fused_topk_csr_plan)

    for name, w, merge in (("csr8", 8, "argmax"), ("csr16", 16, "argmax"),
                           ("csr8g", 8, "grouped")):
        if name not in variants:
            continue
        blk = fused_topk_csr_plan(B, 10, merge=merge)
        t0 = time.perf_counter()
        qd, w_used, ov = csr_block_queries_np(rated, I, blk, w)
        tq = (time.perf_counter() - t0) * 1e3
        qdj = jnp.asarray(qd)
        fn = lambda: fused_topk_scores_csr(z, W, bp, ratedj, k=10, w=w,
                                           merge=merge, qd=qdj)
        dt = bench(fn, args.reps)
        ids_c, _ = fn()
        ok = (np.array_equal(np.asarray(ids_c), ref_ids)
              if ref_ids is not None else None)
        print(f"csr w={w} {merge} (block {blk}, host-qd {tq:.1f} ms once, "
              f"overflow={ov}): {dt*1e3:.2f} ms -> {B/dt:.0f} users/s  "
              f"ids==dense: {ok}")

    # in-jit preprocessing (documented-slow path; host-qd is the default)
    blk = fused_topk_csr_plan(B, 10)
    dt = bench(lambda: csr_block_queries(ratedj, I, blk, 8)[0], args.reps)
    print(f"in-jit csr_block_queries (block {blk}, w=8): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()

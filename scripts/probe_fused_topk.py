#!/usr/bin/env python
"""Tune fused_topk_scores (serving decode+top-k) at huge catalogs.

Sweeps (B, block) at a 1M-item catalog with the standard measurement
protocol (warm pass compiles; timed loop queues REPS calls with ONE forced
readback — per-call readbacks pay the ~30 ms tunnel RTT each). The kernel's
grid is sequential over catalog blocks, so per-grid-step overhead is
amortized by larger blocks until VMEM caps out ((B, k+block) f32 scratch +
(block, 128) W tile + (B, block) int8 mask per step).

Usage: python scripts/probe_fused_topk.py [--items 1000000 --dim 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=50)
    ap.add_argument("--degree", type=int, default=50)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--batches", default="256,512",
                    help="comma list of B values")
    ap.add_argument("--blocks", default="2048,8192,16384,32768",
                    help="comma list of catalog block sizes")
    ap.add_argument("--merge", default="argmax",
                    help="argmax|grouped (grouped measured slower, "
                         "see BASELINE.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cdae_tpu.ops.pallas_kernels import (
        _fused_topk_block,
        fused_topk_scores,
    )

    I, D = args.items, args.dim
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((I, D), dtype=np.float32))
    bp = jnp.asarray(rng.standard_normal(I).astype(np.float32))

    for B in [int(x) for x in args.batches.split(",")]:
        z = jnp.asarray(rng.standard_normal((B, D), dtype=np.float32))
        cols = rng.integers(0, I, size=(B, args.degree))
        rated = np.zeros((B, I), np.int8)
        rated[np.arange(B)[:, None], cols] = 1
        rated = jnp.asarray(rated)
        seen = set()
        for block in [int(x) for x in args.blocks.split(",")]:
            eff = _fused_topk_block(B, block, 10, args.merge)
            if eff in seen:  # clamped onto an already-measured point
                print(f"B={B:5d} block={block:6d}: clamped to {eff} (seen)")
                continue
            seen.add(eff)
            kw = dict(k=10, block=block, merge=args.merge)
            try:
                ids, vals = fused_topk_scores(z, W, bp, rated, **kw)
                float(jnp.sum(vals))  # warm + compile
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    ids, vals = fused_topk_scores(z, W, bp, rated, **kw)
                float(jnp.sum(vals))
                dt = (time.perf_counter() - t0) / args.reps
                print(f"B={B:5d} block={block:6d} (eff {eff:6d}): "
                      f"{dt*1e3:7.2f} ms/call {B/dt:10,.0f} users/s "
                      f"{B*I/dt/1e9:6.1f}B scorings/s")
            except Exception as e:  # VMEM OOM at big (B, block)
                print(f"B={B:5d} block={block:6d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

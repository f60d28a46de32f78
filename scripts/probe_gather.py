#!/usr/bin/env python
"""Micro-benchmark: XLA row gather vs one-hot MXU-matmul gather on TPU.

The pairwise step gathers ~B·(nn+2) rows of D≈10 from the factor tables
(params['iv'][j] etc.). TPU gathers of narrow rows may serialize like
scatters do; if so, the same one-hot/factored matmul trick used for
scatter-add (ops/scatter.py) applies to the gather side.

usage: python scripts/probe_gather.py [--platform cpu]
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
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    I, D = args.items, args.dim
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))

    def timed(name, f, *a, reps=30):
        out = f(*a)
        float(jnp.sum(out))  # forced readback (tunnel lies)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*a)
        float(jnp.sum(out))
        log(f"{name}: {(time.perf_counter()-t0)/reps*1000:.3f} ms")

    for P in (4096, 24576, 98304):
        idx = jnp.asarray(rng.integers(0, I, P).astype(np.int32))

        timed(f"xla row gather      P={P}", jax.jit(lambda t, ix: t[ix]),
              table, idx)

        def onehot_gather(t, ix):
            oh = (ix[:, None] == jnp.arange(I)[None, :]).astype(jnp.float32)
            return oh @ t

        timed(f"one-hot mm gather   P={P}", jax.jit(onehot_gather),
              table, idx)

        # factored two-level: id = hi*C + lo
        C = int(np.ceil(np.sqrt(I)))
        Ipad = C * C

        def factored_gather(t, ix):
            tp = jnp.pad(t, ((0, Ipad - I), (0, 0))).reshape(C, C * D)
            hi = ix // C
            lo = ix % C
            oh_hi = (hi[:, None] == jnp.arange(C)[None, :]).astype(
                jnp.float32)
            rows = (oh_hi @ tp).reshape(-1, C, D)  # (P, C, D)
            oh_lo = (lo[:, None] == jnp.arange(C)[None, :]).astype(
                jnp.float32)
            return jnp.einsum("pc,pcd->pd", oh_lo, rows)

        timed(f"factored mm gather  P={P}", jax.jit(factored_gather),
              table, idx)


if __name__ == "__main__":
    main()

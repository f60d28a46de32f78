"""Probe: scatter_add_rows strategy crossover in P (rows to aggregate).

The pairwise models aggregate P gradient rows into an (N, D+1) table where
P ranges from ~5k (BPR bs1024) to ~3.5M (FISM bs256 at ML-1M degree skew).
Measures pallas flat one-hot vs factored two-level one-hot vs sort-segment
so scatter_add_rows' "auto" crossover is data, not guesswork.

usage: python scripts/probe_scatter_modes.py [--items 3706] [--dim 11]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=3706)
    ap.add_argument("--dim", type=int, default=11)
    ap.add_argument("--modes", nargs="*",
                    default=["pallas", "factored", "sort"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cdae_tpu.ops.scatter import scatter_add_rows

    N, D = args.items, args.dim
    rng = np.random.default_rng(0)
    base = jnp.zeros((N, D), jnp.float32)

    def timeit(fn, *a, iters=10):
        out = fn(*a)
        float(jnp.sum(out))  # compile + forced readback (CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters

    for P in (16_384, 65_536, 262_144, 1_048_576, 3_538_944):
        idx = jnp.asarray(rng.integers(0, N, size=P), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((P, D)), jnp.float32)
        row = [f"P={P:>8}"]
        for mode in args.modes:
            f = jax.jit(lambda b, i, v, m=mode: scatter_add_rows(
                b, i, v, mode=m))
            try:
                dt = timeit(f, base, idx, vals)
                row.append(f"{mode} {dt*1e3:8.2f} ms")
            except Exception as e:  # noqa: BLE001 — probe keeps going
                row.append(f"{mode} FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()

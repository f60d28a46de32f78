"""Probe: TPU scatter-add vs one-hot-matmul ("MXU scatter") for the pairwise
gradient aggregation pattern (VERDICT round-1 item 1).

Pattern under test: sum P per-pair gradient rows (P, D) into an (N, D) table
at data-dependent indices — the `.at[idx].add(vals)` at models/mf.py
_pairwise_grads, which serializes on TPU.

Timing uses forced readback (CLAUDE.md: block_until_ready lies over the
tunnel).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def readback(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    readback(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / iters


def main():
    P, N, D = 5120, 3706, 50
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=P), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((P, D)), jnp.float32)

    @jax.jit
    def scatter(idx, vals):
        return jnp.zeros((N, D), jnp.float32).at[idx].add(vals)

    @jax.jit
    def onehot_mm(idx, vals):
        oh = (idx[:, None] == jax.lax.iota(jnp.int32, N)[None, :])
        return jnp.einsum("pn,pd->nd", oh.astype(vals.dtype), vals)

    @jax.jit
    def onehot_mm_highest(idx, vals):
        oh = (idx[:, None] == jax.lax.iota(jnp.int32, N)[None, :])
        return jnp.einsum("pn,pd->nd", oh.astype(vals.dtype), vals,
                          precision=jax.lax.Precision.HIGHEST)

    a = timeit(scatter, idx, vals)
    b = timeit(onehot_mm, idx, vals)
    c = timeit(onehot_mm_highest, idx, vals)
    # correctness
    ref = np.zeros((N, D), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(vals))
    err_b = float(np.max(np.abs(np.asarray(onehot_mm(idx, vals)) - ref)))
    err_c = float(np.max(np.abs(np.asarray(onehot_mm_highest(idx, vals)) - ref)))
    print(f"P={P} N={N} D={D}")
    print(f"scatter .at[].add : {a*1e3:8.3f} ms")
    print(f"onehot matmul      : {b*1e3:8.3f} ms  maxerr {err_b:.2e}")
    print(f"onehot mm HIGHEST  : {c*1e3:8.3f} ms  maxerr {err_c:.2e}")

    # bigger shapes: ML-20M-ish items and more pairs
    for (P2, N2, D2) in [(20480, 3706, 50), (20480, 27000, 50),
                         (5120, 3706, 10), (20480, 3706, 10)]:
        idx2 = jnp.asarray(rng.integers(0, N2, size=P2), jnp.int32)
        vals2 = jnp.asarray(rng.standard_normal((P2, D2)), jnp.float32)

        @jax.jit
        def scatter2(idx, vals):
            return jnp.zeros((N2, D2), jnp.float32).at[idx].add(vals)

        @jax.jit
        def onehot2(idx, vals):
            oh = (idx[:, None] == jax.lax.iota(jnp.int32, N2)[None, :])
            return jnp.einsum("pn,pd->nd", oh.astype(vals.dtype), vals)

        a2 = timeit(scatter2, idx2, vals2, iters=10)
        b2 = timeit(onehot2, idx2, vals2, iters=10)
        print(f"P={P2} N={N2} D={D2}: scatter {a2*1e3:8.3f} ms  "
              f"onehot {b2*1e3:8.3f} ms  ({a2/b2:.1f}x)")


if __name__ == "__main__":
    main()

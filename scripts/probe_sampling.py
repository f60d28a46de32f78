"""Probe: sample_unrated strategy cost at FISM/CDAE/WARP shapes.

sample_unrated picks compare-sum (S<=512) vs vmapped searchsorted (huge S)
by S alone; this measures both at the (B, L, S) shapes the models actually
use so the regime boundaries are data (ROADMAP r2: FISM regression hunt).

usage: python scripts/probe_sampling.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    I = 3706
    rng = np.random.default_rng(0)

    def make_rows(B, L):
        lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
        rows = np.full((B, L), I, np.int32)
        for b in range(B):
            rows[b, : lengths[b]] = np.sort(
                rng.choice(I, size=lengths[b], replace=False))
        return jnp.asarray(rows), jnp.asarray(lengths)

    def timeit(fn, *a, iters=10):
        out = fn(*a)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters * 1e3

    key = jax.random.PRNGKey(0)

    def search_path(key, rows, lengths, S):
        free = jnp.maximum(I - lengths, 1)
        u = jax.random.randint(key, (rows.shape[0], S), 0, free[:, None],
                               dtype=jnp.int32)
        pos = jnp.arange(rows.shape[1], dtype=jnp.int32)[None, :]
        ranks = jnp.where(pos < lengths[:, None], rows - pos, I)
        k = jax.vmap(jnp.searchsorted, in_axes=(0, 0, None))(ranks, u,
                                                             "right")
        return u + k

    def chunk_path(key, rows, lengths, S, chunk=32):
        free = jnp.maximum(I - lengths, 1)
        B = rows.shape[0]
        u = jax.random.randint(key, (B, S), 0, free[:, None],
                               dtype=jnp.int32)
        pos = jnp.arange(rows.shape[1], dtype=jnp.int32)[None, :]
        ranks = jnp.where(pos < lengths[:, None], rows - pos, I)
        S_pad = -(-S // chunk) * chunk
        u_p = jnp.pad(u, ((0, 0), (0, S_pad - S)))
        u_c = jnp.moveaxis(u_p.reshape(B, S_pad // chunk, chunk), 1, 0)

        def body(_, uc):
            return None, jnp.sum(
                (ranks[:, :, None] <= uc[:, None, :]).astype(jnp.int32),
                axis=1)

        _, k_c = jax.lax.scan(body, None, u_c)
        k = jnp.moveaxis(k_c, 0, 1).reshape(B, S_pad)[:, :S]
        return u + k

    shapes = [
        ("FISM unbucketed", 256, 2314, 6 * 2314),
        ("FISM bucket L512", 256, 512, 6 * 512),
        ("FISM bucket L128", 256, 128, 6 * 128),
        ("BPR bs4096", 4096, 2314, 5),
        ("CDAE smoke", 3072, 800, 4000),
    ]
    for name, B, L, S in shapes:
        rows, lengths = make_rows(B, L)
        f_s = jax.jit(lambda k, r, ln, S=S: search_path(k, r, ln, S))
        f_c = jax.jit(lambda k, r, ln, S=S: chunk_path(k, r, ln, S))
        t_s = timeit(f_s, key, rows, lengths)
        try:
            t_c = timeit(f_c, key, rows, lengths)
        except Exception as e:  # noqa: BLE001
            t_c = float("nan")
        print(f"{name:18s} B={B} L={L} S={S}: searchsorted {t_s:8.2f} ms  "
              f"compare-sum {t_c:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

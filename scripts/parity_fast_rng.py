#!/usr/bin/env python
"""MF fast_rng parity harness (VERDICT r1 item 10; ROADMAP r2).

Negative draws can come from threefry (jax.random) or the TPU hardware PRNG
(ops/pallas_kernels.hw_uniform — ~free; threefry costs real step time in
fused epochs). Both sample the same distributions, so trained METRICS must
agree within sampling noise even though trajectories differ draw-by-draw.
Covers BOTH fast_rng surfaces: the dense-IMF Bernoulli negative mask and
the sparse-BPR complement sampler (ops/sampling.hw_randint float-scaled
uniforms). Protocol mirrors parity_zoo: lowrank synthetic 1200u x 600i,
20 epochs, dim 10, TOPN on a per-user split.

TPU-only (hw_uniform has no interpret-mode path).

usage: python scripts/parity_fast_rng.py [--epochs 20] [--seeds 3]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1200)
    ap.add_argument("--items", type=int, default=600)
    ap.add_argument("--degree", type=int, default=30)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tol", type=float, default=0.03)
    args = ap.parse_args()

    import jax

    from cdae_tpu.data.synthetic import lowrank_interactions
    from cdae_tpu.evaluation import Evaluation
    from cdae_tpu.models.mf import IMF, MFConfig

    data = lowrank_interactions(args.users, args.items, args.degree,
                                seed=20141119)
    train, test = data.split_by_user(0.2, seed=20141119)
    ev = Evaluation.create("TOPN")

    from cdae_tpu.models.mf import BPR

    def run(cls, seed: int, **cfg_kw) -> float:
        model = cls(MFConfig(num_dim=args.dim, num_neg=5, **cfg_kw))
        state = model.reset(train, seed=seed)
        key = jax.random.PRNGKey(seed)
        for _ in range(args.epochs):
            key, sub = jax.random.split(key)
            state = model.train_one_iteration(state, sub)
        return float(ev.evaluate(model, state, test, train)["R@10"])

    cases = {
        "imf_dense": (IMF, dict(batch_size=1024, dense_mode=True)),
        "bpr_sparse": (BPR, dict(batch_size=1024, dense_mode=False,
                                 loss="LOG")),
    }
    all_ok = True
    for label, (cls, kw) in cases.items():
        rows = []
        for seed in range(args.seeds):
            r_ref = run(cls, seed, fast_rng=False, **kw)
            r_hw = run(cls, seed, fast_rng=True, **kw)
            rows.append((seed, r_ref, r_hw))
            print(f"# {label} seed {seed}: threefry R@10={r_ref:.5f} "
                  f"hw_prng R@10={r_hw:.5f} delta={r_hw - r_ref:+.5f}",
                  file=sys.stderr, flush=True)
        mean_ref = float(np.mean([r[1] for r in rows]))
        mean_hw = float(np.mean([r[2] for r in rows]))
        delta = mean_hw - mean_ref
        ok = abs(delta) <= args.tol
        all_ok = all_ok and ok
        print(json.dumps({
            "metric": f"{label}_fast_rng_R@10_delta",
            "threefry": round(mean_ref, 5),
            "hw_prng": round(mean_hw, 5), "delta": round(delta, 5),
            "tol": args.tol, "seeds": args.seeds, "epochs": args.epochs,
            "pass": ok,
        }), flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())

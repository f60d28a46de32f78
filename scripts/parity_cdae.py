#!/usr/bin/env python
"""Metric-parity harness: TPU-native CDAE vs the reference-semantics C++
implementation on an identical train/test split (BASELINE.md step 1-2).

Generates a structured synthetic dataset (low-rank + popularity skew),
splits per-user 80/20, trains BOTH implementations with the canonical
config, and reports recall@10 / MAP@10 side by side. Parity gate: the TPU
build must be within --tolerance (absolute) of the C++ recall@10 or better.

Run: python scripts/parity_cdae.py [--users 2000 --items 800 --iters 30]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=800)
    ap.add_argument("--degree", type=int, default=40)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dim", type=int, default=50)
    ap.add_argument("--cratio", type=float, default=0.5)
    ap.add_argument("--num_neg", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--tolerance", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=20141119)
    args = ap.parse_args()

    from cdae_tpu.data.synthetic import lowrank_interactions, write_pairs
    from cdae_tpu.models.cdae import CDAE, CDAEConfig

    data = lowrank_interactions(args.users, args.items, args.degree,
                                seed=args.seed)
    train, test = data.split_by_user(0.2, seed=args.seed)
    print(f"# data: {data}, train {len(train)}, test {len(test)}",
          file=sys.stderr)

    # ---- C++ reference-semantics run ----
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "baseline_cdae.cpp")
    exe = os.path.join(tempfile.gettempdir(), "baseline_cdae_parity")
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                    "-o", exe, src], check=True)
    with tempfile.TemporaryDirectory() as td:
        tr_path = os.path.join(td, "train.txt")
        te_path = os.path.join(td, "test.txt")
        write_pairs(tr_path, train)
        write_pairs(te_path, test)
        out = subprocess.run(
            [exe, "parity", tr_path, te_path, str(args.iters), str(args.dim),
             str(args.cratio), str(args.num_neg), str(args.lr)],
            check=True, capture_output=True, text=True,
        ).stdout
    cpp = json.loads(out)
    print(f"# C++ reference-semantics: {cpp}", file=sys.stderr)

    # ---- TPU-native run ----
    # batched AdaGrad needs enough update steps per epoch to match the
    # sequential trajectory: batch 64 reaches reference parity at the same
    # epoch count (validated sweep: R@10 0.5545 vs C++ 0.5552 @ 25 epochs)
    import jax

    from cdae_tpu.evaluation import Evaluation

    model = CDAE(CDAEConfig(
        num_dim=args.dim, learn_rate=args.lr, lambda_=0.01, loss="SQUARE",
        corruption_ratio=args.cratio, scaled=True, num_neg=args.num_neg,
        user_factor=True, batch_size=64,
    ))
    state = model.reset(train, seed=args.seed)
    state = model.train_epochs(state, args.iters, jax.random.PRNGKey(args.seed))
    ours = Evaluation.create("TOPN").evaluate(model, state, test, train)
    print(f"# TPU build: R@10={ours['R@10']:.5f} MAP@10={ours['MAP@10']:.5f}",
          file=sys.stderr)

    delta = ours["R@10"] - cpp["recall_at_10"]
    result = {
        "cpp_recall_at_10": cpp["recall_at_10"],
        "tpu_recall_at_10": ours["R@10"],
        "cpp_map_at_10": cpp["map_at_10"],
        "tpu_map_at_10": ours["MAP@10"],
        "delta_recall": round(delta, 5),
        "parity": bool(delta >= -args.tolerance),
    }
    print(json.dumps(result))
    return 0 if result["parity"] else 1


if __name__ == "__main__":
    sys.exit(main())

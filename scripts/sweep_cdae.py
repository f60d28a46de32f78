#!/usr/bin/env python
"""CDAE hyperparameter sweep — the reference's qsub grid, on one TPU.

Enumerates the WSDM'16 paper grid exactly as the reference sweep script
(ref apps/yelp/cdae.sh:3-36: scale x user_factor x cratio{0..1} x linear x
asym x loss{SQUARE,CE}, lr=0.1, dim=50, num_neg=5, beta=1, seed=20141119)
and trains every config sequentially with the fused-epoch path — what took a
cluster of qsub jobs fits one chip. Prints one JSON line per config.

Usage:
  python scripts/sweep_cdae.py --cache_file data.bin [--limit N] [--iters 50]
  python scripts/sweep_cdae.py --synthetic  # structured synthetic data
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache_file", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--items", type=int, default=800)
    ap.add_argument("--degree", type=int, default=40)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=20141119)
    ap.add_argument("--limit", type=int, default=0,
                    help="run only the first N grid points (0 = all)")
    args = ap.parse_args()

    import jax

    from cdae_tpu.data import io as data_io
    from cdae_tpu.evaluation import Evaluation
    from cdae_tpu.models.cdae import CDAE, CDAEConfig

    if args.synthetic or not args.cache_file:
        from cdae_tpu.data.synthetic import lowrank_interactions

        data = lowrank_interactions(args.users, args.items, args.degree,
                                    seed=args.seed)
    else:
        data = data_io.load_interactions(args.cache_file)
    train, test = data.split_by_user(0.2, seed=args.seed)
    print(f"# {data} -> train {len(train)} / test {len(test)}",
          file=sys.stderr)

    # the exact loops of cdae.sh:3-25
    grid = itertools.product(
        (False, True),                     # SCALE
        (True, False),                     # USER_FACTOR
        (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),   # RATIO
        (False, True),                     # LINEAR
        (True, False),                     # ASYM
        ("SQUARE", "CE"),                  # LOSS
    )
    ev = Evaluation.create("TOPN")
    for n, (scale, uf, ratio, linear, asym, loss) in enumerate(grid):
        if args.limit and n >= args.limit:
            break
        cfg = CDAEConfig(
            learn_rate=0.1, num_dim=50, num_corruptions=1,
            corruption_ratio=ratio, using_adagrad=True, asymmetric=asym,
            linear=linear, scaled=scale, user_factor=uf, loss=loss,
            beta=1.0, linear_function=False, tanh=False, num_neg=5,
            lambda_=0.01, batch_size=args.batch_size,
        )
        model = CDAE(cfg)
        state = model.reset(train, seed=args.seed)
        state = model.train_epochs(state, args.iters,
                                   jax.random.PRNGKey(args.seed))
        res = ev.evaluate(model, state, test, train)
        print(json.dumps({
            "scaled": scale, "user_factor": uf, "cratio": ratio,
            "linear": linear, "asym": asym, "loss": loss,
            "R@10": round(res["R@10"], 5), "MAP@10": round(res["MAP@10"], 5),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Metric-parity harness for the FULL model zoo: TPU-native
IMF/PMF/BPR/WARP/ALS/WRMF/FISM/NegMF/ItemCF/UserCF/Popularity/Linear/FM
vs reference-semantics C++ oracles on an identical split (extends
scripts/parity_cdae.py; recall@10 for rankers, RMSE for rating models).

Run: python scripts/parity_zoo.py [--users 1200 --items 600 --iters 20]
     [--models MF BPR WARP FISM NegMF] [--platform cpu]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scatter", default="auto")
    ap.add_argument("--warp_dense_mult", type=float, default=3.0,
                    help="WARP_DENSE slab-cadence lr multiplier")
    ap.add_argument("--warp_pool_size", type=int, default=1024,
                    help="WARP_DENSE violator pool size")
    ap.add_argument("--models", nargs="*",
                    default=["MF", "PMF", "BPR", "WARP", "ALS", "WRMF", "FISM",
                             "NegMF", "ITEMCF", "USERCF", "POP", "LINEAR", "FM"])
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu); parity is a "
                    "semantics check, CPU avoids the TPU tunnel")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from cdae_tpu.data.synthetic import lowrank_interactions, write_pairs
    from cdae_tpu.evaluation import Evaluation
    from cdae_tpu.models.fism import FISM, FISMConfig
    from cdae_tpu.models.linear import FactorModelConfig, NegMF
    from cdae_tpu.models.mf import BPR, IMF, WARP, MFConfig

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
        def build(method):
            """TPU model with the same hyperparameters the C++ oracle
            hardcodes for `parity_mf <method>` (csrc/baseline_cdae.cpp)."""
            mf_kw = dict(learn_rate=args.lr, num_dim=args.dim,
                         num_neg=args.num_neg, batch_size=args.batch,
                         scatter_mode=args.scatter)
            if method == "MF":
                return IMF(MFConfig(loss="SQUARE", beta=1.0, lambda_=0.01,
                                    **mf_kw))
            if method == "BPR":
                return BPR(MFConfig(loss="LOG", beta=1.0, lambda_=0.01,
                                    **mf_kw))
            if method == "BPR_DENSE":
                # per-user dense slab w/ shared negatives (BPR._dense_step).
                # Slab steps see ~20x fewer AdaGrad applications per epoch;
                # the standard large-batch compensation (2x lr) restores
                # EQUAL-EPOCH parity (measured: lr 0.2 @ 20ep = 0.558 vs
                # oracle 0.555; at lr 0.1 it needed 3x epochs)
                kw2 = dict(mf_kw, learn_rate=2 * args.lr)
                return BPR(MFConfig(loss="LOG", beta=1.0, lambda_=0.01,
                                    dense_mode=True, **kw2))
            if method == "WARP":  # ref warp.hpp:16 (lambda .1, no beta)
                return WARP(MFConfig(loss="HINGE", beta=0.0, lambda_=0.1,
                                     **mf_kw))
            if method == "WARP_DENSE":
                # per-user dense slab: pooled violators + Rao-Blackwellized
                # selection/rank weights; EQUAL epochs with the slab
                # cadence lr compensation (see BPR_DENSE note). Round-5
                # 3-seed finding: the old protocol (pool 256, 2x lr) is
                # SYSTEMATICALLY low (−0.024/−0.042/−0.030, mean −0.032,
                # past the gate — the recorded single-seed −0.024 was the
                # lucky one); 3x lr alone helps (mean −0.021, one seed
                # still out) and a 1024 violator pool fixes the rank/
                # selection statistics: at (pool 1024, 3x) the 3 seeds are
                # −0.0003/−0.0208/−0.0090, mean −0.0100, σ 0.0086 — the
                # recorded protocol (defaults below).
                kw2 = dict(mf_kw,
                           learn_rate=args.warp_dense_mult * args.lr)
                return WARP(MFConfig(loss="HINGE", beta=0.0, lambda_=0.1,
                                     dense_mode=True,
                                     warp_pool=args.warp_pool_size,
                                     **kw2))
            if method == "FISM":
                return FISM(FISMConfig(
                    learn_rate=args.lr, num_dim=args.dim,
                    num_neg=args.num_neg, batch_size=args.batch, loss="SQUARE",
                ))
            if method == "NegMF":  # oracle: w_u+w_i+v·v, LOG, no mean term
                return NegMF(FactorModelConfig(
                    learn_rate=args.lr, num_dim=args.dim,
                    num_neg=args.num_neg, batch_size=args.batch, loss="LOG",
                    using_global_mean=False,
                ))
            raise SystemExit(f"unknown model {method}")

        def negmf_dense_cell():
            """NegMF dense slab at EQUAL epochs with the 2x-lr cadence
            compensation (same construction as BPR_DENSE/WARP_DENSE)."""
            out = subprocess.run(
                [exe, "parity_mf", "NegMF", tr_path, te_path,
                 str(args.iters), str(args.dim), str(args.num_neg),
                 str(args.lr)],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ NegMF: {cpp}", file=sys.stderr)
            model = NegMF(FactorModelConfig(
                learn_rate=2 * args.lr, num_dim=args.dim,
                num_neg=args.num_neg, batch_size=args.batch, loss="LOG",
                using_global_mean=False, dense_mode=True,
            ))
            st = model.reset(train, seed=args.seed)
            key = jax.random.PRNGKey(args.seed)
            for _ in range(args.iters):
                key, sub = jax.random.split(key)
                st = model.train_one_iteration(st, sub)
            ours = Evaluation.create("TOPN").evaluate(model, st, test, train)
            print(f"# TPU NegMF_DENSE: R@10={ours['R@10']:.5f}",
                  file=sys.stderr)
            delta = ours["R@10"] - cpp["recall_at_10"]
            return {
                "cpp_recall_at_10": cpp["recall_at_10"],
                "tpu_recall_at_10": round(ours["R@10"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta >= -args.tolerance),
            }

        def pmf_cell(dense: bool = False):
            """PMF (rating MF over observed entries, ref pmf.hpp:71-115):
            judged on test RMSE vs the sequential C++ oracle — the zoo's
            only rating-prediction model, so the cell also exercises the
            RMSE evaluator end-to-end."""
            from cdae_tpu.data.synthetic import lowrank_rated, write_triples
            from cdae_tpu.models.mf import PMF

            rdata = lowrank_rated(args.users, args.items, args.degree,
                                  seed=args.seed)
            rtrain, rtest = rdata.split_by_user(0.2, seed=args.seed)
            trp = os.path.join(td, "train_rated.txt")
            tep = os.path.join(td, "test_rated.txt")
            write_triples(trp, rtrain)
            write_triples(tep, rtest)
            out = subprocess.run(
                [exe, "parity_pmf", trp, tep, str(args.iters),
                 str(args.dim), str(args.lr)],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ PMF: {cpp}", file=sys.stderr)
            # sparse fused epoch: small-minibatch AdaGrad + epoch shuffling
            # beats the oracle's fixed-order sequential pass (measured
            # delta -0.156). The dense user-slab path under-trains at
            # equal epochs with the oracle's lr (+0.043, outside the
            # gate); with the 2x-lr cadence compensation it BEATS the
            # oracle at equal epochs (PMF_DENSE cell: 1.011 vs 1.238)
            model = PMF(MFConfig(loss="SQUARE", beta=1.0, lambda_=0.01,
                                 learn_rate=(2 * args.lr if dense
                                             else args.lr),
                                 num_dim=args.dim,
                                 batch_size=args.batch, dense_mode=dense,
                                 scatter_mode=args.scatter))
            st = model.reset(rtrain, seed=args.seed)
            key = jax.random.PRNGKey(args.seed)
            for _ in range(args.iters):
                key, sub = jax.random.split(key)
                st = model.train_one_iteration(st, sub)
            ours = Evaluation.create("RMSE").evaluate(model, st, rtest,
                                                      rtrain)
            print(f"# TPU PMF: RMSE={ours['RMSE']:.5f}", file=sys.stderr)
            delta = ours["RMSE"] - cpp["rmse"]  # lower is better
            return {
                "cpp_rmse": cpp["rmse"],
                "tpu_rmse": round(ours["RMSE"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta <= args.tolerance),
            }

        def als_cell(method):
            """ALS/WRMF (ref als.hpp:66-121 / wrmf.hpp:66-121): alternating
            d×d normal-equation sweeps — deterministic given the data, so
            the end-to-end cell complements the exact solution-check unit
            test (test_models_zoo.py)."""
            from cdae_tpu.models.als import ALS, ALSConfig, WRMF

            lam, sc = 0.01, 40.0
            out = subprocess.run(
                [exe, "parity_als", method, tr_path, te_path,
                 str(args.iters), str(args.dim), str(lam), str(sc)],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ {method}: {cpp}", file=sys.stderr)
            cls = WRMF if method == "WRMF" else ALS
            model = cls(ALSConfig(num_dim=args.dim, lambda_=lam, scalar=sc))
            st = model.reset(train, seed=args.seed)
            for _ in range(args.iters):
                st = model.train_one_iteration(st, None)
            ours = Evaluation.create("TOPN").evaluate(model, st, test, train)
            print(f"# TPU {method}: R@10={ours['R@10']:.5f}", file=sys.stderr)
            delta = ours["R@10"] - cpp["recall_at_10"]
            return {
                "cpp_recall_at_10": cpp["recall_at_10"],
                "tpu_recall_at_10": round(ours["R@10"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta >= -args.tolerance),
            }

        def sim_cell(method):
            """Deterministic recommenders (ItemCF/UserCF Jaccard top-50
            neighbors, Popularity): exact-semantics C++ walk vs the blocked
            MXU co-occurrence build — only top-k TIE ordering can differ."""
            from cdae_tpu.models.popularity import Popularity
            from cdae_tpu.models.similarity import (
                ItemCF, SimilarityConfig, UserCF,
            )

            out = subprocess.run(
                [exe, "parity_sim", method, tr_path, te_path, "50"],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ {method}: {cpp}", file=sys.stderr)
            if method == "POP":
                model = Popularity()
            else:
                cls = ItemCF if method == "ITEMCF" else UserCF
                model = cls(SimilarityConfig(sim_type="JACCARD", topk=50))
            st = model.reset(train, seed=args.seed)
            st = model.train_one_iteration(st, jax.random.PRNGKey(0))
            ours = Evaluation.create("TOPN").evaluate(model, st, test, train)
            print(f"# TPU {method}: R@10={ours['R@10']:.5f}", file=sys.stderr)
            delta = ours["R@10"] - cpp["recall_at_10"]
            return {
                "cpp_recall_at_10": cpp["recall_at_10"],
                "tpu_recall_at_10": round(ours["R@10"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta >= -args.tolerance),
            }

        def fm_cell(method):
            """LinearModel / FactorModel (linear_model-inl.hpp:46-68,
            factor_model-inl.hpp:65-128) on rated instances, judged on test
            RMSE — the bias and order-2 FM baselines, closing the last
            model-layer classes without oracle cells."""
            from cdae_tpu.data.synthetic import lowrank_rated, write_triples
            from cdae_tpu.models.linear import (
                FactorModel, FactorModelConfig, LinearModel,
                LinearModelConfig,
            )

            rdata = lowrank_rated(args.users, args.items, args.degree,
                                  seed=args.seed)
            rtrain, rtest = rdata.split_by_user(0.2, seed=args.seed)
            trp = os.path.join(td, "train_rated.txt")
            tep = os.path.join(td, "test_rated.txt")
            write_triples(trp, rtrain)
            write_triples(tep, rtest)
            fm_dim = 5
            # both sides train the SAME iteration count (FM runs longer —
            # see the convergence-variance note below)
            n_iters = max(args.iters, 60) if method == "FM" else args.iters
            out = subprocess.run(
                [exe, "parity_fm", method, trp, tep, str(n_iters),
                 str(fm_dim), str(args.lr), "0.01"],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ {method}: {cpp}", file=sys.stderr)
            kw = dict(loss="SQUARE", lambda_=0.01, learn_rate=args.lr,
                      batch_size=args.batch, using_global_mean=True,
                      using_adagrad=True)
            if method == "FM":
                # order-2 interactions need near-sequential zero-init-AdaGrad
                # granularity at equal epochs (bs16 +0.024 vs bs64 +0.040),
                # AND a CONVERGED comparison: at 20 iters the cell's
                # init-path variance hugs the 0.03 gate (3 seeds: +0.024 /
                # +0.031 / +0.020 — batch size does NOT move the bad seed:
                # bs4 made it +0.036), while training longer shrinks it
                # monotonically (seed 7: 20it +0.031, 40it +0.020, 60it
                # +0.015). At 60 iters the 3-seed spread is mean +0.0139,
                # sigma 0.0011 (round 5).
                kw["batch_size"] = min(args.batch, 16)
                model = FactorModel(FactorModelConfig(num_dim=fm_dim, **kw))
            else:
                model = LinearModel(LinearModelConfig(**kw))
            st = model.reset(rtrain, seed=args.seed)
            key = jax.random.PRNGKey(args.seed)
            for _ in range(n_iters):
                key, sub = jax.random.split(key)
                st = model.train_one_iteration(st, sub)
            ours = Evaluation.create("RMSE").evaluate(model, st, rtest,
                                                      rtrain)
            print(f"# TPU {method}: RMSE={ours['RMSE']:.5f}",
                  file=sys.stderr)
            delta = ours["RMSE"] - cpp["rmse"]  # lower is better
            return {
                "cpp_rmse": cpp["rmse"],
                "tpu_rmse": round(ours["RMSE"], 5),
                "delta": round(delta, 5),
                "parity": bool(delta <= args.tolerance),
            }

        for method in args.models:
            if method in ("PMF", "PMF_DENSE"):
                results[method] = pmf_cell(dense=method == "PMF_DENSE")
                ok = ok and results[method]["parity"]
                continue
            if method == "NEGMF_DENSE":
                results[method] = negmf_dense_cell()
                ok = ok and results[method]["parity"]
                continue
            if method in ("LINEAR", "FM"):
                results[method] = fm_cell(method)
                ok = ok and results[method]["parity"]
                continue
            if method in ("ALS", "WRMF"):
                results[method] = als_cell(method)
                ok = ok and results[method]["parity"]
                continue
            if method in ("ITEMCF", "USERCF", "POP"):
                results[method] = sim_cell(method)
                ok = ok and results[method]["parity"]
                continue
            oracle = {"BPR_DENSE": "BPR", "WARP_DENSE": "WARP"}.get(
                method, method
            )
            out = subprocess.run(
                [exe, "parity_mf", oracle, tr_path, te_path,
                 str(args.iters), str(args.dim), str(args.num_neg),
                 str(args.lr)],
                check=True, capture_output=True, text=True,
            ).stdout
            cpp = json.loads(out)
            print(f"# C++ {method}: {cpp}", file=sys.stderr)

            model = build(method)
            solver_state = model.reset(train, seed=args.seed)
            key = jax.random.PRNGKey(args.seed)
            tpu_iters = args.iters
            for _ in range(tpu_iters):
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

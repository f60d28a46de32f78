#!/usr/bin/env python
"""Headline benchmark: CDAE training throughput on TPU vs the reference CPU
implementation.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the canonical Yelp/ML-1M-scale CDAE config (dim=50, corruption 0.5
scaled, num_neg=5, SQUARE loss, AdaGrad — ref apps/yelp/cdae.sh:3-25) on a
synthetic 6040-user x 3706-item dataset with a geometric degree distribution
(mean 160 interactions/user, ~ML-1M density). Metric: training users/sec
(one corruption pass per user per epoch, like ref cdae.hpp:136-146).

Baseline: the reference repo publishes NO numbers (BASELINE.md), and its
binary cannot be built here (Eigen/Boost absent), so the baseline is a
faithful from-scratch C++ reproduction of its sequential per-user hot loop
(csrc/baseline_cdae.cpp), measured on this machine's CPU: 3219 users/sec.
Set BENCH_MEASURE_BASELINE=1 to re-measure live (compiles with g++ -O3).

Env knobs: BENCH_USERS, BENCH_ITEMS, BENCH_DEG, BENCH_DIM, BENCH_BATCH,
BENCH_EPOCHS, BENCH_SECONDS.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# measured via csrc/baseline_cdae.cpp on this container's CPU (2026-08-19):
# {"users_per_sec": 4021.23, U=6040, I=3706, deg=160, dim=50}
# (the 2026-08-16 container measured 3219.38 on a 2.60GHz part; this
# 2.10GHz part is ~25% faster per core — re-measured per VERDICT r1
# weak #8, conservatively LOWERING vs_baseline)
BASELINE_USERS_PER_SEC = 4021.0
# the CPU the constant was measured on — if the container migrates to a
# different part, the frozen baseline silently skews vs_baseline, so warn
BASELINE_CPU_MODEL = "Intel(R) Xeon(R) Processor @ 2.10GHz"


def _cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return "unknown"


def synthetic_interactions(num_users, num_items, avg_degree, seed=20141119):
    from cdae_tpu.data.dataset import Interactions

    rng = np.random.default_rng(seed)
    degrees = np.minimum(
        1 + rng.geometric(1.0 / avg_degree, size=num_users), num_items - 1
    )
    users = np.repeat(np.arange(num_users, dtype=np.int64), degrees)
    items = rng.integers(0, num_items, size=len(users))
    pairs = np.unique(users * num_items + items)
    return Interactions.from_arrays(
        (pairs // num_items).astype(np.int32),
        (pairs % num_items).astype(np.int32),
        num_users=num_users,
        num_items=num_items,
    )


def measure_baseline(U, I, deg, dim, seconds=20.0):
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "csrc", "baseline_cdae.cpp")
    exe = "/tmp/baseline_cdae_bench"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe, src],
        check=True,
    )
    out = subprocess.run(
        [exe, str(U), str(I), str(deg), str(dim), str(seconds)],
        check=True, capture_output=True, text=True,
    ).stdout
    return float(json.loads(out)["users_per_sec"])


def main():
    U = int(os.environ.get("BENCH_USERS", 6040))
    I = int(os.environ.get("BENCH_ITEMS", 3706))
    deg = int(os.environ.get("BENCH_DEG", 160))
    dim = int(os.environ.get("BENCH_DIM", 50))
    batch = int(os.environ.get("BENCH_BATCH", 1536))  # batch scan 2026-08-19:
    # 768:7.02M 1024:7.07M 1536:7.69M 2048:7.19M 3072:7.38M 6144:4.92M
    min_epochs = int(os.environ.get("BENCH_EPOCHS", 3))
    budget_s = float(os.environ.get("BENCH_SECONDS", 30))

    baseline = BASELINE_USERS_PER_SEC
    if os.environ.get("BENCH_MEASURE_BASELINE"):
        baseline = measure_baseline(U, I, deg, dim)
        print(f"# measured baseline: {baseline:.1f} users/s", file=sys.stderr)
    elif _cpu_model() != BASELINE_CPU_MODEL:
        print(f"# WARNING: host CPU is {_cpu_model()!r}, baseline constant "
              f"was measured on {BASELINE_CPU_MODEL!r} — vs_baseline may be "
              "skewed; set BENCH_MEASURE_BASELINE=1 to re-measure",
              file=sys.stderr)

    # device watchdog: a wedged axon tunnel makes the first dispatch hang
    # forever (CLAUDE.md) — probe in a killable subprocess so a dead tunnel
    # yields an honest error line instead of an eternal hang
    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 120))
    if probe_s > 0:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8, 8)))))"],
                timeout=probe_s, check=True, capture_output=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            print(json.dumps({
                "metric": "cdae_train_users_per_sec", "value": 0,
                "unit": "users/s", "vs_baseline": 0,
                "error": f"device unreachable: {type(e).__name__} "
                         f"(tunnel probe, {probe_s:.0f}s)",
            }))
            return 1

    import jax

    from cdae_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()  # persistent XLA cache (CDAE_COMPILE_CACHE=off to skip)

    from cdae_tpu.models.cdae import CDAE, CDAEConfig

    data = synthetic_interactions(U, I, deg)

    def measure(fused: bool) -> float:
        import jax.numpy as _jnp

        model = CDAE(CDAEConfig(
            num_dim=dim, learn_rate=0.1, lambda_=0.01, loss="SQUARE",
            corruption_ratio=0.5, scaled=True, num_neg=5, user_factor=True,
            batch_size=batch,
            compute_dtype=(_jnp.bfloat16
                           if os.environ.get("BENCH_BF16") else None),
        ))
        state = model.reset(data, seed=0)
        key = jax.random.PRNGKey(0)

        def run(s, n, sub):
            if fused:
                return model.train_epochs(s, n, sub)
            for _ in range(n):
                sub, k2 = jax.random.split(sub)
                s = model.train_one_iteration(s, k2)
            return s

        import jax.numpy as jnp

        def checksum(s):
            # forced device->host readback: unlike block_until_ready, this
            # cannot be satisfied before the computation actually finishes
            # (guards against async-dispatch timing artifacts over tunneled
            # device transports)
            return float(jnp.sum(s.params["W"]))

        # warmup: compiles the (fused multi-)epoch program AND ramps the
        # device — after idle the chip runs 10-50x slow for the first
        # seconds (round-5 finding; a cold-started budget window read
        # 4.6M where the warmed steady state is 7.8M), so burn ~3 s of
        # real work before the clock starts
        key, sub = jax.random.split(key)
        state = run(state, 1, sub)
        checksum(state)
        t_warm = time.perf_counter()
        while time.perf_counter() - t_warm < 3.0:
            key, sub = jax.random.split(key)
            state = run(state, max(min_epochs, 30), sub)
            checksum(state)

        t0 = time.perf_counter()
        epochs = 0
        chunk = max(min_epochs, 30)  # one ~27 ms device program per chunk;
        # the tunnel readback RTT amortizes to noise (10-epoch chunks
        # measured 6.61M, 60-epoch 6.79M users/s)
        while epochs < min_epochs or time.perf_counter() - t0 < budget_s:
            key, sub = jax.random.split(key)
            state = run(state, chunk, sub)
            epochs += chunk
            if epochs >= 600:
                break
        checksum(state)
        return U * epochs / (time.perf_counter() - t0)

    # the fused path collapses dispatch latency; fall back to per-iteration
    # stepping if the device/tunnel rejects the large fused program
    users_per_sec = None
    for fused in (True, True, False):
        try:
            users_per_sec = measure(fused)
            break
        except Exception as e:  # noqa: BLE001 - report last-resort failure
            print(f"# bench attempt (fused={fused}) failed: {e!r}",
                  file=sys.stderr)
    if users_per_sec is None:
        raise SystemExit("all bench attempts failed")

    # --- MFU accounting (VERDICT r1 item 6) ---------------------------------
    # Dense-mode CDAE model FLOPs: 5 (B,I)x(I,D)-class MXU matmuls per epoch
    # pass (encode, decode, decode-grad, hidden-grad, encode-grad), i.e.
    # ~10·U·I·D useful FLOPs per epoch. MFU is reported against the chip's
    # bf16 peak (v5e: 197 TFLOP/s; override via BENCH_PEAK_TFLOPS) — the
    # honest denominator for "distance to silicon" even while the compute
    # dtype is f32 (see ROADMAP: XLA upcasts bf16 operands here).
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
    model_tflop_per_epoch = 10.0 * U * I * dim / 1e12
    achieved_tflops = model_tflop_per_epoch * users_per_sec / U

    # --- HBM roofline accounting (VERDICT r4 item 3) ------------------------
    # Two traffic models BRACKET the dense step's true HBM bytes/epoch:
    #
    # COMPULSORY (lower bound — what must cross HBM even with perfect
    # on-chip reuse): the int8 interaction rows once per epoch, plus the
    # (I, D) parameter tables + AdaGrad accumulators (~2 reads + 1 write
    # each) and b'/accumulator vectors per batch. The RNG masks are
    # generated on-chip (zero bytes).
    #
    # SLAB (upper bound — every (B, I) fusion-boundary slab spills to HBM):
    # counted from _dense_train_step: rows w+2r, uniforms x2 w+r, kept
    # w+2r, w_mat w+2r, g w+3r (slab dtype) + pred w+r (f32) + the int8
    # gather => 17 sdt + 2 f32 + 1 int8 passes per (B, I) cell.
    #
    # frac_of_hbm_roofline = achieved users/s over the COMPULSORY-bound
    # speed of light (~1 => memory-bound). When the SLAB model's implied
    # bandwidth exceeds the chip peak (slab_hbm_frac > 1), the slabs are
    # PROVABLY cache/VMEM-resident and the step is latency/VPU-bound, not
    # HBM-bound — the measured form of BASELINE.md's "latency-bound by
    # design". Denominator: v5e HBM peak 819 GB/s (BENCH_PEAK_HBM_GBPS).
    slab_bytes = 2 if os.environ.get("BENCH_BF16") else 4
    n_batches = -(-U // batch)
    params_bytes = n_batches * (3 * 2 * I * dim * 4 + 3 * 2 * I * 4)
    compulsory_bytes = U * I * 1 + params_bytes
    slab_model_bytes = U * I * (17 * slab_bytes + 2 * 4 + 1) + params_bytes
    peak_hbm_gbps = float(os.environ.get("BENCH_PEAK_HBM_GBPS", 819.0))
    epochs_per_sec = users_per_sec / U
    hbm_bound_users_per_sec = peak_hbm_gbps * 1e9 / compulsory_bytes * U
    slab_hbm_frac = slab_model_bytes * epochs_per_sec / (peak_hbm_gbps * 1e9)
    print(json.dumps({
        "metric": "cdae_train_users_per_sec",
        "value": round(users_per_sec, 1),
        "unit": "users/s",
        "vs_baseline": round(users_per_sec / baseline, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu_vs_bf16_peak": round(achieved_tflops / peak_tflops, 4),
        "frac_of_hbm_roofline": round(
            users_per_sec / hbm_bound_users_per_sec, 4),
        "slab_hbm_frac": round(slab_hbm_frac, 3),
        "memory_bound": slab_hbm_frac <= 1.0,
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)

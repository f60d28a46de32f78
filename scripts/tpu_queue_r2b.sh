#!/bin/bash
# Follow-up TPU queue: post-violator-kernel WARP re-measures, BPR/WARP
# stage-level diagnostics, and the D=200 f32 MFU cell that hit a transient
# tunnel probe timeout in tpu_queue_r2.sh. Same safety rules: probe first,
# every step its own process under `timeout`, logs to /tmp/tpuq2_*.log.
set -u
cd /root/repo
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" > "/tmp/tpuq2_$name.log" 2>&1
  echo "exit=$? (log /tmp/tpuq2_$name.log)"
  tail -3 "/tmp/tpuq2_$name.log"
}

run probe 120 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" || true
grep -q "64.0" /tmp/tpuq2_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 1. WARP with the fused violator kernel (auto-on on TPU)
run warp4096_k  900 python scripts/bench_zoo.py WARP --batch 4096 --scatter factored
run warp8192_k  900 python scripts/bench_zoo.py WARP --batch 8192 --scatter factored
run warp16384_k 900 python scripts/bench_zoo.py WARP --batch 16384 --scatter factored

# 2. stage-level diagnostics (where does the remaining step time go)
run diag_bpr  900 python scripts/diag_bpr.py --batch 4096 --scatter factored
run diag_warp 900 python scripts/diag_warp.py --batch 8192 --scatter factored

# 3. D=200 f32 MFU cell (failed on a transient probe timeout in r2 queue)
run bench_d200 900 env BENCH_DIM=200 python bench.py

# 4. gather microbench (is the pairwise row-gather the hidden cost?)
run probe_gather 600 python scripts/probe_gather.py

echo "=== queue done ==="

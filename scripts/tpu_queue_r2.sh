#!/bin/bash
# One-shot TPU measurement queue for the round-2 pending items (run from
# /root/repo when the axon tunnel is healthy — probe first with a tiny op).
# Each step is its own process under `timeout` (a crash cannot wedge the
# next), logs to /tmp/tpuq_*.log, and bench scripts force readbacks
# internally (CLAUDE.md: block_until_ready lies over the tunnel).
set -u
cd /root/repo
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" > "/tmp/tpuq_$name.log" 2>&1
  echo "exit=$? (log /tmp/tpuq_$name.log)"
  tail -3 "/tmp/tpuq_$name.log"
}

# 1. probe (abort early if the tunnel is wedged)
run probe 90 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" || true
grep -q "64.0" /tmp/tpuq_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 2. pairwise re-measures at the validated operating points
run bpr4096  900 python scripts/bench_zoo.py BPR  --batch 4096 --scatter factored
run bpr8192  900 python scripts/bench_zoo.py BPR  --batch 8192 --scatter factored
run warp4096 900 python scripts/bench_zoo.py WARP --batch 4096 --scatter factored
run warp8192 900 python scripts/bench_zoo.py WARP --batch 8192 --scatter factored
run warp16384 900 python scripts/bench_zoo.py WARP --batch 16384 --scatter factored

# 2b. hardware-PRNG sampling A/B (sparse pairwise fast_rng lever)
run bpr8192_hw  900 python scripts/bench_zoo.py BPR  --batch 8192 --scatter factored --fast_rng
run warp8192_hw 900 python scripts/bench_zoo.py WARP --batch 8192 --scatter factored --fast_rng

# 3. fast_rng parity (TPU-only harness; covers dense-IMF + sparse-BPR)
run fastrng 1800 python scripts/parity_fast_rng.py --epochs 20 --seeds 3

# 4. MFU at a width the MXU can use + bf16 compute
run bench_d200      600 env BENCH_DIM=200 python bench.py
run bench_d200_bf16 600 env BENCH_DIM=200 BENCH_BF16=1 python bench.py

# 5. dense-slab FISM/NegMF TPU throughput (ROADMAP pending)
run fism_dense  900 python scripts/bench_zoo.py FISM  --dense --batch 256
run fism_dense512 900 python scripts/bench_zoo.py FISM --dense --batch 512
run negmf_dense 900 python scripts/bench_zoo.py NegMF --dense --batch 4096

# 6b. huge-catalog pairwise: beyond the one-hot FLOP budget the 'auto'
# aggregation switches to the catalog-size-independent sort/segment path
run bpr_200kx50k 1200 python scripts/bench_zoo.py BPR --users 200000 --items 50000 --deg 50 --batch 8192 --seconds 30
run bpr_1m_items 1800 python scripts/bench_zoo.py BPR --users 100000 --items 1000000 --deg 50 --batch 8192 --seconds 60

# 6. FISM sparse regression matrix (ROADMAP: recover the 4.2k config)
run fism_sp_pallas   900 python scripts/bench_zoo.py FISM --sparse --batch 256 --scatter pallas
run fism_sp_nobucket 900 python scripts/bench_zoo.py FISM --sparse --batch 256 --scatter pallas --no_bucket
run fism_sp_scatter  900 python scripts/bench_zoo.py FISM --sparse --batch 256 --scatter scatter
run fism_sp_b128     900 python scripts/bench_zoo.py FISM --sparse --batch 128 --scatter pallas

echo "=== queue done ==="

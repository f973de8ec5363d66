#!/bin/bash
# One-shot on-chip revalidation after kernel changes (or a tunnel outage):
# exactness suite -> per-stage profile -> headline bench -> config benches.
# Logs land in /tmp/tpu_reval/. Run: bash tools/tpu_revalidate.sh
set -u
cd /root/repo
mkdir -p /tmp/tpu_reval
# persistent XLA compilation cache: kernel compiles are 1-3 min each and the
# playbook spans many processes; the disk cache makes every later step
# warm-start (first full pass still pays compiles once).
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "== backend probe =="
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unreachable; aborting"; exit 1; }

echo "== per-kernel Mosaic lowering smoke =="
timeout 2400 python tools/tpu_smoke.py \
  2>&1 | tee /tmp/tpu_reval/smoke.log | tail -20

echo "== on-chip exactness (8 tests) =="
TPU_EXACTNESS=1 timeout 3000 python -m pytest tests/test_tpu_exactness.py -x -q \
  2>&1 | tee /tmp/tpu_reval/exactness.log | tail -3

echo "== per-stage profile (NF=48) =="
PROF_NF=48 timeout 1200 python tools/profile_stages.py \
  2>&1 | tee /tmp/tpu_reval/profile.log | tail -8

echo "== per-stage profile at CIF (352x288, NF=96): localizes the small-geometry floor =="
PROF_W=352 PROF_H=288 PROF_NF=96 PROF_ROW_CAP=1024 PROF_FRAME_CAP=32768 \
  timeout 1200 python tools/profile_stages.py \
  2>&1 | tee /tmp/tpu_reval/profile_cif.log | tail -10

echo "== sharded-path overhead profile (1-dev slice mesh vs plain) =="
timeout 1200 python tools/profile_sharded.py \
  2>&1 | tee /tmp/tpu_reval/sharded.log | tail -4

echo "== batched-path stage ablation (B=1 vs B=8) =="
timeout 1800 python tools/profile_batched.py \
  2>&1 | tee /tmp/tpu_reval/batched.log | tail -10

echo "== headline bench =="
timeout 1200 python bench.py 2>&1 | tee /tmp/tpu_reval/bench.log | tail -2

echo "== headline bench A/B: unroll=4 (promote to default if it wins) =="
FPGA_MPEG2_BENCH_UNROLL=4 timeout 1200 python bench.py \
  2>&1 | tee /tmp/tpu_reval/bench_unroll4.log | tail -2

echo "== config benches (writes BENCH_CONFIGS_r04.json; sweeps unroll + vmap/seq forms) =="
timeout 5400 python tools/bench_configs.py \
  2>&1 | tee /tmp/tpu_reval/configs.log | tail -7

echo "== done; logs in /tmp/tpu_reval =="

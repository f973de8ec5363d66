#!/bin/bash
# Round-5 on-chip measurement program, ordered by artifact value so an
# unexpected tunnel drop costs the least: headline bench (digest-validated,
# also proves the pipeline) -> config sweep (BENCH_CONFIGS_r05.json) ->
# per-stage profiles -> batched tax localization -> sharded overhead ->
# Mosaic smoke -> exactness suite -> GOP-scale chunked soak.
# Logs land in docs/reval_r05/ directly. Run: bash tools/r05_playbook.sh
set -u
cd /root/repo
mkdir -p docs/reval_r05
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "== backend probe =="
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unreachable; aborting"; exit 1; }

echo "== headline bench (digest-validated) =="
timeout 2400 python bench.py 2>&1 | tee docs/reval_r05/bench.log | tail -2

echo "== config benches (writes BENCH_CONFIGS_r05.json) =="
timeout 7200 python tools/bench_configs.py \
  2>&1 | tee docs/reval_r05/configs.log | tail -7

echo "== per-stage profile (1080p, NF=48) =="
PROF_NF=48 timeout 1800 python tools/profile_stages.py \
  2>&1 | tee docs/reval_r05/profile_stages.log | tail -14

echo "== per-stage profile at CIF (352x288, NF=96) =="
PROF_W=352 PROF_H=288 PROF_NF=96 PROF_ROW_CAP=1024 PROF_FRAME_CAP=32768 \
  timeout 1800 python tools/profile_stages.py \
  2>&1 | tee docs/reval_r05/profile_stages_cif.log | tail -14

echo "== batched-path stage ablation (B=1 vs B=8) =="
timeout 2400 python tools/profile_batched.py \
  2>&1 | tee docs/reval_r05/batched.log | tail -14

echo "== sharded-path overhead profile (1-dev slice mesh vs plain) =="
timeout 1800 python tools/profile_sharded.py \
  2>&1 | tee docs/reval_r05/sharded.log | tail -6

echo "== per-kernel Mosaic lowering smoke =="
timeout 2400 python tools/tpu_smoke.py \
  2>&1 | tee docs/reval_r05/smoke.log | tail -20

echo "== on-chip exactness suite =="
TPU_EXACTNESS=1 timeout 3600 python -m pytest tests/test_tpu_exactness.py -x -q \
  2>&1 | tee docs/reval_r05/exactness.log | tail -3

echo "== GOP-scale chunked soak (1080p, 384 frames, chunk 96) =="
timeout 3600 python tools/soak_chunked.py \
  2>&1 | tee docs/reval_r05/soak.log | tail -6

echo "== done; logs in docs/reval_r05 =="

#!/bin/bash
# Round-end compile-cache hygiene (VERDICT r4 #9, reproducible):
#   1. prune the committed cache to exactly the entries the bench touches
#      (runs bench once, instrumented — experiments/prune_compile_cache.py);
#   2. run the bench again fully warm to capture any entries the traced run
#      wrote late;
#   3. stage the result — the tree is then clean after any warm bench.
# CPU runs no longer pollute the tree (utils/compile_cache.py diverts
# JAX_PLATFORMS=cpu caches to /tmp), so drift now only comes from new TPU
# programs, which this script folds in.
#
# Run ON THE TPU with the queue idle:  bash experiments/refresh_compile_cache.sh
set -eu
cd /root/repo

python experiments/prune_compile_cache.py
python bench.py > /tmp/bench_warm_verify.json
cat /tmp/bench_warm_verify.json
git add -A .jax_compilation_cache
git status --short .jax_compilation_cache | head -5
echo "cache refreshed: $(ls .jax_compilation_cache | wc -l) entries, $(du -sh .jax_compilation_cache | cut -f1)"

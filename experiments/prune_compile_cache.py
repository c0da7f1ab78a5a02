"""Prune the committed compile cache to the entries the driver bench loads.

The repo commits `.jax_compilation_cache/` so the driver's fresh-checkout
bench starts warm (BENCH robustness, round 3). By round 3's end the cache
had grown to ~1.1 GB / 4.5k entries — every program every experiment ever
compiled. Only the bench path needs to be warm (VERDICT r3 "what's weak"
#5): this script runs `bench.py` in-process with `LRUCache.get/put`
instrumented (jax's persistent cache IO is pure Python, jax/_src/lru_cache.py),
then rewrites the cache directory to exactly the entries that run touched.

Run on the TPU with a warm cache (takes one bench duration, ~3 min):
    python experiments/prune_compile_cache.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax._src.lru_cache as lru_cache

    touched = set()
    original_get = lru_cache.LRUCache.get
    original_put = lru_cache.LRUCache.put

    def traced_get(self, key):
        value = original_get(self, key)
        if value is not None:
            touched.add(key)
        return value

    def traced_put(self, key, value):
        touched.add(key)
        return original_put(self, key, value)

    lru_cache.LRUCache.get = traced_get
    lru_cache.LRUCache.put = traced_put

    import bench

    bench.main()

    # The driver also compile-checks __graft_entry__.entry() single-chip;
    # keep that program warm too.
    import jax

    from __graft_entry__ import entry

    forward, example_args = entry()
    jax.block_until_ready(jax.jit(forward)(*example_args).X)

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_compilation_cache",
    )
    # Resolve the real cache dir from the enabled config if it differs.
    import jax

    configured = jax.config.jax_compilation_cache_dir
    if configured:
        cache_dir = configured
    assert os.path.isdir(cache_dir), cache_dir

    keep = {f"{key}-cache" for key in touched}
    names = [n for n in os.listdir(cache_dir) if n.endswith("-cache")]
    pruned_dir = cache_dir + ".pruned"
    if os.path.isdir(pruned_dir):
        shutil.rmtree(pruned_dir)
    os.makedirs(pruned_dir)
    kept_bytes = 0
    for name in names:
        if name in keep:
            src = os.path.join(cache_dir, name)
            os.link(src, os.path.join(pruned_dir, name))
            kept_bytes += os.path.getsize(src)

    print(
        f"bench touched {len(touched)} cache entries; keeping "
        f"{len(keep & set(names))}/{len(names)} files "
        f"({kept_bytes / 2**20:.1f} MiB) in {pruned_dir}",
        file=sys.stderr,
    )
    print(
        "to adopt: rm -rf .jax_compilation_cache && "
        "mv .jax_compilation_cache.pruned .jax_compilation_cache",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

"""Bisect the N=216 batch-32 TPU worker fault (round-3 operational finding).

`experiments/round3_results.md` records that sampling Si 3x3x3 with batch 32
hard-faulted the TPU worker while batch 16 is fine. The fused forward's
per-grid-program VMEM footprint is batch-independent (the grid is
(batch, row_blocks); blocks are [1, R, .]), so the naive VMEM story does not
explain a batch effect — this script isolates the faulting stage:

  stage A: one jitted score-network forward at batch B
  stage B: a 10-step sampling scan at batch B
  stage C: the full 1000-step generator at batch B (only with --full)

for B in (16, 24, 32), printing a line before each dispatch so the crash
point is visible in the log. Run on the TPU when the claim is free:

  timeout 1800 python experiments/repro_batch32.py \
      --checkpoint experiments/si_3x3x3_checkpoint
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default="experiments/si_3x3x3_checkpoint")
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--natoms", type=int, default=216)
    parser.add_argument("--cell", type=float, nargs=3, default=[16.29] * 3)
    parser.add_argument("--batches", type=int, nargs="+", default=[16, 24, 32])
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--full", action="store_true",
                        help="also run the full 1000-step generator per batch")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()
    network = load_axl_network_from_checkpoint(args.checkpoint, prefer=args.prefer)
    n = args.natoms
    lattice = jnp.asarray(list(args.cell) + [0.0] * 3, jnp.float32)

    def make_batch(x, batch_size):
        return {
            NOISY_AXL_COMPOSITION: AXL(
                A=jnp.zeros((batch_size, n), jnp.int32),
                X=x,
                L=jnp.tile(lattice[None], (batch_size, 1)),
            ),
            TIME: jnp.full((batch_size, 1), 0.5),
            NOISE: jnp.full((batch_size, 1), 0.05),
            CARTESIAN_FORCES: jnp.zeros_like(x),
        }

    def forward(batch_size, key):
        x = jax.random.uniform(key, (batch_size, n, 3))
        return network(make_batch(x, batch_size))

    key = jax.random.PRNGKey(0)
    for batch_size in args.batches:
        print(f"[repro] stage A: single forward, batch {batch_size}", flush=True)
        out = forward(batch_size, key)
        jax.block_until_ready(out.X)
        print(f"[repro] stage A ok: X {out.X.shape}", flush=True)

        print(f"[repro] stage B: {args.steps}-step scan, batch {batch_size}",
              flush=True)

        def scan_body(x, step_key):
            score = network(make_batch(x, batch_size)).X
            x = (x + 1e-4 * score + 1e-3 * jax.random.normal(step_key, x.shape)) % 1.0
            return x, None

        @jax.jit
        def run_scan(key):
            x0 = jax.random.uniform(key, (batch_size, n, 3))
            keys = jax.random.split(key, args.steps)
            x_final, _ = jax.lax.scan(scan_body, x0, keys)
            return x_final

        x_final = run_scan(key)
        jax.block_until_ready(x_final)
        print(f"[repro] stage B ok: batch {batch_size}", flush=True)

    if args.full:
        print(
            "[repro] stage C: run the production generator yourself —\n"
            "  python experiments/eval_checkpoint.py --checkpoint "
            f"{args.checkpoint} --prefer {args.prefer} --sweep custom "
            f"--natoms {n} --cell {' '.join(str(c) for c in args.cell)} "
            "--samples 32 --batch 32 --correctors 3",
            flush=True,
        )

    print("[repro] all stages passed — fault not reproduced", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

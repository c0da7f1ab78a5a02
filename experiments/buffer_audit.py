"""Logical-buffer audit of the production sampling program (CPU-only).

Companion to `experiments/repro_batch32.py` (the on-TPU bisection of the
N=216 batch-32 worker fault): traces the full `LangevinGenerator.sample`
program on the CPU backend — tracing never touches the TPU — and walks the
jaxpr recursively (scan/cond/pjit bodies included), recording every
intermediate's logical size. TPU worker hard-faults of this flavor are
classically a single >2 GiB buffer (int32 byte-offset arithmetic in the
lowered program); XLA fusion can elide logical intermediates, so a hit
here is a candidate, not a verdict — but a buffer that crosses 2^31 bytes
exactly between batch 16 (passes) and batch 32 (faults) is a strong one.

Usage:
    python experiments/buffer_audit.py \
        --checkpoint experiments/si_3x3x3_checkpoint --natoms 216 \
        --cell 16.29 16.29 16.29 --batches 16 32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_subjaxprs(jaxpr):
    """Yield jaxpr and every jaxpr nested in its equations' params."""
    yield jaxpr
    for eqn in jaxpr.eqns:
        for val in eqn.params.values():
            objs = val if isinstance(val, (list, tuple)) else [val]
            for obj in objs:
                inner = getattr(obj, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    yield from iter_subjaxprs(inner)
                elif hasattr(obj, "eqns"):
                    yield from iter_subjaxprs(obj)


def audit(fn, *example_args, top=20):
    import jax

    jaxpr = jax.make_jaxpr(fn)(*example_args)
    rows = []
    for sub in iter_subjaxprs(jaxpr.jaxpr):
        for eqn in sub.eqns:
            for var in eqn.outvars:
                aval = getattr(var, "aval", None)
                if aval is None or not hasattr(aval, "shape"):
                    continue
                size = getattr(aval, "size", 0) * getattr(
                    aval.dtype, "itemsize", 4
                )
                rows.append((size, str(eqn.primitive), tuple(aval.shape),
                             str(aval.dtype)))
    rows.sort(reverse=True)
    return rows[:top], rows


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default="experiments/si_3x3x3_checkpoint")
    parser.add_argument("--prefer", default="last")
    parser.add_argument("--natoms", type=int, default=216)
    parser.add_argument("--cell", type=float, nargs="+", default=[16.29] * 3)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--batches", type=int, nargs="+", default=[16, 32])
    args = parser.parse_args(argv)

    import jax

    # Trace on CPU: the axon plugin overrides JAX_PLATFORMS at import, so
    # the platform must be pinned before backend init (same pattern as
    # tests/conftest.py) to stay off the TPU claim.
    jax.config.update("jax_platforms", "cpu")

    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )
    from experiments.probe_reheat import build_generator

    network = load_axl_network_from_checkpoint(args.checkpoint, prefer=args.prefer)

    limit = 2**31
    worst_offender = None
    for batch in args.batches:
        ns = argparse.Namespace(
            steps=args.steps, sigma_min=1e-4, sigma_max=0.2, epsilon=2.5e-8,
            natoms=args.natoms, samples=batch, correctors=args.correctors,
            cell=args.cell,
        )
        generator = build_generator(ns, network, 1.0, 0.0, num_atom_types=1)
        key = jax.random.PRNGKey(0)
        topk, rows = audit(lambda k: generator.sample(k, batch), key)
        total = sum(r[0] for r in rows)
        print(f"\n=== batch {batch}: {len(rows)} intermediates, "
              f"{total / 2**30:.2f} GiB logical total ===")
        for size, prim, shape, dtype in topk:
            flag = "  <-- >=2GiB" if size >= limit else ""
            print(f"  {size / 2**20:9.1f} MiB  {prim:24s} {dtype:10s} "
                  f"{shape}{flag}")
        over = [r for r in rows if r[0] >= limit]
        if over:
            worst_offender = (batch, over[0])
            print(f"  !! {len(over)} intermediates at or above 2^31 bytes")

    if worst_offender is not None:
        b, (size, prim, shape, dtype) = worst_offender
        print(f"\nCANDIDATE: batch {b} builds a {size / 2**30:.2f} GiB "
              f"{dtype} {shape} via {prim} — crosses the int32 byte-offset "
              f"boundary.")
    else:
        print("\nNo single intermediate >= 2 GiB at any audited batch; the "
              "fault is not a logical-buffer overflow (look at kernel "
              "grid/DMA arithmetic instead).")
    return 0


if __name__ == "__main__":
    sys.exit(main())

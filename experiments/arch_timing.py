"""Wall-clock / MFU comparison: MACE trunk vs production EGNN (VERDICT #4).

Times one jitted score-network forward for both architectures at the same
workload (Si 1x1x1: N=8 atoms, equal batch), reports per-forward latency,
XLA's analytic FLOPs, achieved TFLOP/s and MFU against the chip's bf16 peak,
plus the implied predictor-corrector sampling throughput at the production
500-step x (1+3)-forward schedule (sampler logic is ~1% of wall time at
production shapes — experiments/perf_decompose.json).

The MACE comes from its trained checkpoint (architecture of record,
32x0e+32x1o, 2 interactions, correlation 3); the EGNN is the production
4x256 trunk instantiated at N=8. FLOPs use XLA cost analysis of the timed
program (for the EGNN the dense-path twin is used, as in bench.py — the
Pallas kernel's FLOPs are invisible to cost analysis).

Usage (TPU): python experiments/arch_timing.py --batch 256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NATOMS = 8
CELL = [5.43, 5.43, 5.43]


def _time_forward(apply_fn, batch, scan_steps=50, repeats=3):
    """Per-forward seconds from a compiled `scan_steps`-step scan.

    A single dispatched forward is dominated by the remote-dispatch latency
    of the axon tunnel (~25 ms — the first version of this script measured
    1.9% "MFU" on a program the bench runs at 78%); chaining the forwards
    in one compiled lax.scan amortizes dispatch exactly the way the
    production sampler does.
    """
    import jax
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION,
    )

    x0 = batch[NOISY_AXL_COMPOSITION].X

    @jax.jit
    def run(x):
        def body(x, _):
            comp = batch[NOISY_AXL_COMPOSITION]._replace(X=x)
            out = apply_fn({**batch, NOISY_AXL_COMPOSITION: comp})
            return (x + 1e-4 * out.X) % 1.0, None

        x_final, _ = jax.lax.scan(body, x, None, length=scan_steps)
        return x_final

    jax.block_until_ready(run(x0))
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append(time.perf_counter() - start)
    return min(times) / scan_steps


def _cost_flops(fn, batch):
    import jax

    cost = jax.jit(fn).lower(batch).compile().cost_analysis()
    if cost and cost.get("flops", 0) > 0:
        return float(cost["flops"])
    return None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mace_checkpoint", default="experiments/mace_si_1x1x1_r3h_checkpoint"
    )
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--correctors", type=int, default=3)
    parser.add_argument("--out", default="experiments/arch_timing.json")
    parser.add_argument("--mace_fused", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_pieces
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
    mace_ckpt = args.mace_checkpoint
    if not os.path.isdir(mace_ckpt):
        mace_ckpt = "experiments/mace_si_1x1x1_r3_checkpoint"

    batch_size = args.batch
    lattice = jnp.asarray(CELL + [0.0] * 3, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch_size, NATOMS, 3))
    batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((batch_size, NATOMS), jnp.int32),
            X=x,
            L=jnp.tile(lattice[None], (batch_size, 1)),
        ),
        TIME: jnp.full((batch_size, 1), 0.5),
        NOISE: jnp.full((batch_size, 1), 0.05),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }

    device_kind = jax.devices()[0].device_kind
    peak = {
        "TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
        "TPU v5p": 459e12, "TPU v6 lite": 918e12,
    }.get(device_kind)

    forwards = args.steps * (1 + args.correctors)
    results = {"device_kind": device_kind, "batch": batch_size, "natoms": NATOMS,
               "schedule_forwards": forwards, "architectures": {}}

    # ----------------------------------------------------------------- MACE
    # Variants (round-5 MXU layout v1): the j_gemm edge contraction (new
    # default — no per-edge message tensor), the original messages order,
    # and j_gemm with a bfloat16 trunk (activation traffic halved; weights
    # are cast at use sites so the f32 checkpoint params are reused).
    import yaml

    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )

    mace = load_axl_network_from_checkpoint(mace_ckpt, prefer="last")
    mace_params = mace.args[0]
    with open(os.path.join(mace_ckpt, "config_backup.yaml")) as fh:
        mace_hyper = yaml.safe_load(fh)

    mace_flops = None
    for tag, overrides in [
        ("mace_messages", {"edge_contraction": "messages"}),
        ("mace_j_gemm", {"edge_contraction": "j_gemm"}),
        ("mace_j_gemm_bf16",
         {"edge_contraction": "j_gemm", "compute_dtype": "bfloat16"}),
        ("mace_messages_bf16",
         {"edge_contraction": "messages", "compute_dtype": "bfloat16"}),
    ]:
        hyper = yaml.safe_load(yaml.safe_dump(mace_hyper))
        hyper["model"]["score_network"].update(overrides)
        variant_network, _ = load_diffusion_model(hyper)
        variant_fn = lambda b: variant_network.apply(mace_params, b, False)
        variant_t = _time_forward(variant_fn, batch)
        if mace_flops is None:
            mace_flops = _cost_flops(variant_fn, batch)
        results["architectures"][tag] = {
            "checkpoint": mace_ckpt,
            "forward_ms": round(variant_t * 1e3, 3),
            "flops_per_forward": mace_flops,
            "samples_per_s_500x4": round(batch_size / (forwards * variant_t), 3),
            "mfu": round(mace_flops / variant_t / peak, 5)
            if (mace_flops and peak) else None,
        }
        print(tag + ":", results["architectures"][tag], flush=True)
    results["architectures"]["mace"] = results["architectures"]["mace_j_gemm"]

    if args.mace_fused:
        # Same checkpoint parameters through the Pallas-fused edge pipeline
        # (models/mace_edge_fused.py); FLOPs are algebraically identical to
        # the dense program, so the dense cost analysis carries over.
        hyper = yaml.safe_load(yaml.safe_dump(mace_hyper))
        hyper["model"]["score_network"]["use_fused_edge_kernel"] = True
        fused_network, _ = load_diffusion_model(hyper)
        fused_t = _time_forward(
            lambda b: fused_network.apply(mace_params, b, False), batch
        )
        results["architectures"]["mace_fused_edge"] = {
            "checkpoint": mace_ckpt,
            "forward_ms": round(fused_t * 1e3, 3),
            "flops_per_forward": mace_flops,
            "samples_per_s_500x4": round(batch_size / (forwards * fused_t), 3),
            "mfu": round(mace_flops / fused_t / peak, 5)
            if (mace_flops and peak) else None,
        }
        print("mace_fused_edge:",
              results["architectures"]["mace_fused_edge"], flush=True)

    # ----------------------------------------------------------------- EGNN
    network, params, _ = _flagship_pieces(
        batch_size=batch_size, natoms=NATOMS, n_layers=4, hidden=256
    )
    egnn_t = _time_forward(lambda b: network.apply(params, b, False), batch)

    dense_config = type(network.config)(
        **{
            **{
                f: getattr(network.config, f)
                for f in network.config.__dataclass_fields__
            },
            "use_fused_message_block": False,
        }
    )
    dense_network = type(network)(dense_config)
    dense_params = dense_network.init(jax.random.PRNGKey(0), batch, False)
    egnn_flops = _cost_flops(
        lambda b: dense_network.apply(dense_params, b, False), batch
    )
    results["architectures"]["egnn_4x256"] = {
        "forward_ms": round(egnn_t * 1e3, 3),
        "flops_per_forward": egnn_flops,
        "samples_per_s_500x4": round(batch_size / (forwards * egnn_t), 3),
        "mfu": round(egnn_flops / egnn_t / peak, 5)
        if (egnn_flops and peak) else None,
    }
    print("egnn:", results["architectures"]["egnn_4x256"], flush=True)

    mace_entry = results["architectures"]["mace"]
    egnn_entry = results["architectures"]["egnn_4x256"]
    results["egnn_over_mace_speed"] = round(
        mace_entry["forward_ms"] / egnn_entry["forward_ms"], 2
    )

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

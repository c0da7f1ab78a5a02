"""Stage-level MACE cost breakdown on TPU (VERDICT r3 item #6).

The round-3 arch timing pinned the MACE forward at 6.97 ms / 3.6% MFU
(fp32 trunk, measured against the bf16 peak) vs the fused EGNN's 2.07 ms.
This profiler decomposes the forward into its pipeline stages and times
each as its own scan-amortized compiled program at the *same* workload
(B=256, N=8, J=N*27 images, 32x0e+32x1o, correlation 3, lmax 3) so the
optimization target is measured, not guessed:

  edge_radial     bessel + polynomial cutoff + RadialMLP -> tp weights
  edge_tp         weighted tensor product (messages) + J-aggregation
  node_linear     IrrepsLinear up/down projections
  product_basis   symmetric contraction (correlation<=3) + linears
  full            the whole score-network forward (reference number)

Each stage runs on realistic tensor shapes with its own parameters; the sum
of stages is expected to bracket the full forward (XLA fuses across stage
boundaries in the full program, so sum >= full is normal).

Also times the full forward with a bfloat16 trunk (config flip only) to
separate the dtype effect from the structural one.

Usage (TPU): python experiments/mace_profile.py --batch 256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NATOMS = 8
CELL = [5.43, 5.43, 5.43]


def _scan_time(fn, x0, scan_steps=50, repeats=3, mix=None):
    """Per-call seconds for fn, amortized over a compiled scan.

    mix: function (x, out) -> next x keeping a data dependence between
    iterations so XLA cannot hoist the body out of the scan.
    """
    import jax

    @jax.jit
    def run(x):
        def body(x, _):
            out = fn(x)
            return mix(x, out), None

        x_final, _ = jax.lax.scan(body, x, None, length=scan_steps)
        return x_final

    jax.block_until_ready(run(x0))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        times.append((time.perf_counter() - t0) / scan_steps)
    return min(times)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--scan_steps", type=int, default=50)
    parser.add_argument("--out", default="experiments/mace_profile.json")
    parser.add_argument(
        "--checkpoint", default="experiments/mace_si_1x1x1_r3h_checkpoint"
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.mace_modules import (
        RadialMLP,
        SymmetricContraction,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.irreps_layers import (
        IrrepsLinear,
        bessel_basis,
        polynomial_cutoff,
        tensor_product_paths,
        weighted_tensor_product,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.ops.so3 import (
        Irreps,
        spherical_harmonics,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    B, N = args.batch, NATOMS
    K = 27  # image copies (shells=1)
    J = N * K
    lmax = 3
    irreps_feats = Irreps("32x0e+32x1o")
    irreps_target = Irreps("32x0e+32x1o+32x2e+32x3o")
    paths = tensor_product_paths(irreps_feats, lmax, irreps_target)
    channels = 32
    radial_mlp = (64, 64, 64)
    num_bessel = 8
    r_max = 4.5

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    distances = jax.random.uniform(keys[0], (B, N, J), jnp.float32, 0.5, 6.0)
    unit = jax.random.normal(keys[1], (B, N, J, 3))
    unit = unit / jnp.linalg.norm(unit, axis=-1, keepdims=True)
    harmonics = spherical_harmonics(lmax, unit)  # [B,N,J,(lmax+1)^2]
    feats = jax.random.normal(keys[2], (B, N, irreps_feats.dim))
    pair_mask = distances <= r_max

    results = {}

    # ---------------- stage: edge radial (bessel+cutoff+MLP) ----------------
    radial_module = RadialMLP(radial_mlp, len(paths) * channels)
    radial_params = radial_module.init(
        keys[3], jnp.zeros((1, 1, 1, num_bessel))
    )

    def edge_radial(d):
        rb = bessel_basis(d, r_max, num_bessel)
        env = polynomial_cutoff(d, r_max, 5)
        return radial_module.apply(radial_params, rb * env[..., None])

    results["edge_radial_ms"] = 1e3 * _scan_time(
        edge_radial, distances, args.scan_steps,
        mix=lambda d, out: d + 1e-6 * out[..., 0],
    )

    # ---------------- stage: edge tensor product + aggregation ----------------
    tp_weights = jax.random.normal(keys[4], (B, N, J, len(paths) * channels))
    src = jnp.broadcast_to(
        jnp.repeat(feats, K, axis=1)[:, None, :, :], (B, N, J, irreps_feats.dim)
    )

    def edge_tp(w):
        messages = weighted_tensor_product(
            src, harmonics, w * pair_mask[..., None], irreps_feats, lmax,
            irreps_target, paths=paths,
        )
        return jnp.sum(messages, axis=2)

    results["edge_tp_ms"] = 1e3 * _scan_time(
        edge_tp, tp_weights, args.scan_steps,
        mix=lambda w, out: w + 1e-6 * jnp.mean(out),
    )

    # ---------------- stage: node linears ----------------
    linear = IrrepsLinear(str(irreps_target), str(irreps_target))
    linear_params = linear.init(keys[5], jnp.zeros((1, 1, irreps_target.dim)))
    node_target = jax.random.normal(keys[6], (B, N, irreps_target.dim))

    results["node_linear_ms"] = 1e3 * _scan_time(
        lambda x: linear.apply(linear_params, x), node_target, args.scan_steps,
        mix=lambda x, out: x + 1e-6 * out,
    )

    # ---------------- stage: product basis (symmetric contraction) ----------------
    product = SymmetricContraction(
        irreps_a=str(irreps_target),
        irreps_out=str(irreps_feats),
        correlation=3,
        num_elements=2,
    )
    node_attrs = jax.nn.one_hot(
        jnp.zeros((B, N), jnp.int32), 2, dtype=jnp.float32
    )
    product_params = product.init(keys[7], node_target, node_attrs)

    results["product_basis_ms"] = 1e3 * _scan_time(
        lambda x: product.apply(product_params, x, node_attrs),
        node_target, args.scan_steps,
        mix=lambda x, out: x + 1e-6 * jnp.pad(
            out, [(0, 0), (0, 0), (0, irreps_target.dim - out.shape[-1])]
        ),
    )

    # ---------------- full forwards from the trained checkpoint ----------------
    import yaml

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    lattice = jnp.asarray(CELL + [0.0] * 3, jnp.float32)
    x0 = jax.random.uniform(jax.random.PRNGKey(9), (B, N, 3))
    batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((B, N), jnp.int32),
            X=x0,
            L=jnp.tile(lattice[None], (B, 1)),
        ),
        TIME: jnp.full((B, 1), 0.5),
        NOISE: jnp.full((B, 1), 0.05),
        CARTESIAN_FORCES: jnp.zeros_like(x0),
    }

    def time_network(apply_fn):
        def fn(x):
            comp = batch[NOISY_AXL_COMPOSITION]._replace(X=x)
            return apply_fn({**batch, NOISY_AXL_COMPOSITION: comp})

        return 1e3 * _scan_time(
            fn, x0, args.scan_steps,
            mix=lambda x, out: (x + 1e-4 * out.X) % 1.0,
        )

    fp32_network = load_axl_network_from_checkpoint(args.checkpoint, prefer="last")
    params = fp32_network.args[0]
    results["full_fp32_ms"] = time_network(fp32_network)

    with open(os.path.join(args.checkpoint, "config_backup.yaml")) as fh:
        hyper = yaml.safe_load(fh)
    hyper["model"]["score_network"]["compute_dtype"] = "bfloat16"
    bf16_network, _ = load_diffusion_model(hyper)
    results["full_bf16_ms"] = time_network(
        lambda b: bf16_network.apply(params, b, False)
    )

    # Pallas-fused edge pipeline (same params — checkpoint-compatible).
    hyper["model"]["score_network"]["compute_dtype"] = "float32"
    hyper["model"]["score_network"]["use_fused_edge_kernel"] = True
    fused_network, _ = load_diffusion_model(hyper)
    results["full_fused_ms"] = time_network(
        lambda b: fused_network.apply(params, b, False)
    )
    out_dense = fp32_network(batch)
    out_fused = fused_network.apply(params, batch, False)
    import numpy as np

    results["fused_max_abs_diff_X"] = float(
        np.abs(np.asarray(out_fused.X) - np.asarray(out_dense.X)).max()
    )

    stage_sum = (
        2 * (results["edge_radial_ms"] + results["edge_tp_ms"])
        + 4 * results["node_linear_ms"]
        + 2 * results["product_basis_ms"]
    )
    results["stage_sum_2x_interactions_ms"] = stage_sum
    print(json.dumps(results, indent=1), flush=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()

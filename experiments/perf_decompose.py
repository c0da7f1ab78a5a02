"""Decompose the production-sampler wall time: network vs sampler logic.

Three measurements at the production shape (batch 32, 64 atoms, EGNN 4x256):

  A. full 1000-step PC trajectory (3000 network forwards) via the scan;
  B. one jitted network forward, timed tightly -> expected network-only cost
     (x 3000);
  C. the same trajectory with the network replaced by a zero-output stub ->
     pure sampler-logic cost (D3PM posterior, X/L updates, noise tables).

A ~= 3000*B + C means the network dominates and kernel work pays off;
A >> 3000*B + C means dispatch/pipeline overheads dominate instead.

Usage: python experiments/perf_decompose.py [--steps 250]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NATOMS = 64


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=250)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--hidden", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from __graft_entry__ import _flagship_pieces

    BATCH = args.batch
    network, params, example_batch = _flagship_pieces(
        batch_size=BATCH, natoms=NATOMS, n_layers=4, hidden=args.hidden
    )
    axl_network = functools.partial(network.apply, params)

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps, schedule_type="linear",
        sigma_min=1e-4, sigma_max=0.2,
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1, number_of_atoms=NATOMS, number_of_samples=BATCH,
        number_of_corrector_steps=2, use_fixed_lattice_parameters=True,
        cell_dimensions=[10.86, 10.86, 10.86], record_samples=False,
    )

    def timed(fn, *fn_args, repeats=3):
        out = fn(*fn_args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*fn_args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # A: full trajectory.
    generator = LangevinGenerator(
        noise_parameters, sampling_parameters, axl_network
    )
    seconds_full = timed(
        lambda: generator.sample(jax.random.PRNGKey(1), BATCH).X, repeats=2
    )

    # B: network-only cost. A single host-driven call is dominated by
    # dispatch/tunnel latency (~30 ms on the axon remote TPU), which the
    # scan never pays — so measure a chained program of 30 forwards (the
    # output feeds a dummy dependency to serialize them) and divide.
    CHAIN = 30

    def chained(batch):
        def body(_, carry):
            out = network.apply(params, carry, False)
            comp = batch["noisy_axl"]
            perturbed = comp._replace(X=(comp.X + 1e-6 * out.X) % 1.0)
            new_batch = dict(batch)
            new_batch["noisy_axl"] = perturbed
            return new_batch

        import jax.lax as lax

        final = lax.fori_loop(0, CHAIN, body, batch)
        return final["noisy_axl"].X

    chained_jit = jax.jit(chained)
    single = timed(lambda: chained_jit(example_batch), repeats=5) / CHAIN
    dispatched_forward = jax.jit(lambda b: network.apply(params, b, False))
    single_dispatched = timed(
        lambda: dispatched_forward(example_batch).X, repeats=10
    )
    forwards = args.steps * 3

    # C: stub network trajectory.
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        NOISY_AXL_COMPOSITION,
    )

    def stub_network(batch, conditional=False):
        composition = batch[NOISY_AXL_COMPOSITION]
        return AXL(
            A=jnp.zeros(
                composition.A.shape + (2,), dtype=jnp.float32
            ).at[..., -1].set(-jnp.inf),
            X=jnp.zeros_like(composition.X),
            L=jnp.zeros_like(composition.L),
        )

    stub_generator = LangevinGenerator(
        noise_parameters, sampling_parameters, stub_network
    )
    seconds_stub = timed(
        lambda: stub_generator.sample(jax.random.PRNGKey(1), BATCH).X, repeats=2
    )

    result = {
        "steps": args.steps,
        "trajectory_s": round(seconds_full, 3),
        "single_forward_s": round(single, 6),
        "host_dispatched_forward_s": round(single_dispatched, 6),
        "network_only_s": round(single * forwards, 3),
        "stub_trajectory_s": round(seconds_stub, 3),
        "unexplained_s": round(
            seconds_full - single * forwards - seconds_stub, 3
        ),
        "network_fraction": round(single * forwards / seconds_full, 3),
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "perf_decompose.json")
    json.dump(result, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()

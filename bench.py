"""Headline benchmark: Si 2x2x2 predictor-corrector sampling throughput.

Measures the production sampling configuration (BASELINE.md): 1000 noise
steps x (1 predictor + 2 corrector) = 3000 EGNN forwards per trajectory,
batch of 32 samples, 64 atoms, EGNN 4 layers x 256 hidden with a 7.5 A
radial cutoff — the whole trajectory is one compiled lax.scan resident on
the accelerator.

vs_baseline: the reference drives the same 3000 forwards from a Python loop
with per-step host round-trips (predictor_corrector_axl_generator.py:112-147).
Since the reference publishes no numbers, the baseline is measured here, on
the same hardware and the same network, as an eager per-step host-driven loop
(jitted network forward, python loop over steps — exactly the reference's
execution architecture), extrapolated from a short run. vs_baseline is the
scan throughput divided by that loop throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_STEPS = 1000
N_CORRECTORS = 2
BATCH = 32
NATOMS = 64
BASELINE_PROBE_STEPS = 25


def build_generator_and_network(record=False):
    import jax

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from __graft_entry__ import _flagship_pieces

    network, params, _ = _flagship_pieces(
        batch_size=BATCH, natoms=NATOMS, n_layers=4, hidden=256
    )
    axl_network = functools.partial(network.apply, params)

    noise_parameters = NoiseParameters(
        total_time_steps=N_STEPS,
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        number_of_samples=BATCH,
        number_of_corrector_steps=N_CORRECTORS,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[10.86, 10.86, 10.86],
        record_samples=record,
    )
    generator = LangevinGenerator(noise_parameters, sampling_parameters, axl_network)
    return generator, axl_network


def time_scan_sampler(generator):
    import jax

    key = jax.random.PRNGKey(0)
    # Compile.
    samples = generator.sample(key, BATCH)
    jax.block_until_ready(samples.X)
    # Measure.
    t0 = time.perf_counter()
    samples = generator.sample(jax.random.PRNGKey(1), BATCH)
    jax.block_until_ready(samples.X)
    elapsed = time.perf_counter() - t0
    assert bool((samples.A != 1).all()), "benchmark sample left MASK atoms"
    return elapsed


def time_reference_style_loop(generator):
    """Host-driven per-step loop (the reference's execution architecture)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(2)
    composition = generator.initialize(key, BATCH)

    predictor = jax.jit(generator.predictor_step)
    corrector = jax.jit(generator.corrector_step)

    # Compile both step programs.
    comp, _ = predictor(key, composition, jnp.asarray(N_STEPS - 1))
    comp, _ = corrector(key, comp, jnp.asarray(N_STEPS - 1))
    jax.block_until_ready(comp.X)

    t0 = time.perf_counter()
    comp = composition
    for i in range(N_STEPS - 1, N_STEPS - 1 - BASELINE_PROBE_STEPS, -1):
        key, k1 = jax.random.split(key)
        idx = jnp.asarray(i)
        comp, _ = predictor(k1, comp, idx)
        for _ in range(N_CORRECTORS):
            key, k2 = jax.random.split(key)
            comp, _ = corrector(k2, comp, idx)
        # The reference's loop synchronizes with the host every step
        # (tqdm + per-step tensor bookkeeping).
        jax.block_until_ready(comp.X)
    elapsed = time.perf_counter() - t0
    return elapsed * (N_STEPS / BASELINE_PROBE_STEPS)


def main():
    generator, _ = build_generator_and_network()

    scan_seconds = time_scan_sampler(generator)
    loop_seconds = time_reference_style_loop(generator)

    throughput = BATCH / scan_seconds
    loop_throughput = BATCH / loop_seconds

    result = {
        "metric": (
            "Si 2x2x2 PC sampling throughput "
            f"({N_STEPS} steps x (1+{N_CORRECTORS}), EGNN 4x256, batch {BATCH})"
        ),
        "value": round(throughput, 4),
        "unit": "samples/s",
        "vs_baseline": round(throughput / loop_throughput, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

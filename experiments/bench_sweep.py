"""Throughput sweep for the production sampler: batch size x message path.

Finds the throughput-optimal sampling configuration on the attached chip and
records MFU per point. The headline bench.py measures the reference's
production shape (batch 32); this sweep answers "how fast CAN the chip go"
— sample-throughput scales with batch until HBM or VMEM saturates, and the
driver's sample-sharding multiplies whatever this finds by the mesh size.

Usage:
    python experiments/bench_sweep.py [--batches 32,64,128,256] [--steps 250]

Writes experiments/bench_sweep.json (a list of points, appended per run).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NATOMS = 64
N_CORRECTORS = 2


def measure_point(batch, steps, use_fused, peak_flops):
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
        batch_size=batch, natoms=NATOMS, n_layers=4, hidden=256,
        use_fused_message_block=use_fused,
    )
    axl_network = functools.partial(network.apply, params)
    noise_parameters = NoiseParameters(
        total_time_steps=steps, schedule_type="linear",
        sigma_min=1e-4, sigma_max=0.2,
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=NATOMS,
        number_of_samples=batch,
        number_of_corrector_steps=N_CORRECTORS,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[10.86, 10.86, 10.86],
        record_samples=False,
    )
    generator = LangevinGenerator(
        noise_parameters, sampling_parameters, axl_network
    )

    key = jax.random.PRNGKey(0)
    samples = generator.sample(key, batch)  # compile
    jax.block_until_ready(samples.X)
    t0 = time.perf_counter()
    samples = generator.sample(jax.random.PRNGKey(1), batch)
    jax.block_until_ready(samples.X)
    elapsed = time.perf_counter() - t0

    # Scale to the production 1000-step trajectory for comparability.
    full_trajectory_seconds = elapsed * (1000.0 / steps)
    throughput = batch / full_trajectory_seconds

    from bench import analytic_flops_per_trajectory

    flops32 = analytic_flops_per_trajectory()
    point = {
        "batch": batch,
        "steps_measured": steps,
        "use_fused": use_fused,
        "seconds_per_1000step_trajectory": round(full_trajectory_seconds, 3),
        "samples_per_s": round(throughput, 4),
    }
    if flops32 is not None:
        flops = flops32 * batch / 32.0
        achieved = flops / full_trajectory_seconds
        point["achieved_tflops_per_s"] = round(achieved / 1e12, 2)
        if peak_flops:
            point["mfu"] = round(achieved / peak_flops, 4)
    return point


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="32,64,128,256")
    parser.add_argument("--steps", type=int, default=250)
    parser.add_argument("--dense-too", action="store_true")
    args = parser.parse_args()

    import jax

    from bench import _PEAK_FLOPS_BY_DEVICE_KIND

    device_kind = jax.devices()[0].device_kind
    peak = _PEAK_FLOPS_BY_DEVICE_KIND.get(device_kind)
    print(f"device: {device_kind}, peak bf16: {peak}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_sweep.json")
    results = []
    if os.path.exists(path):
        results = json.load(open(path))
    for batch in [int(b) for b in args.batches.split(",")]:
        variants = [True, False] if args.dense_too else [True]
        for use_fused in variants:
            point = measure_point(batch, args.steps, use_fused, peak)
            point["device_kind"] = device_kind
            print(json.dumps(point))
            results.append(point)
            json.dump(results, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

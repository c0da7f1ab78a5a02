"""Bisect the reproducible c8/n=216 TPU `UNAVAILABLE` scan fault (round 5).

Round-4 facts: the Si 3x3x3 eval with 8 corrector substeps (9 network
applications per time step x 250 steps per compiled scan call) killed the
TPU with `UNAVAILABLE` twice in its first batch, while 6 correctors (7
applications, ~50 s/call) at identical shapes runs clean. Two hypotheses:

  SIZE: the compiled program's application count (2250 vs 1750) crosses a
        device/program limit -> batch-independent.
  TIME: single-call execution time (~64 s vs ~50 s) crosses an RPC/watchdog
        limit of the remote-TPU tunnel -> halving batch halves the time and
        should run clean at the same program size.

Each invocation runs ONE trial (a fault can wedge the device, so trials are
isolated per process and orchestrated by experiments/queue_r5a.sh with a
wait_for_tpu between them) and appends one JSON record to --out.

Usage:
    python experiments/repro_c8_fault.py --correctors 8 --chunk 250 \
        --batch 16 --steps 1000 --name c8_b16_k250 \
        --out experiments/c8_bisection_r5.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKPOINT = "experiments/si_3x3x3_checkpoint_r3l_fused"
NATOMS = 216
CELL = [16.29, 16.29, 16.29]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--name", required=True)
    parser.add_argument("--correctors", type=int, required=True)
    parser.add_argument("--chunk", type=int, required=True,
                        help="max_steps_per_call (0 = auto policy)")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--checkpoint", default=CHECKPOINT)
    parser.add_argument("--natoms", type=int, default=NATOMS)
    parser.add_argument("--no_force_field", action="store_true")
    parser.add_argument("--out", default="experiments/c8_bisection_r5.json")
    args = parser.parse_args(argv)

    import jax

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.restore import (
        load_axl_network_from_checkpoint,
    )

    enable_persistent_compilation_cache()
    axl_network = load_axl_network_from_checkpoint(args.checkpoint, prefer="last")
    if not args.no_force_field:
        # Same wrapper as the failing eval (FF 1.5/20).
        from _ff_partial import wrap_force_field

        axl_network = wrap_force_field(axl_network, 1.5, 20.0)

    noise_parameters = NoiseParameters(
        total_time_steps=args.steps,
        schedule_type="linear",
        sigma_min=1e-4,
        sigma_max=0.2,
        corrector_step_epsilon=2.5e-8,
        corrector_r=0.17,
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        algorithm="predictor_corrector",
        number_of_corrector_steps=args.correctors,
        noise_temperature=1.3,
        temperature_sigma_max=0.01332947938261649,
        num_atom_types=1,
        number_of_atoms=args.natoms,
        number_of_samples=args.batch,
        use_fixed_lattice_parameters=True,
        cell_dimensions=CELL,
        record_samples=False,
        max_steps_per_call=args.chunk,
    )
    generator = LangevinGenerator(noise_parameters, sampling_parameters, axl_network)

    applications = (1 + args.correctors) * generator.max_steps_per_call
    record = {
        "name": args.name,
        "correctors": args.correctors,
        "chunk_requested": args.chunk,
        "chunk_effective": generator.max_steps_per_call,
        "batch": args.batch,
        "steps": args.steps,
        "natoms": args.natoms,
        "applications_per_program": applications,
    }
    print(f"trial {args.name}: {json.dumps(record)}", flush=True)

    key = jax.random.PRNGKey(20260820)
    t0 = time.time()
    try:
        samples = generator.sample(key, args.batch)
        jax.block_until_ready(samples.X)
        record["ok"] = True
        record["seconds"] = round(time.time() - t0, 2)
        ncalls = -(-args.steps // generator.max_steps_per_call)
        record["seconds_per_call"] = round(record["seconds"] / ncalls, 2)
        import numpy as np

        record["x_finite"] = bool(np.isfinite(np.asarray(samples.X)).all())
    except Exception as err:  # noqa: BLE001 — the fault class IS the datum
        record["ok"] = False
        record["seconds"] = round(time.time() - t0, 2)
        record["error"] = f"{type(err).__name__}: {str(err)[:300]}"

    results = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            results = json.load(fh)
    results.append(record)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(record), flush=True)
    sys.exit(0 if record["ok"] else 1)


if __name__ == "__main__":
    main()

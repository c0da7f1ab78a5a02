"""Generate golden parity values by RUNNING the reference's torch code.

Executes the reference implementation (path set by REFERENCE_SRC, default
/root/reference/src) of the noise scheduler, the wrapped-Gaussian
sigma-normalized score and the D3PM posterior on fixed inputs, and stores
the outputs in reference_golden.npz. tests/test_reference_golden.py then
checks this framework's JAX implementations against those numbers — direct,
value-level parity evidence against the reference, not a re-derivation.

Run (requires torch and the reference checkout):
    python tests/golden/generate_reference_golden.py
"""

import os
import sys

import numpy as np

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")
sys.path.insert(0, REFERENCE_SRC)

import torch  # noqa: E402

from diffusion_for_multi_scale_molecular_dynamics.noise_schedulers.noise_parameters import (  # noqa: E402
    NoiseParameters,
)
from diffusion_for_multi_scale_molecular_dynamics.noise_schedulers.noise_scheduler import (  # noqa: E402
    NoiseScheduler,
)
from diffusion_for_multi_scale_molecular_dynamics.score.wrapped_gaussian_score import (  # noqa: E402
    get_coordinates_sigma_normalized_score,
)
from diffusion_for_multi_scale_molecular_dynamics.utils.d3pm_utils import (  # noqa: E402
    get_probability_at_previous_time_step,
)

torch.manual_seed(0)
out = {}

# --- 1. Noise tables: both schedule types, two sizes, several num_classes.
for schedule_type in ("exponential", "linear"):
    for total in (10, 100):
        params = NoiseParameters(
            total_time_steps=total,
            schedule_type=schedule_type,
            sigma_min=0.0021,
            sigma_max=0.4,
            corrector_step_epsilon=2e-5,
        )
        scheduler = NoiseScheduler(params, num_classes=3)
        noise, langevin = scheduler.get_all_sampling_parameters()
        tag = f"noise_{schedule_type}_{total}"
        for field in noise._fields:
            out[f"{tag}_{field}"] = getattr(noise, field).numpy()
        out[f"{tag}_langevin_epsilon"] = langevin.epsilon.numpy()
        out[f"{tag}_langevin_sqrt_2_epsilon"] = langevin.sqrt_2_epsilon.numpy()

# --- 2. Wrapped-Gaussian sigma-normalized score across the three numerical
# regimes (sigma around the 1/sqrt(2 pi) threshold) and the full u range.
u = torch.linspace(0.001, 0.999, 41, dtype=torch.float64)
sigmas = torch.tensor(
    [0.0021, 0.01, 0.05, 0.19, 0.3989, 0.3990, 0.6, 1.5], dtype=torch.float64
)
grid_u, grid_sigma = torch.meshgrid(u, sigmas, indexing="ij")
scores = get_coordinates_sigma_normalized_score(
    grid_u.reshape(-1, 1, 1), grid_sigma.reshape(-1, 1, 1), kmax=4
)
out["wrapped_score_u"] = grid_u.reshape(-1).numpy()
out["wrapped_score_sigma"] = grid_sigma.reshape(-1).numpy()
out["wrapped_score_values"] = scores.reshape(-1).numpy()

# --- 3. D3PM posterior on random probabilities/Q-matrices.
nsamples, natoms, nclasses = 4, 5, 3
logits = torch.randn(nsamples, natoms, nclasses, dtype=torch.float64)
onehot = torch.nn.functional.one_hot(
    torch.randint(0, nclasses, (nsamples, natoms)), nclasses
).to(torch.float64)
q = torch.rand(nsamples, natoms, nclasses, nclasses, dtype=torch.float64)
q = q / q.sum(-1, keepdim=True)
q_bar = torch.rand(nsamples, natoms, nclasses, nclasses, dtype=torch.float64)
q_bar = q_bar / q_bar.sum(-1, keepdim=True)
q_bar_tm1 = torch.rand(nsamples, natoms, nclasses, nclasses, dtype=torch.float64)
q_bar_tm1 = q_bar_tm1 / q_bar_tm1.sum(-1, keepdim=True)
posterior = get_probability_at_previous_time_step(
    logits, onehot, q, q_bar, q_bar_tm1,
    small_epsilon=1e-12, probability_at_zeroth_timestep_are_logits=True,
)
out["d3pm_logits"] = logits.numpy()
out["d3pm_onehot"] = onehot.numpy()
out["d3pm_q"] = q.numpy()
out["d3pm_q_bar"] = q_bar.numpy()
out["d3pm_q_bar_tm1"] = q_bar_tm1.numpy()
out["d3pm_posterior"] = posterior.numpy()

target = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_golden.npz")
np.savez_compressed(target, **out)
print(f"wrote {target} with {len(out)} arrays")

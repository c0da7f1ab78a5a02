"""Repaint: a tutorial (runnable script).

The TPU-native counterpart of the reference's ``tutorials/repaint_02.ipynb``
(/root/reference): inpainting on a simple 2-dimensional problem with an
*analytical* score model that needs no training — the effective dataset is
an isotropic Gaussian of width ``SIGMA_D`` around a regular 2D grid, for
which the exact score is available in closed form
(models/analytical_score_network.py).

We draw free samples, then constrained samples where half of the grid atoms
are pinned through the RePaint overwrite
(generators/constrained_langevin_generator.py), and plot both next to the
equilibrium grid. Runs on CPU in a couple of minutes:

    JAX_PLATFORMS=cpu python tutorials/tutorial_02_repaint.py
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTPUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output",
                      "tutorial_repaint")

GRID = 4          # GRID x GRID equilibrium sites
SIGMA_D = 0.02    # effective dataset width
N_SAMPLES = 8


def main():
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        LangevinGenerator,
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.constrained_langevin_generator import (
        ConstrainedLangevinGenerator,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators.sampling_constraint import (
        SamplingConstraint,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.analytical_score_network import (
        AnalyticalScoreNetwork,
        AnalyticalScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    os.makedirs(OUTPUT, exist_ok=True)

    # --- the effective dataset: a Gaussian around a regular 2D grid ---
    ticks = (np.arange(GRID) + 0.5) / GRID
    equilibrium = np.stack(
        np.meshgrid(ticks, ticks, indexing="ij"), -1
    ).reshape(-1, 2)
    n_atoms = len(equilibrium)

    # --- the analytical score model (no training needed) ---
    config = AnalyticalScoreNetworkConfig(
        num_atom_types=1,
        number_of_atoms=n_atoms,
        kmax=4,
        equilibrium_relative_coordinates=tuple(
            tuple(row) for row in equilibrium.tolist()
        ),
        sigma_d=SIGMA_D,
        spatial_dimension=2,
    )
    axl_network = functools.partial(AnalyticalScoreNetwork(config).apply, {})

    noise_parameters = NoiseParameters(
        total_time_steps=150, schedule_type="linear",
        sigma_min=1e-3, sigma_max=0.5,
        corrector_step_epsilon="auto",  # 2.5 * sigma_min^2 = 2.5e-6
    )
    sampling_parameters = PredictorCorrectorSamplingParameters(
        num_atom_types=1,
        number_of_atoms=n_atoms,
        number_of_samples=N_SAMPLES,
        number_of_corrector_steps=2,
        spatial_dimension=2,
        use_fixed_lattice_parameters=True,
        cell_dimensions=[1.0, 1.0],
    )

    # --- free sampling ---
    generator = LangevinGenerator(
        noise_parameters, sampling_parameters, axl_network
    )
    free = np.asarray(generator.sample(jax.random.PRNGKey(0), N_SAMPLES).X)

    # --- constrained sampling: pin the left half of the grid ---
    constrained_idx = np.where(equilibrium[:, 0] < 0.5)[0]
    constraint = SamplingConstraint(
        elements=["A"],
        constrained_relative_coordinates=equilibrium[constrained_idx].astype(
            np.float32
        ),
        constrained_atom_types=np.zeros(len(constrained_idx), np.int32),
        constrained_indices=constrained_idx.astype(np.int32),
    )
    constrained_generator = ConstrainedLangevinGenerator(
        noise_parameters, sampling_parameters, axl_network, constraint
    )
    constrained = np.asarray(
        constrained_generator.sample(jax.random.PRNGKey(1), N_SAMPLES).X
    )

    # --- figures ---
    for name, samples in (("free", free), ("constrained", constrained)):
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(equilibrium[:, 0], equilibrium[:, 1], s=250,
                   facecolors="none", edgecolors="tab:blue",
                   label="equilibrium sites")
        ax.scatter(samples[..., 0].ravel(), samples[..., 1].ravel(), s=25,
                   alpha=0.7, color="tab:red", label=f"{name} samples")
        if name == "constrained":
            ax.scatter(equilibrium[constrained_idx, 0],
                       equilibrium[constrained_idx, 1], s=60, marker="x",
                       color="k", label="pinned atoms")
        ax.set_xlim(0, 1); ax.set_ylim(0, 1); ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=8)
        ax.set_title(f"{name} diffusion samples ({N_SAMPLES} draws)")
        path = os.path.join(OUTPUT, f"{name}_samples.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print("wrote", path)

    # --- quantitative check, mirroring the notebook's visual one ---
    def site_errors(x):
        delta = x[:, :, None, :] - equilibrium[None, None, :, :]
        delta -= np.round(delta)
        return np.linalg.norm(delta, axis=-1).min(axis=-1)

    print(f"free: median distance to nearest site "
          f"{np.median(site_errors(free)):.4f} (sigma_d={SIGMA_D})")
    exact = np.abs(
        constrained[:, constrained_idx] - equilibrium[None, constrained_idx]
    ).max()
    print(f"constrained: pinned atoms exact to {exact:.2e}; free atoms "
          f"median site distance "
          f"{np.median(site_errors(constrained)):.4f}")
    assert exact < 1e-6


if __name__ == "__main__":
    main()

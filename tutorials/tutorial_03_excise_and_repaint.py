"""Excise and repaint: a tutorial (runnable script).

The TPU-native counterpart of the reference's
``tutorials/excise_and_repaint_03.ipynb`` (/root/reference): choose the most
"uncertain" atom of a 2D system, excise it with its nearest neighbors,
embed the excised environment in a smaller box, and use the analytical
diffusion model to generate new samples conditioned on those atoms — the
candidate-generation flow of the active-learning loop
(active_learning/sample_maker.py::ExciseAndRepaintSampleMaker), driven
step by step. Runs on CPU in a couple of minutes:

    JAX_PLATFORMS=cpu python tutorials/tutorial_03_excise_and_repaint.py
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUTPUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output",
                      "tutorial_excise_and_repaint")

GRID = 4
SIGMA_D = 0.02


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.atom_selector import (
        TopKAtomSelector,
        TopKAtomSelectorArguments,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.excisor import (
        NearestNeighborsExcision,
        NearestNeighborsExcisionArguments,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.active_learning.sample_maker import (
        ExciseAndRepaintSampleMaker,
        ExciseAndRepaintSampleMakerArguments,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.generators import (
        PredictorCorrectorSamplingParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.analytical_score_network import (
        AnalyticalScoreNetwork,
        AnalyticalScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import AXL
    from diffusion_for_multi_scale_molecular_dynamics_tpu.noise_schedulers import (
        NoiseParameters,
    )

    os.makedirs(OUTPUT, exist_ok=True)

    # --- the effective dataset and the analytical model ---
    ticks = (np.arange(GRID) + 0.5) / GRID
    equilibrium = np.stack(
        np.meshgrid(ticks, ticks, indexing="ij"), -1
    ).reshape(-1, 2)
    n_atoms = len(equilibrium)
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

    # --- sample maker: top-1 selector -> 4-nearest-neighbor excision ->
    # repaint with the diffusion generator (all real components) ---
    sample_maker = ExciseAndRepaintSampleMaker(
        sample_maker_arguments=ExciseAndRepaintSampleMakerArguments(
            element_list=["A"],
            sample_box_strategy="fixed",
            sample_box_size=[1.0, 1.0],
            number_of_samples_per_substructure=4,
        ),
        atom_selector=TopKAtomSelector(
            TopKAtomSelectorArguments(top_k_environment=1)
        ),
        environment_excisor=NearestNeighborsExcision(
            NearestNeighborsExcisionArguments(number_of_neighbors=4)
        ),
        noise_parameters=NoiseParameters(
            total_time_steps=150, schedule_type="linear",
            sigma_min=1e-3, sigma_max=0.5,
            corrector_step_epsilon="auto",  # 2.5 * sigma_min^2 = 2.5e-6
        ),
        sampling_parameters=PredictorCorrectorSamplingParameters(
            num_atom_types=1,
            number_of_atoms=n_atoms,
            number_of_samples=4,
            number_of_corrector_steps=2,
            spatial_dimension=2,
            use_fixed_lattice_parameters=True,
            cell_dimensions=[1.0, 1.0],
        ),
        axl_network=axl_network,
    )

    # --- the initial sample: near-equilibrium atoms, random uncertainty ---
    rng = np.random.RandomState(1)
    positions = (equilibrium + rng.random(equilibrium.shape) * SIGMA_D) % 1.0
    uncertainty = rng.uniform(0.0, 0.5, n_atoms)
    uncertainty[5] = 0.95  # the "problematic" atom
    initial = AXL(
        A=np.zeros(n_atoms, np.int64),
        X=positions,
        L=np.asarray([1.0, 1.0, 0.0]),
    )

    samples, active_indices, infos = sample_maker.make_samples(
        initial, uncertainty
    )
    print(f"made {len(samples)} candidate structures; "
          f"active atom index {active_indices[0]}")

    n_constrained = len(infos[0]["constrained_atom_indices"])
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    axes[0].scatter(positions[:, 0], positions[:, 1],
                    c=uncertainty, cmap="Reds", s=60)
    axes[0].set_title("initial sample (color = uncertainty)")
    sample = samples[0]
    axes[1].scatter(sample.X[:n_constrained, 0], sample.X[:n_constrained, 1],
                    s=80, color="tab:blue", label="excised (fixed)")
    axes[1].scatter(sample.X[n_constrained:, 0], sample.X[n_constrained:, 1],
                    s=40, color="tab:red", label="repainted")
    axes[1].legend(fontsize=8)
    axes[1].set_title("candidate: repainted around the excised environment")
    for ax in axes:
        ax.set_xlim(0, 1); ax.set_ylim(0, 1); ax.set_aspect("equal")
    path = os.path.join(OUTPUT, "excise_and_repaint.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)

    assert len(samples) == 4
    assert all(len(s.X) == n_atoms for s in samples)
    print(f"each candidate keeps {n_constrained} excised atoms fixed and "
          f"repaints {n_atoms - n_constrained}")


if __name__ == "__main__":
    main()

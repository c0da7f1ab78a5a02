"""Sampling-during-validation: draw samples, score with the oracle, KS metrics.

Replaces the reference's on_validation_epoch_end sampling + metrics
(src/diffusion_for_multi_scale_molecular_dynamics/models/axl_diffusion_lightning_model.py:570-660
and callbacks/sampling_visualization_callback.py): after each validation
epoch, generate a batch of samples with the current parameters, compute
Stillinger-Weber energies on device, and report the Kolmogorov-Smirnov
distance between generated and reference energy/structure distributions —
the model-selection metrics (validation_ks_distance_energy / _structure).
"""

import functools
import logging
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..metrics import (
    KolmogorovSmirnovMetric,
    SamplingMetricsParameters,
)
from ..namespace import AXL, AXL_COMPOSITION, CARTESIAN_POSITIONS
from ..ops.geometry import map_noisy_lattice_parameters_to_unit_cell_vectors
from ..ops.neighbors import compute_distances_in_batch
from ..oracle.energy_oracle_factory import (
    create_energy_oracle,
    create_energy_oracle_parameters,
)
from ..generators.instantiate_generator import (
    instantiate_generator,
    load_sampling_parameters,
)
from ..noise_schedulers import NoiseParameters
from ..sampling.diffusion_sampling import create_batch_of_samples

logger = logging.getLogger(__name__)


class ValidationSampler:
    """Generates samples each validation epoch and computes KS metrics."""

    def __init__(
        self,
        noise_parameters: NoiseParameters,
        sampling_parameters,
        metrics_parameters: SamplingMetricsParameters,
        oracle_parameters=None,
        output_directory: Optional[str] = None,
        record_every_n_epochs: int = 1,
        first_record_epoch: int = 0,
    ):
        self.noise_parameters = noise_parameters
        self.sampling_parameters = sampling_parameters
        self.metrics_parameters = metrics_parameters
        self.oracle = (
            create_energy_oracle(oracle_parameters) if oracle_parameters else None
        )
        self.output_directory = output_directory
        self.record_every_n_epochs = record_every_n_epochs
        self.first_record_epoch = first_record_epoch

        self.energy_ks_metric = KolmogorovSmirnovMetric()
        self.structure_ks_metric = KolmogorovSmirnovMetric()
        self._reference_energies_registered = False
        self._last_predicted_energies = None

    def should_run(self, epoch: int) -> bool:
        if epoch < self.first_record_epoch:
            return False
        return (epoch - self.first_record_epoch) % self.record_every_n_epochs == 0

    def register_reference_energies(self, energies) -> None:
        self.energy_ks_metric.register_reference_samples(energies)
        self._reference_energies_registered = True

    def register_reference_structures(self, distances) -> None:
        self.structure_ks_metric.register_reference_samples(distances)

    def _structure_distances(self, composition: AXL) -> np.ndarray:
        cells = map_noisy_lattice_parameters_to_unit_cell_vectors(composition.L)
        distances = compute_distances_in_batch(
            composition.X @ cells,
            cells,
            self.metrics_parameters.structure_factor_max_distance,
        )
        distances = np.asarray(distances).ravel()
        return distances[np.isfinite(distances)]

    def _lazily_register_reference_data(self, trainer) -> None:
        """Score the validation set once to build the reference distributions."""
        if self._reference_energies_registered:
            return
        self._reference_energies_registered = True
        datamodule = getattr(trainer, "datamodule", None)
        if datamodule is None:
            return
        from ..namespace import (
            ATOM_TYPES,
            LATTICE_PARAMETERS,
            RELATIVE_COORDINATES,
        )

        for batch in datamodule.valid_batches():
            composition = AXL(
                A=batch[ATOM_TYPES],
                X=batch[RELATIVE_COORDINATES],
                L=batch[LATTICE_PARAMETERS],
            )
            if self.metrics_parameters.compute_energies and self.oracle is not None:
                energies, _ = self.oracle.compute_oracle_energies_and_forces(
                    composition
                )
                self.energy_ks_metric.register_reference_samples(energies)
            if self.metrics_parameters.compute_structure_factor:
                self.structure_ks_metric.register_reference_samples(
                    self._structure_distances(composition)
                )

    def _log_energy_histogram(self, trainer, epoch: int) -> None:
        """Per-epoch reference-vs-generated energy histogram figure.

        (the sampling-visualization diagnostics of the reference,
        callbacks/sampling_visualization_callback.py:49-399)
        """
        if self._last_predicted_energies is None or not self.energy_ks_metric._reference:
            return
        reference = np.concatenate(self.energy_ks_metric._reference)
        figure = _histogram_figure(
            reference, self._last_predicted_energies, "energy (eV)"
        )
        trainer.log_figure("sampled_energy_distribution", figure, epoch)
        import matplotlib.pyplot as plt

        plt.close(figure)

    def __call__(self, trainer, epoch: int, metrics: Dict[str, float]) -> None:
        if not self.should_run(epoch):
            return
        self._lazily_register_reference_data(trainer)

        axl_network = functools.partial(
            trainer.score_network.apply,
            getattr(trainer, "eval_params", trainer.params),
        )
        generator = instantiate_generator(
            self.sampling_parameters, self.noise_parameters, axl_network
        )
        key = jax.random.PRNGKey(epoch)
        sample_batch = create_batch_of_samples(
            generator, self.sampling_parameters, key
        )
        composition = sample_batch[AXL_COMPOSITION]

        if self.metrics_parameters.compute_energies and self.oracle is not None:
            energies, _ = self.oracle.compute_oracle_energies_and_forces(
                composition,
                cartesian_positions=np.asarray(sample_batch[CARTESIAN_POSITIONS]),
            )
            self.energy_ks_metric.register_predicted_samples(energies)
            self._last_predicted_energies = np.asarray(energies)
            metrics["validation_sampled_energy_mean"] = float(np.mean(energies))
            metrics["validation_sampled_energy_std"] = float(np.std(energies))
            if self.energy_ks_metric.has_data:
                distance, pvalue = self.energy_ks_metric.compute()
                metrics["validation_ks_distance_energy"] = distance
                metrics["validation_ks_pvalue_energy"] = pvalue
            self.energy_ks_metric._predicted.clear()

        if self.metrics_parameters.compute_structure_factor:
            self.structure_ks_metric.register_predicted_samples(
                self._structure_distances(composition)
            )
            if self.structure_ks_metric.has_data:
                distance, pvalue = self.structure_ks_metric.compute()
                metrics["validation_ks_distance_structure"] = distance
                metrics["validation_ks_pvalue_structure"] = pvalue
            self.structure_ks_metric._predicted.clear()

        try:
            self._log_energy_histogram(trainer, epoch)
        except ImportError:
            logger.warning("matplotlib unavailable; skipping energy histogram")

        if self.metrics_parameters.record_samples and self.output_directory:
            samples_dir = os.path.join(self.output_directory, "samples")
            os.makedirs(samples_dir, exist_ok=True)
            path = os.path.join(samples_dir, f"samples_epoch_{epoch}.pkl")
            with open(path, "wb") as fh:
                pickle.dump(
                    AXL(
                        A=np.asarray(composition.A),
                        X=np.asarray(composition.X),
                        L=np.asarray(composition.L),
                    ),
                    fh,
                )


def _histogram_figure(reference, predicted, xlabel):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Early / degenerate samples can carry non-finite oracle energies (e.g.
    # overlapping atoms before the model has learned, a collapsing free
    # lattice); np.histogram raises on an inf range and that exception would
    # abort the whole training run. Plot the finite subset and count the rest.
    reference = np.asarray(reference)
    predicted = np.asarray(predicted)
    finite_reference = reference[np.isfinite(reference)]
    finite_predicted = predicted[np.isfinite(predicted)]
    dropped = predicted.size - finite_predicted.size

    fig, ax = plt.subplots(figsize=(6, 4))
    bins = 40
    if finite_reference.size:
        ax.hist(finite_reference, bins=bins, alpha=0.5, density=True,
                label="reference")
    if finite_predicted.size:
        label = (
            "generated" if not dropped
            else f"generated ({dropped} non-finite dropped)"
        )
        ax.hist(finite_predicted, bins=bins, alpha=0.5, density=True,
                label=label)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("density")
    ax.legend()
    fig.tight_layout()
    return fig


def create_validation_sampling_hook(hyper_params: Dict[str, Any], output_directory: str):
    """Build the validation sampling hook from the experiment config."""
    sampling_config = hyper_params["diffusion_sampling"]
    noise_parameters = NoiseParameters(**sampling_config["noise"])
    sampling_parameters = load_sampling_parameters(sampling_config["sampling"])

    metrics_config = dict(sampling_config.get("metrics", {}))
    if "structure_factor_max_distance" not in metrics_config and "sampling_visualization" in hyper_params:
        pass
    metrics_parameters = SamplingMetricsParameters(
        compute_energies=metrics_config.get("compute_energies", False),
        compute_structure_factor=metrics_config.get("compute_structure_factor", False),
        structure_factor_max_distance=metrics_config.get(
            "structure_factor_max_distance", 5.0
        ),
        record_samples=hyper_params.get("sampling_visualization", {}).get(
            "record_trajectories", False
        ),
    )

    oracle_parameters = None
    if "oracle" in hyper_params and metrics_parameters.compute_energies:
        oracle_parameters = create_energy_oracle_parameters(
            hyper_params["oracle"], hyper_params["elements"]
        )

    viz = hyper_params.get("sampling_visualization", {})
    return ValidationSampler(
        noise_parameters=noise_parameters,
        sampling_parameters=sampling_parameters,
        metrics_parameters=metrics_parameters,
        oracle_parameters=oracle_parameters,
        output_directory=output_directory,
        record_every_n_epochs=viz.get("record_every_n_epochs", 1),
        first_record_epoch=viz.get("first_record_epoch", 0),
    )

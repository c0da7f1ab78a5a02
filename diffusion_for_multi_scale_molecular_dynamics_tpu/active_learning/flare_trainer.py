"""FLARE sparse-GP MLIP lifecycle: training, mapping, checkpointing, hyperopt.

The sparse Gaussian process itself is the external flare/flare_pp C++ package
(out of numerical scope, exactly as in the reference); this module owns the
interface the active-learning loop talks to. All flare imports are lazy and
gated with actionable errors, and the checkpoint format is json.

(reference: active_learning_loop/trainer/{flare_trainer,
flare_hyperparameter_optimizer}.py)
"""

import json
import logging
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .single_point_calculators import SinglePointCalculation

logger = logging.getLogger(__name__)


@dataclass(kw_only=True)
class FlareConfiguration:
    """Hyperparameters of the FLARE B2 sparse GP."""

    cutoff: float
    elements: List[str]
    n_radial: int = 8
    lmax: int = 3
    initial_sigma: float = 2.0
    initial_sigma_e: float = 0.1
    initial_sigma_f: float = 0.05
    initial_sigma_s: float = 0.001
    variance_type: str = "local"  # "local" | "DTC"

    def __post_init__(self):
        assert self.variance_type in ("local", "DTC")


def _require_flare():
    try:
        from flare.bffs.sgp import SGP_Wrapper  # noqa: F401
        import flare  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "the flare / flare_pp package is not installed; the FLARE trainer "
            "drives an external C++ sparse GP and cannot run without it"
        ) from exc


class FlareTrainer:
    """Wraps the FLARE SGP: add data, map to LAMMPS coefficients, checkpoint."""

    def __init__(self, flare_configuration: FlareConfiguration):
        self.configuration = flare_configuration
        self.sgp_model = self._create_sgp_wrapper(flare_configuration)

    @staticmethod
    def _create_sgp_wrapper(config: FlareConfiguration):
        _require_flare()
        from flare.bffs.sgp import SGP_Wrapper
        from flare.bffs.sgp._C_flare import B2, NormalizedDotProduct, SparseGP

        sigma = config.initial_sigma
        kernel = NormalizedDotProduct(sigma, 2)
        n_species = len(config.elements)
        cutoff_matrix = config.cutoff * np.ones((n_species, n_species))
        descriptor = B2(
            "chebyshev",
            "quadratic",
            [0.0, config.cutoff],
            [],
            [n_species, config.n_radial, config.lmax],
            cutoff_matrix,
        )
        species_map = {i: i for i in range(n_species)}
        return SGP_Wrapper(
            kernels=[kernel],
            descriptor_calculators=[descriptor],
            cutoff=config.cutoff,
            sigma_e=config.initial_sigma_e,
            sigma_f=config.initial_sigma_f,
            sigma_s=config.initial_sigma_s,
            species_map=species_map,
            variance_type=config.variance_type,
        )

    def add_labelled_structure(
        self,
        single_point_calculation: SinglePointCalculation,
        active_environment_indices: Optional[np.ndarray] = None,
    ) -> None:
        """Feed one labelled structure (and its active environments) to the SGP."""
        _require_flare()
        from ase import Atoms

        structure = single_point_calculation.structure
        atoms = Atoms(
            symbols=structure.species,
            scaled_positions=structure.frac_coords,
            cell=structure.cell,
            pbc=True,
        )
        self.sgp_model.update_db(
            atoms,
            single_point_calculation.forces,
            custom_range=(
                list(map(int, active_environment_indices))
                if active_environment_indices is not None
                else ()
            ),
            energy=single_point_calculation.energy,
            mode="specific",
        )

    def fit_hyperparameters(self, optimizer) -> Tuple[Any, Any]:
        """Delegate NLL hyperparameter optimization to the optimizer object."""
        return optimizer.train(self.sgp_model)

    def write_mapped_model_to_disk(
        self, directory: str, version: int = 0
    ) -> Tuple[str, str]:
        """Write mapped coefficients for LAMMPS pair_style flare.

        Returns:
            (pair-coefficients path, mapped-uncertainty path).
        """
        _require_flare()
        os.makedirs(directory, exist_ok=True)
        coefficients_name = f"lmp{version}.flare"
        self.sgp_model.write_mapping_coefficients(
            os.path.join(directory, coefficients_name), "A", [0]
        )
        uncertainty_name = f"map_unc_{coefficients_name}"
        self.sgp_model.write_varmap_coefficients(
            os.path.join(directory, uncertainty_name), "B", [0]
        )
        return (
            os.path.join(directory, coefficients_name),
            os.path.join(directory, uncertainty_name),
        )

    def write_checkpoint_to_disk(self, path: str) -> None:
        """Serialize configuration + SGP state as json."""
        _require_flare()
        payload = dict(
            flare_configuration=asdict(self.configuration),
            sgp_model=self.sgp_model.as_dict(),
        )
        with open(path, "w") as fh:
            json.dump(payload, fh)

    @classmethod
    def from_checkpoint(cls, path: str) -> "FlareTrainer":
        _require_flare()
        from flare.bffs.sgp import SGP_Wrapper

        with open(path, "r") as fh:
            payload = json.load(fh)
        trainer = cls.__new__(cls)
        trainer.configuration = FlareConfiguration(
            **payload["flare_configuration"]
        )
        trainer.sgp_model = SGP_Wrapper.from_dict(payload["sgp_model"])
        return trainer


@dataclass(kw_only=True)
class FlareOptimizerConfiguration:
    """Scipy-BFGS NLL optimization settings."""

    optimize_on_the_fly: bool = True
    max_iterations: int = 50
    optimization_method: str = "BFGS"


class FlareHyperparametersOptimizer:
    """Maximizes the SGP marginal likelihood over (sigma, sigma_e, sigma_f, sigma_s).

    (reference: trainer/flare_hyperparameter_optimizer.py:12-175)
    """

    def __init__(self, configuration: FlareOptimizerConfiguration):
        self.configuration = configuration
        self.history: List[Dict[str, float]] = []

    @property
    def is_inactive(self) -> bool:
        return not self.configuration.optimize_on_the_fly

    def train(self, sgp_model):
        """Scipy-minimize the negative log marginal likelihood."""
        from scipy.optimize import minimize

        sparse_gp = sgp_model.sparse_gp
        self.history = []

        def negative_log_likelihood(log_hyperparameters):
            hyperparameters = np.exp(log_hyperparameters)
            sparse_gp.set_hyperparameters(hyperparameters)
            sparse_gp.compute_likelihood()
            nll = -sparse_gp.log_marginal_likelihood
            self.history.append(
                dict(
                    nll=float(nll),
                    **{
                        name: float(v)
                        for name, v in zip(
                            ("sigma", "sigma_e", "sigma_f", "sigma_s"),
                            hyperparameters,
                        )
                    },
                )
            )
            return nll

        x0 = np.log(np.asarray(sparse_gp.hyperparameters))
        result = minimize(
            negative_log_likelihood,
            x0,
            method=self.configuration.optimization_method,
            options=dict(maxiter=self.configuration.max_iterations),
        )
        # Leave the model at the optimum.
        sparse_gp.set_hyperparameters(np.exp(result.x))

        import pandas as pd

        return result, pd.DataFrame(self.history)

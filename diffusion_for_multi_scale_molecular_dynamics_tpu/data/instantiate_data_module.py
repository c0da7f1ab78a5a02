"""Data-module factory keyed on data_source.

(reference: src/diffusion_for_multi_scale_molecular_dynamics/data/diffusion/instantiate_data_module.py:18)
"""

import logging
from typing import Any, Dict

from .gaussian_data_module import GaussianDataModule, GaussianDataModuleParameters

logger = logging.getLogger(__name__)


def load_data_module(hyper_params: Dict[str, Any], args=None):
    """Build the configured data module ('gaussian' or 'LAMMPS')."""
    data_config = dict(hyper_params["data"])
    data_source = data_config.pop("data_source", "LAMMPS")
    data_config.pop("noise", None)  # noise tables are owned by the model side
    data_config.pop("use_optimal_transport", None)
    elements = hyper_params["elements"]
    spatial_dimension = hyper_params.get("spatial_dimension", 3)

    if data_source == "gaussian":
        params = GaussianDataModuleParameters(
            elements=elements,
            spatial_dimension=spatial_dimension,
            random_seed=data_config.pop("random_seed", hyper_params.get("seed", 42)),
            **data_config,
        )
        return GaussianDataModule(params)
    if data_source == "LAMMPS":
        from .lammps_data_module import (
            LammpsDataModule,
            LammpsDataModuleParameters,
        )

        # Raw runs are optional: a pre-existing parquet cache is enough.
        lammps_run_dir = getattr(args, "data", None) or data_config.pop(
            "lammps_run_dir", None
        )
        params = LammpsDataModuleParameters(
            elements=elements,
            spatial_dimension=spatial_dimension,
            lammps_run_dir=lammps_run_dir,
            processed_dataset_dir=(
                getattr(args, "processed_datadir", None)
                or data_config.pop("processed_dataset_dir", None)
            ),
            **data_config,
        )
        return LammpsDataModule(params)
    raise ValueError(f"Unknown data source '{data_source}'")

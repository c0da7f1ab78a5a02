"""The active-learning campaign driver.

Flow (reference: active_learning_loop/active_learning.py:32-320):
  start from a pretrained FLARE sparse GP; loop until the ARTn saddle search
  completes without hitting an uncertain environment:
    1. map the SGP to LAMMPS coefficient files,
    2. run ARTn; SUCCESS -> checkpoint FLARE and exit,
    3. on INTERRUPTION, read the uncertain structure + per-atom uncertainties,
    4. make candidate structures around the uncertain atoms (excise and
       repaint with the diffusion model),
    5. label candidates with the oracle single-point calculator (native JAX
       Stillinger-Weber: the whole candidate list is scored on device),
    6. add labels to the SGP; optionally refit its hyperparameters.
"""

import logging
import os
import pickle
import time
from typing import Any, Dict, List, Tuple

import numpy as np
import yaml

from .artn import ArtnDriver, CalculationState
from .campaign_logging import clean_up_campaign_logger, set_up_campaign_logger
from .lammps_io import extract_all_fields_from_dump
from .sample_maker import (
    AXL_STRUCTURE_IN_NEW_BOX,
    AXL_STRUCTURE_IN_ORIGINAL_BOX,
    BaseSampleMaker,
)
from .single_point_calculators import (
    BaseSinglePointCalculator,
    SinglePointCalculation,
)
from .structure import Structure, StructureConverter

logger = logging.getLogger(__name__)


class ActiveLearning:
    """Dispatches the sub-tasks of an active-learning campaign."""

    def __init__(
        self,
        oracle_single_point_calculator: BaseSinglePointCalculator,
        sample_maker: BaseSampleMaker,
        artn_driver: ArtnDriver,
        flare_hyperparameters_optimizer,
    ):
        self.oracle_calculator = oracle_single_point_calculator
        self.sample_maker = sample_maker
        self.artn_driver = artn_driver
        self.optimizer = flare_hyperparameters_optimizer
        self._structure_converter = StructureConverter(
            list_of_element_symbols=sample_maker.arguments.element_list
        )

    def _get_uncertain_structure_and_uncertainties(
        self, artn_working_directory: str
    ) -> Tuple[Structure, np.ndarray]:
        """Read uncertain_dump.yaml from the interrupted ARTn run."""
        dump_path = os.path.join(
            artn_working_directory, ArtnDriver.UNCERTAIN_DUMP_FILENAME
        )
        assert os.path.isfile(dump_path), f"The file {dump_path} is missing."
        structures, _, _, uncertainties = extract_all_fields_from_dump(dump_path)
        assert uncertainties[0] is not None, (
            "the uncertain dump does not contain an uncertainty column"
        )
        return structures[0], uncertainties[0]

    def _make_samples(
        self, structure: Structure, uncertainty_per_atom: np.ndarray
    ) -> Tuple[List[Structure], List[np.ndarray], List[Dict[str, Any]]]:
        axl = self._structure_converter.convert_structure_to_axl(structure)
        samples, active_indices, infos = self.sample_maker.make_samples(
            axl, uncertainty_per_atom
        )
        sample_structures = [
            self._structure_converter.convert_axl_to_structure(s) for s in samples
        ]
        converted_infos = []
        for info in infos:
            converted = {}
            for k, v in info.items():
                if k in (AXL_STRUCTURE_IN_ORIGINAL_BOX, AXL_STRUCTURE_IN_NEW_BOX):
                    converted[k] = self._structure_converter.convert_axl_to_structure(v)
                else:
                    converted[k] = v
            converted_infos.append(converted)
        return sample_structures, active_indices, converted_infos

    @staticmethod
    def _record_labelled_samples(
        path: str,
        calculations: List[SinglePointCalculation],
        infos: List[Dict[str, Any]],
    ) -> None:
        rows = []
        for calculation, info in zip(calculations, infos):
            structure = calculation.structure
            constrained = np.zeros(len(structure), dtype=int)
            constrained[info["constrained_atom_indices"]] = 1
            structure.add_site_property("constrained", constrained)
            structure.add_site_property("forces", calculation.forces)
            rows.append(
                dict(
                    calculation_type=calculation.calculation_type,
                    structure=structure,
                    energy=calculation.energy,
                )
            )
        with open(path, "wb") as fh:
            pickle.dump(rows, fh)

    def run_campaign(
        self,
        uncertainty_threshold: float,
        flare_trainer,
        working_directory: str,
        maximum_number_of_rounds: int = 100,
    ) -> Dict[str, Any]:
        """One full active-learning campaign at a fixed uncertainty threshold."""
        os.makedirs(working_directory, exist_ok=True)
        campaign_logger = set_up_campaign_logger(working_directory)
        campaign_logger.info("Starting Active Learning Simulation")

        round_number = 0
        final_state = None
        while round_number < maximum_number_of_rounds:
            round_number += 1
            campaign_logger.info("Starting Round %d", round_number)
            round_dir = os.path.join(working_directory, f"round_{round_number}")
            coefficients_dir = os.path.join(round_dir, "FLARE_mapped_coefficients")
            os.makedirs(coefficients_dir, exist_ok=True)
            artn_dir = os.path.join(round_dir, "lammps_artn")

            pair_coeff_path, uncertainty_path = (
                flare_trainer.write_mapped_model_to_disk(
                    coefficients_dir, version=round_number
                )
            )

            campaign_logger.info("  Launching ARTn simulation...")
            state = self.artn_driver.run(
                working_directory=artn_dir,
                uncertainty_threshold=uncertainty_threshold,
                pair_coeff_file_path=pair_coeff_path,
                mapped_uncertainty_file_path=uncertainty_path,
            )
            campaign_logger.info("  ARTn state is %s", state)
            final_state = state

            if state == CalculationState.SUCCESS:
                campaign_logger.info("Active Learning Campaign is Complete.")
                checkpoint = os.path.join(working_directory, "trained_flare.json")
                flare_trainer.write_checkpoint_to_disk(checkpoint)
                break

            uncertain_structure, uncertainty_per_atom = (
                self._get_uncertain_structure_and_uncertainties(artn_dir)
            )
            n_uncertain = int(np.sum(uncertainty_per_atom > uncertainty_threshold))
            campaign_logger.info(
                " -> %d environments above the uncertainty threshold.", n_uncertain
            )

            campaign_logger.info("  Making new samples based on uncertainties.")
            sample_structures, active_indices, infos = self._make_samples(
                uncertain_structure, uncertainty_per_atom
            )

            campaign_logger.info("  Labelling %d samples with the oracle...", len(sample_structures))
            oracle_dir = os.path.join(round_dir, "oracle")
            os.makedirs(oracle_dir, exist_ok=True)
            t0 = time.time()
            calculations = [
                self.oracle_calculator.calculate(
                    structure,
                    results_path=os.path.join(oracle_dir, f"result_{idx}.npz"),
                )
                for idx, structure in enumerate(sample_structures)
            ]
            campaign_logger.info(
                " -> oracle labelling took %6.2e s.", time.time() - t0
            )

            self._record_labelled_samples(
                os.path.join(oracle_dir, "oracle_single_point_calculations.pkl"),
                calculations,
                infos,
            )

            campaign_logger.info("  Adding samples to FLARE.")
            for calculation, active in zip(calculations, active_indices):
                flare_trainer.add_labelled_structure(
                    calculation, active_environment_indices=active
                )

            if self.optimizer is None or self.optimizer.is_inactive:
                campaign_logger.info("  Hyperparameter optimization inactive.")
            else:
                campaign_logger.info("  Fitting the FLARE hyperparameters...")
                result, history = flare_trainer.fit_hyperparameters(self.optimizer)
                campaign_logger.info("  Optimization success: %s", result.success)
                log_dir = os.path.join(round_dir, "hyperparameter_optimization_logs")
                os.makedirs(log_dir, exist_ok=True)
                history.to_pickle(os.path.join(log_dir, "optimization_log.pkl"))

        campaign_details = dict(
            uncertainty_threshold=float(uncertainty_threshold),
            final_round=int(round_number),
            final_state=str(final_state),
        )
        with open(os.path.join(working_directory, "campaign_details.yaml"), "w") as fh:
            yaml.safe_dump(campaign_details, fh)
        clean_up_campaign_logger(campaign_logger)
        return campaign_details

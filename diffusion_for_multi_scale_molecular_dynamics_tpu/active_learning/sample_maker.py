"""Sample makers: build candidate structures around uncertain environments.

Strategies (reference: active_learning_loop/sample_maker/*.py):
  * no_op — pass the uncertain structure through unchanged;
  * excise_and_noop — keep just the excised environment (re-boxed);
  * excise_and_random — fill the new box around the excised environment with
    random (uniform or voxel-stratified) atoms, rejecting overlaps;
  * excise_and_repaint — denoise new atoms around the excised environment
    with the RePaint-constrained diffusion generator (the flagship path).
"""

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..generators.constrained_langevin_generator import ConstrainedLangevinGenerator
from ..generators.sampling_constraint import SamplingConstraint
from ..namespace import AXL, AXL_COMPOSITION
from ..ops.geometry import get_number_of_lattice_parameters
from ..sampling.diffusion_sampling import create_batch_of_samples
from .atom_selector import BaseAtomSelector
from .excisor import BaseEnvironmentExcision
from .structure import get_distances_from_reference_point

logger = logging.getLogger(__name__)

AXL_STRUCTURE_IN_ORIGINAL_BOX = "axl_structure_in_original_box"
AXL_STRUCTURE_IN_NEW_BOX = "axl_structure_in_new_box"

_UNLIMITED_CONSTRAINED_STRUCTURE = -1


@dataclass(kw_only=True)
class BaseSampleMakerArguments:
    """Common sample-maker configuration."""

    algorithm: str
    element_list: List[str]
    sample_box_strategy: str = "fixed"
    sample_box_size: Optional[Any] = None

    def __post_init__(self):
        assert self.sample_box_strategy in ("fixed", "noop"), (
            f"Sample box strategy {self.sample_box_strategy} is not implemented."
        )
        if self.sample_box_strategy == "fixed":
            assert self.sample_box_size is not None
            box = np.asarray(self.sample_box_size, dtype=np.float64)
            cell = np.diag(box) if box.ndim == 1 else box
            d = cell.shape[0]
            lattice = np.zeros(get_number_of_lattice_parameters(d))
            lattice[:d] = np.diag(cell)
            self.new_box_lattice_parameters = lattice


class BaseSampleMaker(ABC):
    """Interface for candidate-sample construction."""

    def __init__(
        self,
        sample_maker_arguments: BaseSampleMakerArguments,
        atom_selector: BaseAtomSelector,
        **kwargs,
    ):
        self.arguments = sample_maker_arguments
        self.atom_selector = atom_selector

    @abstractmethod
    def make_samples(
        self, structure: AXL, uncertainty_per_atom: np.ndarray
    ) -> Tuple[List[AXL], List[np.ndarray], List[Dict[str, Any]]]:
        """Returns (samples, active-atom index arrays, extra info dicts)."""

    @abstractmethod
    def filter_made_samples(self, structures: List[AXL]) -> List[AXL]:
        """Reject invalid samples."""

    def make_new_lattice_parameters(self, structure: AXL) -> np.ndarray:
        if self.arguments.sample_box_strategy == "noop":
            return structure.L
        return self.arguments.new_box_lattice_parameters

    @staticmethod
    def _create_sample_info_dictionary(axl_structure: AXL) -> Dict[str, Any]:
        """Record which atom slots are constrained (repainted atoms append)."""
        return dict(constrained_atom_indices=list(range(len(axl_structure.X))))


@dataclass(kw_only=True)
class NoOpSampleMakerArguments(BaseSampleMakerArguments):
    algorithm: str = "no_op"
    sample_box_strategy: str = "noop"


class NoOpSampleMaker(BaseSampleMaker):
    """Return the input structure itself as the single candidate."""

    def make_samples(self, structure, uncertainty_per_atom):
        central = self.atom_selector.select_central_atoms(uncertainty_per_atom)
        info = self._create_sample_info_dictionary(structure)
        return [structure], [np.asarray(central)], [info]

    def filter_made_samples(self, structures):
        return structures


@dataclass(kw_only=True)
class BaseExciseSampleMakerArguments(BaseSampleMakerArguments):
    """Configuration shared by excision-based sample makers."""

    max_constrained_substructure: int = _UNLIMITED_CONSTRAINED_STRUCTURE
    number_of_samples_per_substructure: int = 1

    def __post_init__(self):
        super().__post_init__()
        assert (
            self.max_constrained_substructure == _UNLIMITED_CONSTRAINED_STRUCTURE
            or self.max_constrained_substructure > 0
        ), "max_constrained_substructure must be positive or -1 (unlimited)"


class BaseExciseSampleMaker(BaseSampleMaker):
    """Excise uncertain environments, re-box them, build samples around them."""

    def __init__(
        self,
        sample_maker_arguments: BaseExciseSampleMakerArguments,
        atom_selector: BaseAtomSelector,
        environment_excisor: BaseEnvironmentExcision,
        **kwargs,
    ):
        super().__init__(sample_maker_arguments, atom_selector)
        self.environment_excisor = environment_excisor

    @abstractmethod
    def make_samples_from_constrained_substructure(
        self, substructure: AXL, active_atom_index: int, num_samples: int = 1
    ) -> Tuple[List[AXL], List[int], List[Dict[str, Any]]]:
        """Build samples around one (re-boxed) constrained substructure."""

    @staticmethod
    def embed_structure_in_new_box(
        structure_with_centered_atoms: AXL, new_lattice_parameters: np.ndarray
    ) -> AXL:
        """Transplant box-centered atoms into a (typically smaller) box.

        Atoms are re-expressed as cartesian offsets from the old box center
        and placed around the new box center; an assert guarantees they fit
        (reference: base_sample_maker.py:220-298).
        """
        x = np.asarray(structure_with_centered_atoms.X, dtype=np.float64)
        d = x.shape[-1]
        old_lengths = np.asarray(structure_with_centered_atoms.L)[:d]
        new_lengths = np.asarray(new_lattice_parameters)[:d]

        cartesian_offsets = (x - 0.5) * old_lengths
        new_positions = cartesian_offsets + 0.5 * new_lengths
        assert (new_positions > 0).all() and (new_positions < new_lengths).all(), (
            "Excised atoms fall outside the new box; use a larger box or a "
            "smaller excision cutoff."
        )
        return AXL(
            A=structure_with_centered_atoms.A,
            X=new_positions / new_lengths,
            L=np.asarray(new_lattice_parameters),
        )

    def make_samples(self, structure, uncertainty_per_atom):
        central_atom_indices = self.atom_selector.select_central_atoms(
            uncertainty_per_atom
        )
        limit = self.arguments.max_constrained_substructure
        if limit != _UNLIMITED_CONSTRAINED_STRUCTURE:
            central_atom_indices = central_atom_indices[:limit]

        environments, environment_central_indices = (
            self.environment_excisor.excise_environments(
                structure, central_atom_indices, center_atoms=True
            )
        )

        all_samples, all_active_indices, all_info = [], [], []
        for environment, active_index in zip(
            environments, environment_central_indices
        ):
            new_lattice = self.make_new_lattice_parameters(environment)
            reboxed = self.embed_structure_in_new_box(environment, new_lattice)
            samples, active_indices, infos = (
                self.make_samples_from_constrained_substructure(
                    reboxed,
                    active_index,
                    self.arguments.number_of_samples_per_substructure,
                )
            )
            for sample, active, info in zip(samples, active_indices, infos):
                info[AXL_STRUCTURE_IN_ORIGINAL_BOX] = environment
                info[AXL_STRUCTURE_IN_NEW_BOX] = reboxed
                all_samples.append(sample)
                all_active_indices.append(np.asarray([active]))
                all_info.append(info)
        return all_samples, all_active_indices, all_info


@dataclass(kw_only=True)
class ExciseAndNoOpSampleMakerArguments(BaseExciseSampleMakerArguments):
    algorithm: str = "excise_and_noop"


class ExciseAndNoOpSampleMaker(BaseExciseSampleMaker):
    """The re-boxed excised environment itself is the candidate."""

    def make_samples_from_constrained_substructure(
        self, substructure, active_atom_index, num_samples=1
    ):
        info = self._create_sample_info_dictionary(substructure)
        return [substructure], [active_atom_index], [dict(info)]

    def filter_made_samples(self, structures):
        return structures


@dataclass(kw_only=True)
class ExciseAndRandomSampleMakerArguments(BaseExciseSampleMakerArguments):
    """Fill the new box with random atoms around the excised environment."""

    algorithm: str = "excise_and_random"
    total_number_of_atoms: int = None
    random_coordinates_algorithm: str = "true_random"  # or "voxel_random"
    minimal_interatomic_distance: float = 1.0
    max_attempts: int = 1000
    random_seed: int = 42

    def __post_init__(self):
        super().__post_init__()
        assert self.total_number_of_atoms is not None
        assert self.random_coordinates_algorithm in ("true_random", "voxel_random")


class ExciseAndRandomSampleMaker(BaseExciseSampleMaker):
    """Random filler atoms with overlap rejection (diffusion-free baseline)."""

    def __init__(self, sample_maker_arguments, atom_selector, environment_excisor, **kwargs):
        super().__init__(sample_maker_arguments, atom_selector, environment_excisor)
        self._rng = np.random.RandomState(sample_maker_arguments.random_seed)

    def _draw_candidate_coordinates(self, n_new: int, d: int) -> np.ndarray:
        if self.arguments.random_coordinates_algorithm == "true_random":
            return self._rng.uniform(size=(n_new, d))
        # voxel_random: stratify the box into n_new voxels, one atom per voxel.
        per_axis = int(np.ceil(n_new ** (1.0 / d)))
        voxels = np.stack(
            np.meshgrid(*[np.arange(per_axis)] * d, indexing="ij"), axis=-1
        ).reshape(-1, d)
        chosen = voxels[self._rng.permutation(len(voxels))[:n_new]]
        return (chosen + self._rng.uniform(size=(n_new, d))) / per_axis

    def make_samples_from_constrained_substructure(
        self, substructure, active_atom_index, num_samples=1
    ):
        n_constrained = len(substructure.X)
        d = substructure.X.shape[-1]
        n_new = self.arguments.total_number_of_atoms - n_constrained
        assert n_new >= 0, "the excised environment exceeds the total atom count"

        samples, actives, infos = [], [], []
        for _ in range(num_samples):
            placed: List[np.ndarray] = []
            attempts = 0
            while len(placed) < n_new and attempts < self.arguments.max_attempts:
                attempts += 1
                candidates = self._draw_candidate_coordinates(n_new - len(placed), d)
                for candidate in candidates:
                    existing = np.concatenate(
                        [np.asarray(substructure.X)]
                        + ([np.stack(placed)] if placed else [])
                    )
                    distances = get_distances_from_reference_point(
                        existing, candidate, substructure.L
                    )
                    if (distances > self.arguments.minimal_interatomic_distance).all():
                        placed.append(candidate)
            new_x = (
                np.concatenate([np.asarray(substructure.X), np.stack(placed)])
                if placed
                else np.asarray(substructure.X)
            )
            new_a = np.concatenate(
                [
                    np.asarray(substructure.A),
                    self._rng.randint(
                        0, len(self.arguments.element_list), size=len(placed)
                    ),
                ]
            )
            sample = AXL(A=new_a, X=new_x, L=substructure.L)
            samples.append(sample)
            actives.append(active_atom_index)
            infos.append(self._create_sample_info_dictionary(substructure))
        return samples, actives, infos

    def filter_made_samples(self, structures):
        return structures


@dataclass(kw_only=True)
class ExciseAndRepaintSampleMakerArguments(BaseExciseSampleMakerArguments):
    """Inpaint new atoms around the excised environment with diffusion."""

    algorithm: str = "excise_and_repaint"
    # Generated atoms within this radius of the active atom are removed.
    sample_edit_radius: Optional[float] = None


class ExciseAndRepaintSampleMaker(BaseExciseSampleMaker):
    """The flagship sample maker: RePaint-constrained diffusion generation.

    (reference: excise_and_repaint_sample_maker.py:28-246)
    """

    def __init__(
        self,
        sample_maker_arguments: ExciseAndRepaintSampleMakerArguments,
        atom_selector: BaseAtomSelector,
        environment_excisor: BaseEnvironmentExcision,
        noise_parameters,
        sampling_parameters,
        axl_network: Callable,
        **kwargs,
    ):
        super().__init__(sample_maker_arguments, atom_selector, environment_excisor)
        assert (
            sample_maker_arguments.number_of_samples_per_substructure
            == sampling_parameters.number_of_samples
        ), (
            "number_of_samples_per_substructure must equal the sampling "
            "parameters' number_of_samples"
        )
        self.noise_parameters = noise_parameters
        self.sampling_parameters = sampling_parameters
        self.axl_network = axl_network
        self._sample_counter = 0

    def create_sampling_constraints(self, constrained_structure: AXL) -> SamplingConstraint:
        """Constraint with explicit slot indices so the active atom keeps its index."""
        return SamplingConstraint(
            elements=self.arguments.element_list,
            constrained_relative_coordinates=np.asarray(
                constrained_structure.X, dtype=np.float32
            ),
            constrained_atom_types=np.asarray(
                constrained_structure.A, dtype=np.int32
            ),
            constrained_indices=np.arange(len(constrained_structure.X)),
        )

    def make_samples_from_constrained_substructure(
        self, substructure, active_atom_index, num_samples=1
    ):
        n_constrained = len(substructure.X)
        assert active_atom_index < n_constrained

        constraint = self.create_sampling_constraints(substructure)
        generator = ConstrainedLangevinGenerator(
            noise_parameters=self.noise_parameters,
            sampling_parameters=self.sampling_parameters,
            axl_network=self.axl_network,
            sampling_constraints=constraint,
        )
        key = jax.random.PRNGKey(self._sample_counter)
        self._sample_counter += 1
        batch = create_batch_of_samples(generator, self.sampling_parameters, key)
        composition = batch[AXL_COMPOSITION]

        structures = [
            AXL(A=np.asarray(a), X=np.asarray(x), L=np.asarray(lattice))
            for a, x, lattice in zip(composition.A, composition.X, composition.L)
        ]
        if self.arguments.sample_edit_radius is not None:
            structures = [
                self.edit_generated_structure(
                    s,
                    active_atom_index,
                    n_constrained,
                    self.arguments.sample_edit_radius,
                )
                for s in structures
            ]

        infos = [
            self._create_sample_info_dictionary(substructure) for _ in structures
        ]
        return structures, [active_atom_index] * len(structures), infos

    @staticmethod
    def edit_generated_structure(
        sampled_structure: AXL,
        active_atom_index: int,
        number_of_constrained_atoms: int,
        sample_edit_radius: float,
    ) -> AXL:
        """Drop *generated* atoms inside the exclusion sphere of the active atom."""
        distances = get_distances_from_reference_point(
            np.asarray(sampled_structure.X),
            np.asarray(sampled_structure.X)[active_atom_index],
            sampled_structure.L,
        )
        n = len(sampled_structure.X)
        constrained = np.zeros(n, dtype=bool)
        constrained[:number_of_constrained_atoms] = True
        keep = constrained | (distances > sample_edit_radius)
        return AXL(
            A=np.asarray(sampled_structure.A)[keep],
            X=np.asarray(sampled_structure.X)[keep],
            L=sampled_structure.L,
        )

    def filter_made_samples(self, structures):
        return structures

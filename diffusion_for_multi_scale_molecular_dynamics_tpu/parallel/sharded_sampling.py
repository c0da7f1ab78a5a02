"""Sample-sharded generation over a device mesh.

Generation is embarrassingly parallel across samples: shard the sample batch
over the 1-D data mesh and run the generator's compiled scan SPMD — each
device denoises its slice, no collectives in the hot loop. This is where the
multi-chip throughput target is won (BASELINE.md: >= 50x reference CPU
throughput on a v5e-8 pod slice).
"""

import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..namespace import AXL
from .mesh import DATA_AXIS

logger = logging.getLogger(__name__)


def shard_generator_over_mesh(generator, mesh: Mesh) -> None:
    """Constrain the generator's trajectories to be sample-sharded.

    Wraps the generator's compiled scan chunk so that its composition inputs
    and outputs carry a batch-axis NamedSharding; with the initial composition
    placed shard-wise, XLA keeps every step of the scan fully local to its
    device.
    """
    batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    composition_shardings = AXL(A=batch_sharding, X=batch_sharding, L=batch_sharding)
    replicated = NamedSharding(mesh, PartitionSpec())

    raw_chunk = generator._scan_chunk
    generator._compiled_scan_chunk = jax.jit(
        raw_chunk,
        static_argnums=(3,),
        in_shardings=(composition_shardings, replicated, replicated),
        out_shardings=None,
    )
    if getattr(generator, "_apply_fn", None) is not None:
        # Params-as-argument path (keeps weights out of the HLO): replicate
        # the parameter pytree, shard the composition batch axis.
        generator._compiled_scan_chunk_with_params = jax.jit(
            generator._scan_chunk_with_params,
            static_argnums=(4,),
            in_shardings=(
                replicated, composition_shardings, replicated, replicated,
            ),
            out_shardings=None,
        )

    original_initialize = generator.initialize

    def sharded_initialize(key, number_of_samples: int) -> AXL:
        assert number_of_samples % mesh.devices.size == 0, (
            f"number_of_samples={number_of_samples} must be divisible by the "
            f"{mesh.devices.size}-device mesh"
        )
        composition = original_initialize(key, number_of_samples)
        return AXL(
            A=jax.device_put(composition.A, batch_sharding),
            X=jax.device_put(composition.X, batch_sharding),
            L=jax.device_put(composition.L, batch_sharding),
        )

    generator.initialize = sharded_initialize
    logger.info(
        "Generator sharded over %d devices (sample axis).", mesh.devices.size
    )

"""Device mesh and sharding helpers (1-D data parallelism over ICI).

The reference's only parallelism is Lightning-DDP passed through a CLI flag
(train_diffusion.py:76-82,184-194). The TPU-native equivalent is SPMD: a 1-D
``data`` mesh, batches sharded on their leading axis with NamedSharding, and
a single jitted step — XLA inserts the gradient all-reduce over ICI. The same
helpers shard sampling (each device runs the PC scan on its slice of the
samples: embarrassingly parallel generation).

Multi-host: call jax.distributed.initialize() before building the mesh; the
helpers only see the global device list and need no changes.
"""

import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

DATA_AXIS = "data"


def make_data_mesh(devices=None) -> Optional[Mesh]:
    """1-D mesh over all devices; None when running single-device."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) <= 1:
        return None
    mesh = Mesh(np.asarray(devices), axis_names=(DATA_AXIS,))
    logger.info("Data-parallel mesh over %d devices", len(devices))
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh):
    """Device-put every array in the batch with its leading axis sharded.

    Leading dimensions must be divisible by the mesh size; data modules
    produce fixed-size batches, so configure batch_size as a multiple of the
    device count.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        assert x.shape[0] % mesh.devices.size == 0, (
            f"batch dimension {x.shape[0]} not divisible by "
            f"{mesh.devices.size} devices"
        )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)

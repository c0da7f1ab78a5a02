"""Checkpoint restoration into a bound, jit-ready score network callable.

The training output directory is self-describing: config_backup.yaml defines
the architecture, best_model/ and last_model/ hold orbax checkpoints (the
reference equivalent is AXLDiffusionLightningModel.load_from_checkpoint,
sample_diffusion.py:191-206).
"""

import functools
import logging
import os

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp
import yaml

from ..namespace import AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME
from ..training.checkpointing import BEST_MODEL_DIR, LAST_MODEL_DIR

logger = logging.getLogger(__name__)


def _make_init_batch(score_network_config, number_of_atoms: int):
    d = score_network_config.spatial_dimension
    x = jnp.zeros((1, number_of_atoms, d))
    return {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((1, number_of_atoms), jnp.int32),
            X=x,
            L=jnp.ones((1, score_network_config.num_lattice_parameters)),
        ),
        TIME: jnp.ones((1, 1)),
        NOISE: jnp.full((1, 1), 0.5),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }


def load_axl_network_from_checkpoint(checkpoint_path: str, prefer: str = "best"):
    """Rebuild the network from a training output dir and bind its params.

    Args:
        checkpoint_path: a training output directory (containing
            config_backup.yaml and best_model/last_model), or directly a
            best_model/last_model directory.
        prefer: "best" or "last" when given a training output directory.

    Returns:
        callable batch -> AXL (params bound), ready to hand to a generator.
    """
    from ..training.instantiate_diffusion_model import load_diffusion_model
    from .configuration import CONFIG_BACKUP_NAME

    checkpoint_path = os.path.abspath(checkpoint_path)
    if os.path.basename(checkpoint_path) in (BEST_MODEL_DIR, LAST_MODEL_DIR):
        run_dir = os.path.dirname(checkpoint_path)
        state_dir = checkpoint_path
    else:
        run_dir = checkpoint_path
        preferred = BEST_MODEL_DIR if prefer == "best" else LAST_MODEL_DIR
        fallback = LAST_MODEL_DIR if prefer == "best" else BEST_MODEL_DIR
        state_dir = os.path.join(run_dir, preferred)
        if not os.path.exists(state_dir):
            state_dir = os.path.join(run_dir, fallback)
    assert os.path.exists(state_dir), f"no checkpoint found under {checkpoint_path}"

    config_path = os.path.join(run_dir, CONFIG_BACKUP_NAME)
    with open(config_path, "r") as fh:
        hyper_params = yaml.safe_load(fh)

    score_network, diffusion_config = load_diffusion_model(hyper_params)
    cfg = diffusion_config.score_network_config
    natoms = getattr(cfg, "number_of_atoms", None) or hyper_params.get(
        "data", {}
    ).get("max_atom", 64)

    init_batch = _make_init_batch(cfg, natoms)
    conditional_init = cfg.conditional_prob > 0
    template_params = score_network.init(
        jax.random.PRNGKey(0), init_batch, conditional_init
    )

    # Restore as host numpy arrays (ignoring the saved device shardings) so
    # checkpoints transfer across platforms — e.g. trained on TPU, sampled on
    # CPU; then keep only the params subtree.
    import numpy as np

    with ocp.PyTreeCheckpointer() as checkpointer:
        metadata = checkpointer.metadata(state_dir).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), metadata.tree
        )
        restored = checkpointer.restore(
            state_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
    # Prefer EMA weights when the checkpoint carries them (training with
    # optimizer.ema_decay > 0): they are the sampling-quality weights.
    params_key = "ema_params" if "ema_params" in restored else "params"
    params = jax.tree_util.tree_map(jnp.asarray, restored[params_key])
    del template_params
    logger.info("Restored parameters (%s) from %s", params_key, state_dir)
    return functools.partial(score_network.apply, params)

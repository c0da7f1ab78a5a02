"""The training loop: jitted steps, validation, checkpointing, callbacks.

Replaces the reference's pytorch-lightning Trainer usage
(src/diffusion_for_multi_scale_molecular_dynamics/train_diffusion.py:155-226)
with an explicit loop around two compiled programs:

  * train_step: noising -> targets -> forward -> loss -> grads -> optax update,
    one XLA computation per batch;
  * eval_step: the same generic step without gradients, returning the aux
    diagnostics consumed by callbacks and metrics.

Data parallelism: when more than one device is visible, batches are sharded
over a 1-D "data" mesh with NamedSharding and the same jitted step runs SPMD —
gradients are averaged by XLA collectives inside the compiled program (see
parallel/mesh.py).
"""

import functools
import logging
import random
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_data_mesh, shard_batch
from .callbacks import Callback
from .checkpointing import CheckpointManager
from .diffusion_model import make_generic_step, make_train_step
from .loggers import log_figure_to_all, log_metrics_to_all
from .optimizer import (
    LearningRateScheduler,
    OptimizerParameters,
    SchedulerParameters,
    load_optimizer,
    set_learning_rate,
)

logger = logging.getLogger(__name__)


class Trainer:
    """Explicit training loop for AXL diffusion models."""

    def __init__(
        self,
        score_network,
        diffusion_config,
        optimizer_parameters: OptimizerParameters,
        scheduler_parameters: Optional[SchedulerParameters],
        output_directory: str,
        max_epoch: int,
        loggers: Optional[List[Any]] = None,
        callbacks: Optional[Dict[str, Callback]] = None,
        checkpoint_manager: Optional[CheckpointManager] = None,
        seed: int = 1234,
        log_every_n_steps: int = 50,
        validation_hooks: Optional[List[Callable]] = None,
        use_data_parallelism: bool = True,
        profile_first_epoch: bool = False,
    ):
        self.score_network = score_network
        self.diffusion_config = diffusion_config
        self.optimizer_parameters = optimizer_parameters
        self.output_directory = output_directory
        self.max_epoch = max_epoch
        self.loggers = loggers or []
        self.callbacks = callbacks or {}
        self.checkpoint_manager = checkpoint_manager
        self.seed = seed
        self.log_every_n_steps = log_every_n_steps
        # Hooks run after each validation epoch (sampling visualization, KS
        # metrics, score viewer); signature: hook(trainer, epoch, metrics).
        self.validation_hooks = validation_hooks or []

        self.optimizer = load_optimizer(optimizer_parameters)
        self.lr_scheduler = LearningRateScheduler(
            scheduler_parameters, optimizer_parameters.learning_rate
        )
        self.ema_decay = getattr(optimizer_parameters, "ema_decay", 0.0)

        self.mesh = make_data_mesh() if use_data_parallelism else None
        self.profile_first_epoch = profile_first_epoch
        from ..utils.profiling import PhaseTimer

        self.phase_timer = PhaseTimer()

        self.params = None
        self.opt_state = None
        self.start_epoch = 0
        self.global_step = 0
        self._rng = random.Random(seed)

        conditional_options = (
            (False, True)
            if diffusion_config.score_network_config.conditional_prob > 0
            else (False,)
        )
        regularizer_options = (
            (False, True) if diffusion_config.regularizer is not None else (False,)
        )
        generic_steps = {
            regularized: make_generic_step(
                score_network, diffusion_config, apply_regularizer=regularized
            )
            for regularized in regularizer_options
        }
        self._train_step = {
            (conditional, regularized): jax.jit(
                make_train_step(
                    functools.partial(
                        generic_steps[regularized], conditional=conditional
                    ),
                    self.optimizer,
                    ema_decay=self.ema_decay,
                )
            )
            for conditional in conditional_options
            for regularized in regularizer_options
        }
        # Validation always runs unconditionally and without regularization
        # (reference passes no_conditional=True in validation_step).
        self._eval_step = jax.jit(
            functools.partial(generic_steps[False], conditional=False)
        )

    # ------------------------------------------------------------------ setup

    def _initialize_state(self, example_batch: Dict[str, np.ndarray]) -> None:
        init_key = jax.random.PRNGKey(self.seed)
        from ..namespace import NOISY_AXL_COMPOSITION  # noqa: F401

        # Initialize parameters through one (noised) forward: reuse the
        # generic step's own plumbing by initializing on an augmented batch.
        from ..namespace import (
            ATOM_TYPES,
            AXL,
            CARTESIAN_FORCES,
            LATTICE_PARAMETERS,
            NOISE,
            RELATIVE_COORDINATES,
            TIME,
        )

        x = jnp.asarray(example_batch[RELATIVE_COORDINATES])
        network_batch = {
            NOISY_AXL_COMPOSITION: AXL(
                A=jnp.asarray(example_batch[ATOM_TYPES]),
                X=x,
                L=jnp.asarray(example_batch[LATTICE_PARAMETERS]),
            ),
            TIME: jnp.ones((x.shape[0], 1), x.dtype),
            NOISE: jnp.full((x.shape[0], 1), 0.5, x.dtype),
        }
        if CARTESIAN_FORCES in example_batch:
            network_batch[CARTESIAN_FORCES] = jnp.asarray(
                example_batch[CARTESIAN_FORCES]
            )
        conditional_init = (
            self.diffusion_config.score_network_config.conditional_prob > 0
        )
        self.params = self.score_network.init(
            init_key, network_batch, conditional_init
        )
        score_config = self.diffusion_config.score_network_config
        if getattr(score_config, "use_pretrained", None):
            # Graft a released mace-torch checkpoint into the trunk (the
            # reference's pretrained-feature-extractor mode,
            # mace_utils.py:133) before the optimizer sees the params.
            from ..models.mace_import import load_pretrained_mace_params

            self.params = load_pretrained_mace_params(
                score_config.use_pretrained, self.params, score_config
            )
        self.opt_state = self.optimizer.init(self.params)
        self.ema_params = self.params if self.ema_decay > 0 else None

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params)
        )
        logger.info("Initialized model with %d parameters", n_params)

    @property
    def eval_params(self):
        """Parameters used for validation/sampling: EMA when enabled."""
        return self.ema_params if self.ema_params is not None else self.params

    def make_template_state(self) -> Dict[str, Any]:
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": 0,
            "global_step": 0,
        }
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        return state

    def _maybe_resume(self) -> None:
        if self.checkpoint_manager is None:
            return
        restored = self.checkpoint_manager.restore_last(self.make_template_state())
        if restored is not None:
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
            if self.ema_params is not None:
                self.ema_params = restored.get("ema_params", restored["params"])
            self.start_epoch = int(restored["epoch"]) + 1
            self.global_step = int(restored["global_step"])
            logger.info("Resuming at epoch %d", self.start_epoch)

    # ------------------------------------------------------------------- loop

    def log_figure(self, name: str, figure, epoch: int) -> None:
        log_figure_to_all(self.loggers, name, figure, epoch)

    def _device_put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    def fit(self, datamodule) -> Dict[str, float]:
        """Run the full training; returns the final epoch's metrics."""
        self.datamodule = datamodule  # exposed to validation hooks
        example = next(iter(datamodule.train_batches()))
        if self.mesh is not None:
            from ..namespace import RELATIVE_COORDINATES

            batch_size = example[RELATIVE_COORDINATES].shape[0]
            if batch_size % self.mesh.devices.size != 0:
                logger.warning(
                    "batch size %d is not divisible by the %d-device mesh; "
                    "running single-device (make batch_size a multiple of the "
                    "device count to enable data parallelism)",
                    batch_size,
                    self.mesh.devices.size,
                )
                self.mesh = None
        self._initialize_state(example)
        self._maybe_resume()

        conditional_prob = (
            self.diffusion_config.score_network_config.conditional_prob
        )
        key = jax.random.PRNGKey(self.seed + 1)
        metrics: Dict[str, float] = {}

        import contextlib

        for epoch in range(self.start_epoch, self.max_epoch):
            t0 = time.time()
            trace_context = contextlib.nullcontext()
            if self.profile_first_epoch and epoch == self.start_epoch:
                from ..utils.profiling import device_trace

                trace_context = device_trace(
                    f"{self.output_directory}/profile"
                )
            train_losses = []
            regularizer = self.diffusion_config.regularizer
            regularized = bool(
                regularizer is not None and regularizer.can_regularizer_run(epoch)
            )
            with trace_context:
                for batch in datamodule.train_batches():
                    key, step_key = jax.random.split(key)
                    conditional = (
                        conditional_prob > 0
                        and self._rng.random() < conditional_prob
                    )
                    with self.phase_timer.phase("device_put"):
                        batch = self._device_put(batch)
                    step = self._train_step[(conditional, regularized)]
                    with self.phase_timer.phase("train_step"):
                        if self.ema_params is not None:
                            (
                                self.params,
                                self.opt_state,
                                self.ema_params,
                                aux,
                            ) = step(
                                self.params,
                                self.opt_state,
                                self.ema_params,
                                batch,
                                step_key,
                            )
                        else:
                            self.params, self.opt_state, aux = step(
                                self.params, self.opt_state, batch, step_key
                            )
                    self.global_step += 1
                    train_losses.append(aux)
                    if self.global_step % self.log_every_n_steps == 0:
                        log_metrics_to_all(
                            self.loggers,
                            {"train_step_loss": float(aux["loss"])},
                            self.global_step,
                        )

            metrics = self._reduce_epoch_metrics("train", train_losses)

            with self.phase_timer.phase("validation"):
                val_metrics = self._validate(datamodule, epoch, key)
            metrics.update(val_metrics)
            metrics["epoch"] = epoch
            metrics["epoch_time_s"] = time.time() - t0
            metrics["learning_rate"] = self.lr_scheduler.current_lr

            for hook in self.validation_hooks:
                hook(self, epoch, metrics)

            for callback in self.callbacks.values():
                callback.on_epoch_end(self, epoch, metrics)

            log_metrics_to_all(self.loggers, metrics, epoch)
            logger.info(
                "epoch %d: train %.5f valid %.5f (%.1fs)",
                epoch,
                metrics.get("train_epoch_loss", float("nan")),
                metrics.get("validation_epoch_loss", float("nan")),
                metrics["epoch_time_s"],
            )

            new_lr = self.lr_scheduler.on_epoch_end(
                epoch, metrics.get("validation_epoch_loss")
            )
            self.opt_state = set_learning_rate(self.opt_state, new_lr)

            if self.checkpoint_manager is not None:
                monitored = metrics.get(self.checkpoint_manager.monitor)
                state = {
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "epoch": epoch,
                    "global_step": self.global_step,
                }
                if self.ema_params is not None:
                    state["ema_params"] = self.ema_params
                self.checkpoint_manager.save_epoch(state, monitored)

            if any(cb.should_stop() for cb in self.callbacks.values()):
                break

        for lg in self.loggers:
            lg.finalize()
        self.phase_timer.log_summary(prefix="training ")
        return metrics

    def _validate(self, datamodule, epoch: int, key) -> Dict[str, float]:
        losses = []
        for batch in datamodule.valid_batches():
            key, step_key = jax.random.split(key)
            batch = self._device_put(batch)
            _, aux = self._eval_step(self.eval_params, batch, step_key)
            losses.append(aux)
            for callback in self.callbacks.values():
                callback.on_validation_batch(self, epoch, aux)
        if not losses:
            return {}
        return self._reduce_epoch_metrics("validation", losses)

    @staticmethod
    def _reduce_epoch_metrics(prefix: str, auxes: List[Dict[str, Any]]) -> Dict[str, float]:
        out = {}
        for name, label in (
            ("loss", "epoch_loss"),
            ("loss_X", "epoch_loss_X"),
            ("loss_A", "epoch_loss_A"),
            ("loss_L", "epoch_loss_L"),
            ("regularizer_loss", "epoch_regularizer_loss"),
        ):
            values = [float(a[name]) for a in auxes if name in a]
            if values:
                out[f"{prefix}_{label}"] = float(np.mean(values))
        return out

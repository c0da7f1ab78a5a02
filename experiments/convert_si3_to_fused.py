"""Convert the Si 3x3x3 checkpoint to the Pallas-fused EGNN layout.

Round-3 finding (experiments/buffer_audit.py): the Si 3x3x3 config never
set `use_fused_message_block`, so training/sampling ran the dense path
whose edge-MLP input concat is a (B, 216, 216, 513) float32 — 2.85 GiB at
batch 32 (the observed worker fault) and a huge HBM-bandwidth tax at any
batch. This CLI migrates the trained checkpoint (params + Adam moments +
EMA, utils/egnn_param_migration.py) so the resume trains with the fused
kernel, validates the migrated weights by output parity at N=8 (EGNN
weights are size-agnostic), and re-types the state against real
trainer-shaped templates so orbax resume accepts it.

CPU-only: platform pinned before backend init (axon overrides
JAX_PLATFORMS at import).

Usage:
    python experiments/convert_si3_to_fused.py \
        --source experiments/si_3x3x3_checkpoint \
        --dest experiments/si_3x3x3_checkpoint_fused
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def retype_like(template, raw):
    """Rebuild `raw` with `template`'s container types (NamedTuples etc.).

    Orbax's raw PyTree restore returns plain dicts where optax NamedTuples
    were saved; StandardCheckpointer.save + trainer-side restore-with-
    template want the genuine containers back.
    """
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        return type(template)(
            *(retype_like(getattr(template, f), raw[f] if isinstance(raw, dict)
              else raw[i]) for i, f in enumerate(template._fields))
        )
    if isinstance(template, dict):
        assert set(template) == set(raw), (
            f"key mismatch: {sorted(template)} vs {sorted(raw)}"
        )
        return {k: retype_like(template[k], raw[k]) for k in template}
    if isinstance(template, (tuple, list)):
        return type(template)(retype_like(t, r) for t, r in zip(template, raw))
    return raw


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", default="experiments/si_3x3x3_checkpoint")
    parser.add_argument("--dest", default="experiments/si_3x3x3_checkpoint_fused")
    parser.add_argument("--skip_validation", action="store_true")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import yaml

    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL, CARTESIAN_FORCES, NOISE, NOISY_AXL_COMPOSITION, TIME,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.instantiate_diffusion_model import (
        load_diffusion_model,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.training.optimizer import (
        create_optimizer_parameters,
        load_optimizer,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.utils.egnn_param_migration import (
        migrate_state,
    )

    with open(os.path.join(args.source, "config_backup.yaml")) as fh:
        hyper_params = yaml.safe_load(fh)

    # ---------------------------------------------------------- raw restore
    state_dir = os.path.join(os.path.abspath(args.source), "last_model")
    with ocp.PyTreeCheckpointer() as checkpointer:
        metadata = checkpointer.metadata(state_dir).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), metadata.tree
        )
        raw = checkpointer.restore(
            state_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
    print(f"[convert] restored {state_dir}: epoch {raw.get('epoch')}")

    # ------------------------------------------------------------- migrate
    unfused_network, diffusion_config = load_diffusion_model(hyper_params)
    cfg = diffusion_config.score_network_config
    assert not cfg.use_fused_message_block, "source is already fused?"
    migrated = migrate_state(raw, cfg, to_fused=True)

    # ------------------------------------------- fused template (eval_shape)
    fused_hp = yaml.safe_load(yaml.safe_dump(hyper_params))
    fused_hp["model"]["score_network"]["use_fused_message_block"] = True
    fused_network, fused_diffusion_config = load_diffusion_model(fused_hp)
    fused_cfg = fused_diffusion_config.score_network_config

    natoms = hyper_params["data"]["max_atom"]
    d = fused_cfg.spatial_dimension
    x = jnp.zeros((1, natoms, d))
    init_batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.zeros((1, natoms), jnp.int32),
            X=x,
            L=jnp.ones((1, fused_cfg.num_lattice_parameters)),
        ),
        TIME: jnp.ones((1, 1)),
        NOISE: jnp.full((1, 1), 0.5),
        CARTESIAN_FORCES: jnp.zeros_like(x),
    }
    params_struct = jax.eval_shape(
        lambda k: fused_network.init(k, init_batch, False), jax.random.PRNGKey(0)
    )
    optimizer = load_optimizer(
        create_optimizer_parameters(hyper_params["optimizer"])
    )
    opt_struct = jax.eval_shape(optimizer.init, params_struct)

    template = {
        "params": params_struct,
        "opt_state": opt_struct,
        "epoch": 0,
        "global_step": 0,
    }
    if "ema_params" in raw:
        template["ema_params"] = params_struct

    state = retype_like(template, migrated)
    # Leaf-level structural check against the fused model's own init.
    assert jax.tree_util.tree_structure(state["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda s: 0, params_struct)
        )
    ), "migrated params do not match the fused init structure"
    for leaf, ref in zip(
        jax.tree_util.tree_leaves(state["params"]),
        jax.tree_util.tree_leaves(params_struct),
    ):
        assert tuple(leaf.shape) == tuple(ref.shape), (leaf.shape, ref.shape)

    # ------------------------- output-parity validation (N=216, in-dist)
    # Validate on the trained geometry: the ideal 3x3x3 diamond supercell
    # with a small thermal displacement. Off-manifold inputs are useless
    # here — the trained weights amplify nonsense geometry chaotically
    # (f32-vs-f32 summation-order noise alone reaches tens of percent), so
    # parity is checked in float32 at physical activations. The Pallas
    # kernel itself equals the jnp dense path by test
    # (tests/test_egnn_fused.py::test_pallas_matches_dense); on this CPU
    # validation the dense path substitutes for the interpret-mode kernel.
    if not args.skip_validation:
        from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
            egnn_fused,
        )

        f32_hp = yaml.safe_load(yaml.safe_dump(hyper_params))
        f32_hp["model"]["score_network"]["compute_dtype"] = "float32"
        f32_fused_hp = yaml.safe_load(yaml.safe_dump(f32_hp))
        f32_fused_hp["model"]["score_network"]["use_fused_message_block"] = True
        net_unfused_f32, _ = load_diffusion_model(f32_hp)
        net_fused_f32, _ = load_diffusion_model(f32_fused_hp)

        diamond = jnp.asarray(
            [[0.0, 0.0, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5],
             [0.5, 0.5, 0.0], [0.25, 0.25, 0.25], [0.25, 0.75, 0.75],
             [0.75, 0.25, 0.75], [0.75, 0.75, 0.25]]
        )
        offsets = jnp.stack(
            jnp.meshgrid(*([jnp.arange(3.0)] * 3), indexing="ij"), axis=-1
        ).reshape(-1, 1, 3)
        supercell = ((diamond[None] + offsets) / 3.0).reshape(1, -1, 3)
        key = jax.random.PRNGKey(3)
        xv = (supercell + 0.004 * jax.random.normal(key, supercell.shape)) % 1.0
        batch = {
            NOISY_AXL_COMPOSITION: AXL(
                A=jnp.zeros((1, xv.shape[1]), jnp.int32),
                X=xv,
                L=jnp.concatenate(
                    [jnp.full((1, d), 16.29),
                     jnp.zeros((1, fused_cfg.num_lattice_parameters - d))],
                    axis=-1,
                ),
            ),
            TIME: jnp.full((1, 1), 0.5),
            NOISE: jnp.full((1, 1), 0.05),
            CARTESIAN_FORCES: jnp.zeros_like(xv),
        }

        # Acceptance criterion: the migrated fused network must sit at
        # least as close to the float32 ground truth as the *trained*
        # precision's own rounding noise (unfused bf16 vs unfused f32) —
        # the fused path's f32 accumulation typically makes it ~3x closer.
        net_unfused_bf16, _ = load_diffusion_model(hyper_params)
        orig_pallas = egnn_fused.pallas_message_block
        egnn_fused.pallas_message_block = egnn_fused.dense_message_block
        try:
            for params_key in (
                ("params", "ema_params") if "ema_params" in raw else ("params",)
            ):
                p_ref = jax.tree_util.tree_map(jnp.asarray, raw[params_key])
                p_new = jax.tree_util.tree_map(jnp.asarray, state[params_key])
                truth = net_unfused_f32.apply(p_ref, batch, False).X
                trained = net_unfused_bf16.apply(p_ref, batch, False).X
                migrated_out = fused_network.apply(p_new, batch, False).X

                def rms(v):
                    return float(jnp.sqrt(jnp.mean(v**2)))

                floor = rms(trained - truth)
                err = rms(migrated_out - truth)
                print(
                    f"[convert] {params_key}: rms distance to f32 truth — "
                    f"fused(migrated) {err:.5f} vs trained-bf16 floor "
                    f"{floor:.5f} (score rms {rms(truth):.4f})"
                )
                assert err < 1.5 * floor + 1e-6, (
                    f"migrated fused output further from f32 truth than the "
                    f"trained precision's own noise: {err} vs floor {floor}"
                )
        finally:
            egnn_fused.pallas_message_block = orig_pallas

    # ----------------------------------------------------------------- save
    dest = os.path.abspath(args.dest)
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(os.path.join(dest, "last_model"), state, force=True)
        checkpointer.wait_until_finished()
    # No config_backup.yaml on purpose: the resume runs with the new fused
    # config, which the trainer re-backs-up (deliberate extension, same
    # policy as the max_epoch bumps).
    print(f"[convert] wrote {dest}/last_model (epoch {raw.get('epoch')}, fused)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

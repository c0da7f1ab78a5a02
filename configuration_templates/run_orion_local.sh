#!/bin/bash
# Local Orion HPO launch for the MLP Si 1x1x1 template.
# (reference: configuration_templates/run_scripts/run_orion_local.sh)
set -e

export ORION_DB_ADDRESS='orion_db.pkl'
export ORION_DB_TYPE='pickleddb'

ROOT_DIR="$(dirname "$0")/.."
CONFIG=${ROOT_DIR}/configuration_templates/config_diffusion_mlp_orion.yaml

orion -v hunt --config "${ROOT_DIR}/configuration_templates/orion_config.yaml" \
    python -m diffusion_for_multi_scale_molecular_dynamics_tpu.train_diffusion \
    --config "$CONFIG" \
    --output '{exp.working_dir}/{trial.id}/'

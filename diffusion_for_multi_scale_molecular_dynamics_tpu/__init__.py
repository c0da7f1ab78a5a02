"""TPU-native crystal-diffusion framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of
mila-iqia/diffusion_for_multi_scale_molecular_dynamics for TPU hardware:
score-based generative diffusion over periodic crystals with the AXL state
(D3PM atom types, wrapped-Gaussian relative coordinates, Gaussian lattice
parameters), scanned samplers fully resident on device, a vectorized JAX
Stillinger-Weber oracle, and the active-learning orchestration around it.
"""

import jax as _jax

# Precision policy: float32 arrays get true float32 contractions; reduced
# precision is an explicit opt-in through each model's `compute_dtype`
# (bfloat16 inputs still run at full MXU rate). Without this, the backend
# default silently rounds fp32 matmuls through bfloat16, which breaks score
# targets, D3PM probability algebra and equivariance beyond ~1e-3.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"

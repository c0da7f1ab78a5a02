"""TPU-native crystal-diffusion framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of
mila-iqia/diffusion_for_multi_scale_molecular_dynamics for TPU hardware:
score-based generative diffusion over periodic crystals with the AXL state
(D3PM atom types, wrapped-Gaussian relative coordinates, Gaussian lattice
parameters), scanned samplers fully resident on device, a vectorized JAX
Stillinger-Weber oracle, and the active-learning orchestration around it.
"""

__version__ = "0.1.0"

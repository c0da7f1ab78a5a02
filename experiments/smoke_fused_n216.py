"""TPU lowering smoke: fused EGNN forward+backward at n=216, 8-row blocks.

The r3k/r3l fused resumes died in Mosaic lowering (18-row blocks, then the
lane-crossing [P, 1] reshapes). This compiles and executes value_and_grad
of the fused message block at production Si 3x3x3 geometry (n=216,
H=C=256, 5-layer stacks) so a train relaunch cannot fail at compile time.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_fused import (  # noqa: E402
    fused_message_block,
    init_message_block_params,
)

N, F, H, C = 216, 8, 256, 256
N_MSG, N_COORD = 5, 5
BATCH = 16

key = jax.random.PRNGKey(0)
params = init_message_block_params(key, F, H, N_MSG, N_COORD, C)
h = jax.random.normal(jax.random.PRNGKey(1), (BATCH, N, F))
radial = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, N, N))
weights = (jax.random.uniform(jax.random.PRNGKey(3), (BATCH, N, N)) < 0.3
           ).astype(jnp.float32) * (1.0 - jnp.eye(N))


def loss(params, h):
    m_agg, phi = fused_message_block(params, h, radial, weights, N_MSG, N_COORD, True)
    return jnp.sum(m_agg**2) + jnp.sum(phi**2)


t0 = time.time()
val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(params, h)
val = float(val)
gnorm = float(
    jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
)
print(f"compiled+ran in {time.time() - t0:.1f}s on {jax.devices()[0].device_kind}")
print(f"loss {val:.4e} grad-norm {gnorm:.4e}")
assert np.isfinite(val) and np.isfinite(gnorm)
print("FUSED N=216 TPU SMOKE PASSED")

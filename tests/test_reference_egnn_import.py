"""Cross-framework parity: reference torch EGNN -> imported flax EGNN.

Instantiates the *reference's own* EGNN score network (torch, from
/root/reference — heavyweight deps stubbed since only the EGNN path runs),
evaluates it on a batch, imports its state dict with
models/egnn_import.py, and checks this framework's EGNNScoreNetwork
reproduces the torch outputs. This is direct evidence that reference-trained
checkpoints migrate losslessly.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason="reference checkout unavailable"
)


class _Anything:
    def __getattr__(self, name):
        return _Anything()

    def __call__(self, *args, **kwargs):
        return _Anything()


@pytest.fixture(scope="module")
def reference_modules():
    """Import the reference EGNN with its heavyweight deps stubbed."""
    torch = pytest.importorskip("torch")
    np.NaN = np.nan  # numpy>=2 shim for the reference code
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    for name in (
        "e3nn",
        "torch_geometric",
        "torch_geometric.data",
        "pykeops",
        "pykeops.torch",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["e3nn"].o3 = _Anything()
    sys.modules["torch_geometric.data"].Data = object
    sys.modules["pykeops.torch"].LazyTensor = object

    from diffusion_for_multi_scale_molecular_dynamics.models.score_networks.egnn_score_network import (  # noqa: E501
        EGNNScoreNetwork as ReferenceEGNN,
        EGNNScoreNetworkParameters as ReferenceParameters,
    )
    from diffusion_for_multi_scale_molecular_dynamics import namespace as ref_ns

    return torch, ReferenceEGNN, ReferenceParameters, ref_ns


SIZES = dict(
    n_layers=2,
    message_hidden_dimensions_size=16,
    message_n_hidden_dimensions=2,
    node_hidden_dimensions_size=16,
    node_n_hidden_dimensions=2,
    coordinate_hidden_dimensions_size=16,
    coordinate_n_hidden_dimensions=2,
)


@pytest.mark.parametrize("use_fused", [False, True], ids=["dense", "fused"])
def test_reference_egnn_outputs_reproduced(reference_modules, use_fused):
    torch, ReferenceEGNN, ReferenceParameters, ref_ns = reference_modules

    reference = ReferenceEGNN(
        ReferenceParameters(
            num_atom_types=1, edges="fully_connected", **SIZES
        )
    ).eval()

    torch.manual_seed(0)
    batch_size, natoms, d = 2, 4, 3
    x = torch.rand(batch_size, natoms, d)
    atom_types = torch.zeros(batch_size, natoms, dtype=torch.long)
    lattice = torch.cat(
        [5.43 * torch.ones(batch_size, 3), torch.zeros(batch_size, 3)], dim=1
    )
    sigma = torch.full((batch_size, 1), 0.13)
    time_value = torch.full((batch_size, 1), 0.41)
    ref_batch = {
        ref_ns.NOISY_AXL_COMPOSITION: ref_ns.AXL(
            A=atom_types, X=x, L=lattice
        ),
        ref_ns.NOISE: sigma,
        ref_ns.TIME: time_value,
        ref_ns.CARTESIAN_FORCES: torch.zeros_like(x),
    }
    with torch.no_grad():
        ref_out = reference(ref_batch)

    # ---- import the weights into this framework ----
    import jax
    import jax.numpy as jnp

    from diffusion_for_multi_scale_molecular_dynamics_tpu.models import (
        EGNNScoreNetwork,
        EGNNScoreNetworkConfig,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.models.egnn_import import (
        convert_reference_egnn_state_dict,
        verify_converted_params,
    )
    from diffusion_for_multi_scale_molecular_dynamics_tpu.namespace import (
        AXL,
        CARTESIAN_FORCES,
        NOISE,
        NOISY_AXL_COMPOSITION,
        TIME,
    )

    config = EGNNScoreNetworkConfig(
        num_atom_types=1,
        edges="fully_connected",
        use_fused_message_block=use_fused,
        **SIZES,
    )
    network = EGNNScoreNetwork(config)
    state_dict = {
        name: tensor.numpy() for name, tensor in reference.state_dict().items()
    }
    params = convert_reference_egnn_state_dict(state_dict, config)

    jax_batch = {
        NOISY_AXL_COMPOSITION: AXL(
            A=jnp.asarray(atom_types.numpy()),
            X=jnp.asarray(x.numpy()),
            L=jnp.asarray(lattice.numpy()),
        ),
        NOISE: jnp.asarray(sigma.numpy()),
        TIME: jnp.asarray(time_value.numpy()),
        CARTESIAN_FORCES: jnp.zeros((batch_size, natoms, d)),
    }
    verify_converted_params(network, params, jax_batch)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = network.apply(params, jax_batch, False)

    tolerance = 5e-3 if use_fused else 5e-5  # fused path runs bf16 matmuls
    np.testing.assert_allclose(
        np.asarray(out.X), ref_out.X.numpy(), atol=tolerance,
        err_msg="imported EGNN coordinate scores diverge from the reference",
    )
    np.testing.assert_allclose(
        np.asarray(out.A)[..., :-1], ref_out.A.numpy()[..., :-1], atol=tolerance
    )

"""Import reference-trained EGNN checkpoints (torch) into this framework.

The reference trains its production EGNN score network with
pytorch-lightning (src/diffusion_for_multi_scale_molecular_dynamics/models/
{egnn.py:21-385, score_networks/egnn_score_network.py:48}). This module maps
such torch weights onto this framework's EGNNScoreNetwork — both the dense
jnp path and the Pallas-fused path (whose layer-0 keeps the un-split
[2F+1, H] layout precisely so reference weights drop in) — letting a
reference user migrate trained models without retraining.

Correspondence (torch Linear stores [out, in]; flax Dense stores [in, out]):

    embedding_in.weight/bias                    -> embedding_in.kernel^T/bias
    node_classification_layer.weight/bias       -> node_classification
    graph_layers.{L}.message_mlp.{2k}           -> egcl_{L} message Dense / fused message_w{k}
    graph_layers.{L}.coord_mlp.{2l} (+final)    -> egcl_{L} coord Dense / fused coord_w{l}, coord_wf
    graph_layers.{L}.node_mlp.{2j} (+final)     -> egcl_{L} node Dense

Works on raw ``state_dict``s, ``{"state_dict": ...}`` checkpoints (the
Lightning layout, with ``score_network.egnn.`` prefixes), and plain torch
files. torch is only required at conversion time, never at runtime.
"""

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into a flat {name: numpy array} dict."""
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(loaded, "state_dict"):
        loaded = loaded.state_dict()
    if isinstance(loaded, dict) and "state_dict" in loaded:
        loaded = loaded["state_dict"]
    assert isinstance(loaded, dict), f"unsupported checkpoint layout in {path}"
    return {
        name: np.asarray(tensor.detach().cpu().numpy())
        for name, tensor in loaded.items()
        if hasattr(tensor, "detach")
    }


def _strip_to_egnn(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reduce any prefix (e.g. 'score_network.egnn.') so keys start at
    'embedding_in' / 'graph_layers' / 'node_classification_layer'."""
    anchors = ("embedding_in.weight",)
    for name in state_dict:
        for anchor in anchors:
            if name.endswith(anchor):
                prefix = name[: -len(anchor)]
                return {
                    key[len(prefix):]: value
                    for key, value in state_dict.items()
                    if key.startswith(prefix)
                }
    raise ValueError("no EGNN weights (embedding_in.weight) found in checkpoint")


def _dense(weight: np.ndarray, bias=None) -> Dict[str, np.ndarray]:
    entry = {"kernel": np.ascontiguousarray(weight.T.astype(np.float32))}
    if bias is not None:
        entry["bias"] = bias.astype(np.float32)
    return entry


def convert_reference_egnn_state_dict(
    state_dict: Dict[str, np.ndarray], config
) -> Dict[str, Any]:
    """Torch EGNN state dict -> flax params for EGNNScoreNetwork(config).

    Args:
        state_dict: flat numpy state dict (any enclosing prefix allowed).
        config: the matching EGNNScoreNetworkConfig (same layer counts/sizes;
            shapes are asserted).

    Returns:
        {"params": ...} pytree ready for EGNNScoreNetwork.apply.
    """
    sd = _strip_to_egnn(state_dict)
    n_message = config.message_n_hidden_dimensions + 1
    n_coord = config.coordinate_n_hidden_dimensions + 1
    n_node = config.node_n_hidden_dimensions + 1

    params: Dict[str, Any] = {
        "embedding_in": _dense(sd["embedding_in.weight"], sd["embedding_in.bias"]),
        "node_classification": _dense(
            sd["node_classification_layer.weight"],
            sd["node_classification_layer.bias"],
        ),
    }

    for layer in range(config.n_layers):
        prefix = f"graph_layers.{layer}"
        message = [
            (sd[f"{prefix}.message_mlp.{2 * k}.weight"],
             sd[f"{prefix}.message_mlp.{2 * k}.bias"])
            for k in range(n_message)
        ]
        coord = [
            (sd[f"{prefix}.coord_mlp.{2 * k}.weight"],
             sd[f"{prefix}.coord_mlp.{2 * k}.bias"])
            for k in range(n_coord)
        ]
        coord_final = sd[f"{prefix}.coord_mlp.{2 * n_coord}.weight"]
        node = [
            (sd[f"{prefix}.node_mlp.{2 * k}.weight"],
             sd[f"{prefix}.node_mlp.{2 * k}.bias"])
            for k in range(n_node)
        ]
        node_final = (
            sd[f"{prefix}.node_mlp.{2 * n_node}.weight"],
            sd[f"{prefix}.node_mlp.{2 * n_node}.bias"],
        )

        egcl: Dict[str, Any] = {}
        if config.use_fused_message_block:
            fused = {
                "message_w0": np.ascontiguousarray(
                    message[0][0].T.astype(np.float32)
                ),
                "message_b0": message[0][1].astype(np.float32),
            }
            for k in range(1, n_message):
                fused[f"message_w{k}"] = np.ascontiguousarray(
                    message[k][0].T.astype(np.float32)
                )
                fused[f"message_b{k}"] = message[k][1].astype(np.float32)
            for k in range(n_coord):
                fused[f"coord_w{k}"] = np.ascontiguousarray(
                    coord[k][0].T.astype(np.float32)
                )
                fused[f"coord_b{k}"] = coord[k][1].astype(np.float32)
            fused["coord_wf"] = np.ascontiguousarray(
                coord_final.T.astype(np.float32)
            )
            egcl["fused_message_block"] = fused
            node_dense_start = 0
        else:
            index = 0
            for weight, bias in message:
                egcl[f"Dense_{index}"] = _dense(weight, bias)
                index += 1
            for weight, bias in coord:
                egcl[f"Dense_{index}"] = _dense(weight, bias)
                index += 1
            egcl[f"Dense_{index}"] = _dense(coord_final)  # no bias
            index += 1
            node_dense_start = index
        index = node_dense_start
        for weight, bias in node:
            egcl[f"Dense_{index}"] = _dense(weight, bias)
            index += 1
        egcl[f"Dense_{index}"] = _dense(node_final[0], node_final[1])
        params[f"egcl_{layer}"] = egcl

    return {"params": params}


def load_reference_egnn_checkpoint(path: str, config):
    """Load a reference Lightning/torch EGNN checkpoint as flax params."""
    state_dict = load_torch_state_dict(path)
    params = convert_reference_egnn_state_dict(state_dict, config)
    logger.info("Imported reference EGNN weights from %s", path)
    return params


def verify_converted_params(network, params, example_batch) -> None:
    """Shape-check: converted params must match a fresh init exactly."""
    import jax

    template = network.init(jax.random.PRNGKey(0), example_batch, False)
    template_shapes = jax.tree_util.tree_map(lambda x: x.shape, template)
    converted_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    if template_shapes != converted_shapes:
        raise ValueError(
            "converted parameter tree does not match the network: "
            f"{template_shapes} vs {converted_shapes}"
        )

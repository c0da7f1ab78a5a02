"""Migrate EGNN checkpoints between the unfused and Pallas-fused layouts.

The two `_DenseEGCL` code paths (models/egnn_score_network.py) hold
identical algebra in different parameter layouts:

* unfused: one flax ``Dense_i`` per MLP layer, numbered in call order —
  message MLP (``Dense_0 .. Dense_{Lm-1}``, where ``Dense_0`` consumes the
  concatenated ``[h_i, h_j, r^2]``), coordinate MLP
  (``Dense_{Lm} .. Dense_{Lm+Lc-1}``), the scalar gate
  ``Dense_{Lm+Lc}`` (no bias), then the node update
  (``Dense_{Lm+Lc+1} ..``).
* fused: a single ``fused_message_block`` pytree
  (``message_w*/b*``, ``coord_w*/b*``, ``coord_wf`` — see
  models/egnn_fused.py:init_message_block_params) covering message +
  coordinate MLPs; the node update keeps flax Denses, renumbered from 0.

The mapping is a bijection on arrays (``message_w0`` keeps the unfused
``Dense_0`` kernel's ``[2F+1, H]`` layout — the fused path splits it at
apply time), so a checkpoint trained on either path converts exactly; only
bf16 rounding in the fused layer-0 factorization differs at apply time.

Optimizer moments (Adam mu/nu) and EMA parameters mirror the parameter
tree elementwise, so the same structural rewrite applies to them — the
public entry point `migrate_state` rewrites every EGCL-shaped subtree it
finds anywhere in the checkpoint state.

The reference has no counterpart (single torch layout); this supports the
TPU framework's dual dense/Pallas execution paths.
"""

import logging
import re
from typing import Any, Dict, Mapping

logger = logging.getLogger(__name__)

_DENSE = re.compile(r"^Dense_(\d+)$")


def egcl_layer_counts(score_network_config) -> Dict[str, int]:
    """Per-EGCL layer counts implied by an EGNN score-network config."""
    if getattr(score_network_config, "attention", False):
        # attention=True inserts an extra gate Dense between the message and
        # coordinate MLPs; the fused kernel has no slot for it, so migration
        # would only fail later with the generic 'no EGCL subtrees' error.
        raise ValueError(
            "attention=True checkpoints cannot migrate to/from the fused "
            "EGCL layout: the fused message block does not implement the "
            "attention gate (models/egnn_fused.py)."
        )
    lm = score_network_config.message_n_hidden_dimensions + 1
    lc = score_network_config.coordinate_n_hidden_dimensions + 1
    ln = score_network_config.node_n_hidden_dimensions + 2
    return {"message": lm, "coordinate": lc, "node": ln}


def _is_unfused_egcl(node: Mapping, lm: int, lc: int, ln: int) -> bool:
    if not isinstance(node, Mapping) or "fused_message_block" in node:
        return False
    idx = sorted(
        int(m.group(1)) for k in node if (m := _DENSE.match(str(k)))
    )
    return idx == list(range(lm + lc + 1 + ln))


def _is_fused_egcl(node: Mapping, ln: int) -> bool:
    if not isinstance(node, Mapping) or "fused_message_block" not in node:
        return False
    idx = sorted(
        int(m.group(1)) for k in node if (m := _DENSE.match(str(k)))
    )
    return idx == list(range(ln))


def egcl_to_fused(egcl: Mapping, lm: int, lc: int, ln: int) -> Dict[str, Any]:
    """Rewrite one unfused EGCL parameter dict into the fused layout."""
    block: Dict[str, Any] = {}
    for i in range(lm):
        dense = egcl[f"Dense_{i}"]
        block[f"message_w{i}"] = dense["kernel"]
        block[f"message_b{i}"] = dense["bias"]
    for j in range(lc):
        dense = egcl[f"Dense_{lm + j}"]
        block[f"coord_w{j}"] = dense["kernel"]
        block[f"coord_b{j}"] = dense["bias"]
    block["coord_wf"] = egcl[f"Dense_{lm + lc}"]["kernel"]
    out: Dict[str, Any] = {"fused_message_block": block}
    for k in range(ln):
        out[f"Dense_{k}"] = egcl[f"Dense_{lm + lc + 1 + k}"]
    return out


def egcl_to_unfused(egcl: Mapping, lm: int, lc: int, ln: int) -> Dict[str, Any]:
    """Inverse of `egcl_to_fused`."""
    block = egcl["fused_message_block"]
    out: Dict[str, Any] = {}
    for i in range(lm):
        out[f"Dense_{i}"] = {
            "kernel": block[f"message_w{i}"],
            "bias": block[f"message_b{i}"],
        }
    for j in range(lc):
        out[f"Dense_{lm + j}"] = {
            "kernel": block[f"coord_w{j}"],
            "bias": block[f"coord_b{j}"],
        }
    out[f"Dense_{lm + lc}"] = {"kernel": block["coord_wf"]}
    for k in range(ln):
        out[f"Dense_{lm + lc + 1 + k}"] = egcl[f"Dense_{k}"]
    return out


def migrate_state(state: Any, score_network_config, to_fused: bool = True) -> Any:
    """Rewrite every EGCL-shaped subtree in a checkpoint state.

    Works on the full saved state ({params, opt_state, ema_params, ...}):
    Adam moments and EMA trees mirror the parameter structure, so the same
    pattern-matching rewrite converts them all in one pass. Containers are
    rebuilt with their own types (dict / NamedTuple / tuple / list), leaves
    pass through untouched.
    """
    counts = egcl_layer_counts(score_network_config)
    lm, lc, ln = counts["message"], counts["coordinate"], counts["node"]
    matcher = _is_unfused_egcl if to_fused else _is_fused_egcl
    rewrite = egcl_to_fused if to_fused else egcl_to_unfused
    hits = 0

    def visit(node):
        nonlocal hits
        if isinstance(node, Mapping):
            new = {}
            for key, value in node.items():
                if (
                    isinstance(value, Mapping)
                    and (
                        matcher(value, lm, lc, ln)
                        if to_fused
                        else matcher(value, ln)
                    )
                ):
                    hits += 1
                    new[key] = rewrite(value, lm, lc, ln)
                else:
                    new[key] = visit(value)
            return type(node)(new) if not isinstance(node, dict) else new
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(visit(v) for v in node))
        if isinstance(node, (tuple, list)):
            return type(node)(visit(v) for v in node)
        return node

    migrated = visit(state)
    direction = "unfused->fused" if to_fused else "fused->unfused"
    logger.info("EGCL migration %s: rewrote %d subtree(s)", direction, hits)
    if hits == 0:
        raise ValueError(
            f"no EGCL subtrees matched the {direction} layout "
            f"(lm={lm}, lc={lc}, ln={ln}) — wrong config or already migrated?"
        )
    return migrated

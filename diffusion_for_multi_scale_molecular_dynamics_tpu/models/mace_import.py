r"""Import mace-torch checkpoints into the native MACE trunk.

The reference loads released pretrained MACE models (small/medium/large) as
frozen feature extractors (src/diffusion_for_multi_scale_molecular_dynamics/
models/mace_utils.py:133, score_networks/mace_score_network.py:107-127). This
module maps a mace-torch ``state_dict`` onto the flax parameters of
:class:`~..models.mace_modules.MaceFeatureExtractor`.

What maps exactly (identical layout + normalization by construction):

* ``node_embedding.linear.weight``           -> ``node_embedding/w_*``
* ``interactions.K.linear_up.weight``        -> ``interaction_K/linear_up``
* ``interactions.K.conv_tp_weights.layerJ``  -> ``interaction_K/conv_tp_weights``
* ``interactions.K.linear.weight``           -> ``interaction_K/linear``
* ``interactions.K.skip_tp.weight``          -> ``interaction_K/skip_tp``
* ``products.K.linear.weight``               -> ``product_linear_K``
* ``products.K.symmetric_contractions.contractions.I.{weights_max,weights.J}``
                                             -> ``product_K/w{3,2,1}_I`` (when
  the path counts agree; the torch side uses e3nn's symmetrized U-matrix
  basis, this side iterated Clebsch-Gordan couplings — same span, so a path
  count mismatch means the bases differ and the block is reported instead of
  silently mis-mapped).

Honest caveats, recorded in the returned report: e3nn's flat-weight
instruction ordering (input-group-major) and its spherical-harmonic sign
conventions are assumed; this environment has no mace/e3nn install or
network egress, so bit-level agreement against mace-torch outputs cannot be
asserted here — the round-trip export/import tests in
tests/test_mace_import.py pin the schema instead. Readout/energy heads
(``readouts.*``, ``atomic_energies_fn.*``, ``scale_shift.*``) are
intentionally ignored: the reference uses MACE only up to its node features.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..ops.so3 import Irreps
from .mace_modules import _symmetric_paths, interaction_irreps

logger = logging.getLogger(__name__)

_IGNORED_PREFIXES = ("readouts.", "atomic_energies_fn.", "scale_shift.")


@dataclass
class ImportReport:
    """What happened to every checkpoint tensor."""

    mapped: List[str] = field(default_factory=list)
    ignored: List[str] = field(default_factory=list)
    mismatched: List[str] = field(default_factory=list)
    missing: List[str] = field(default_factory=list)
    # Symmetric-contraction tensors whose *shape* matched but whose torch
    # weights live in e3nn's symmetrized-U basis while this trunk couples via
    # iterated Clebsch-Gordan paths: the import assumes the bases coincide,
    # which is only guaranteed for correlation-1 (linear) blocks.
    basis_assumed: List[str] = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"mapped {len(self.mapped)}, ignored {len(self.ignored)}, "
            f"mismatched {len(self.mismatched)}, missing {len(self.missing)}, "
            f"basis-assumed {len(self.basis_assumed)}"
        )


def _linear_blocks(
    irreps_in: Irreps, irreps_out: Irreps
) -> List[Tuple[int, int, int, int]]:
    """(i_in, i_out, mul_in, mul_out) in e3nn instruction order (input-major)."""
    blocks = []
    for i_in, (mul_in, ir_in) in enumerate(irreps_in):
        for i_out, (mul_out, ir_out) in enumerate(irreps_out):
            if ir_in == ir_out:
                blocks.append((i_in, i_out, mul_in, mul_out))
    return blocks


def _split_linear_weight(
    flat: np.ndarray, irreps_in: Irreps, irreps_out: Irreps, name: str
) -> Dict[str, np.ndarray]:
    """Flat e3nn Linear weight -> {w_{i_in}_{i_out}: [mul_in, mul_out]}."""
    blocks = _linear_blocks(irreps_in, irreps_out)
    expected = sum(mi * mo for _, _, mi, mo in blocks)
    assert flat.size == expected, (
        f"{name}: flat weight has {flat.size} entries, layout expects {expected} "
        f"({irreps_in} -> {irreps_out})"
    )
    out, offset = {}, 0
    for i_in, i_out, mul_in, mul_out in blocks:
        count = mul_in * mul_out
        out[f"w_{i_in}_{i_out}"] = flat[offset:offset + count].reshape(
            mul_in, mul_out
        )
        offset += count
    return out


def _merge_linear_weight(
    params: Dict[str, np.ndarray], irreps_in: Irreps, irreps_out: Irreps
) -> np.ndarray:
    """Inverse of :func:`_split_linear_weight` (for the exporter)."""
    pieces = [
        np.asarray(params[f"w_{i_in}_{i_out}"]).reshape(-1)
        for i_in, i_out, _, _ in _linear_blocks(irreps_in, irreps_out)
    ]
    return np.concatenate(pieces)


def _split_skip_tp_weight(
    flat: np.ndarray,
    irreps_features: Irreps,
    num_elements: int,
    irreps_out: Irreps,
    name: str,
) -> Dict[str, np.ndarray]:
    """FCTP(features, element-one-hot -> out) flat weight -> ScalarTensorProduct.

    mace-torch passes (node_feats, node_attrs), i.e. in1 = features and
    in2 = scalars; our ScalarTensorProduct takes (scalars, features), so each
    [mul_f, E, mul_out] block transposes to [E, mul_f, mul_out] and is stored
    as ``w_{i_scalar=0}_{i_feature}_{i_out}``.
    """
    blocks = [
        (i_f, i_out, mul_f, mul_out)
        for i_f, (mul_f, ir_f) in enumerate(irreps_features)
        for i_out, (mul_out, ir_out) in enumerate(irreps_out)
        if ir_f == ir_out
    ]
    expected = sum(mf * num_elements * mo for _, _, mf, mo in blocks)
    assert flat.size == expected, (
        f"{name}: flat FCTP weight has {flat.size} entries, expected {expected}"
    )
    out, offset = {}, 0
    for i_f, i_out, mul_f, mul_out in blocks:
        count = mul_f * num_elements * mul_out
        block = flat[offset:offset + count].reshape(mul_f, num_elements, mul_out)
        out[f"w_0_{i_f}_{i_out}"] = np.transpose(block, (1, 0, 2))
        offset += count
    return out


def _merge_skip_tp_weight(
    params: Dict[str, np.ndarray],
    irreps_features: Irreps,
    num_elements: int,
    irreps_out: Irreps,
) -> np.ndarray:
    pieces = []
    for i_f, (mul_f, ir_f) in enumerate(irreps_features):
        for i_out, (mul_out, ir_out) in enumerate(irreps_out):
            if ir_f == ir_out:
                block = np.asarray(params[f"w_0_{i_f}_{i_out}"])
                pieces.append(np.transpose(block, (1, 0, 2)).reshape(-1))
    return np.concatenate(pieces)


def _layer_layout(config) -> List[Dict[str, Irreps]]:
    """Per-interaction irreps metadata, mirroring MaceFeatureExtractor."""
    hidden = Irreps(config.hidden_irreps)
    scalar_hidden = Irreps([(mul, ir) for mul, ir in hidden if ir.l == 0])
    channels = hidden[0][0]
    message = interaction_irreps(channels, config.max_ell)
    layers = []
    current = scalar_hidden
    for index in range(config.num_interactions):
        last = index == config.num_interactions - 1
        target = scalar_hidden if last else hidden
        layers.append(
            {
                "in": current,
                "message": message,
                "target": target,
                "residual": index > 0,
            }
        )
        current = target
    return layers


def import_mace_state_dict(
    state_dict: Dict[str, np.ndarray], config, strict: bool = True
) -> Tuple[Dict, ImportReport]:
    """Map a mace-torch state dict onto MaceFeatureExtractor parameters.

    Args:
        state_dict: flat {name: array} (from ``torch_model.state_dict()``,
            loaded e.g. with models/egnn_import.py::load_torch_state_dict).
        config: a MaceScoreNetworkConfig (or anything with hidden_irreps,
            num_interactions, max_ell, correlation, resolved_num_elements,
            radial_mlp, num_bessel, r_max).
        strict: raise if any expected tensor is missing or mismatched.

    Returns:
        (trunk params pytree for the ``mace`` module scope, ImportReport)
    """
    tensors = {k: np.asarray(v) for k, v in state_dict.items()}
    report = ImportReport()
    params: Dict[str, Dict] = {}
    num_elements = config.resolved_num_elements
    hidden = Irreps(config.hidden_irreps)
    scalar_hidden = Irreps([(mul, ir) for mul, ir in hidden if ir.l == 0])
    attrs_irreps = Irreps(f"{num_elements}x0e")

    def take(name: str):
        if name not in tensors:
            report.missing.append(name)
            if strict:
                raise KeyError(f"checkpoint is missing {name}")
            return None
        report.mapped.append(name)
        return tensors.pop(name)

    flat = take("node_embedding.linear.weight")
    if flat is not None:
        params["node_embedding"] = _split_linear_weight(
            flat, attrs_irreps, scalar_hidden, "node_embedding"
        )

    bessel = tensors.pop("radial_embedding.bessel_fn.bessel_weights", None)
    if bessel is not None:
        # Non-trainable in the released models; verify it matches the fixed
        # n*pi/r_max frequencies this implementation hardcodes.
        expected = np.arange(1, config.num_bessel + 1) * math.pi / config.r_max
        if np.allclose(bessel, expected, rtol=1e-4) or np.allclose(
            bessel, expected * config.r_max, rtol=1e-4
        ):
            report.mapped.append("radial_embedding.bessel_fn.bessel_weights")
        else:
            report.mismatched.append(
                "radial_embedding.bessel_fn.bessel_weights (trained Bessel "
                "frequencies are not supported; fixed n*pi/r_max assumed)"
            )
            if strict:
                raise ValueError(report.mismatched[-1])

    for index, layout in enumerate(_layer_layout(config)):
        prefix = f"interactions.{index}"
        scope: Dict[str, Dict] = {}
        flat = take(f"{prefix}.linear_up.weight")
        if flat is not None:
            scope["linear_up"] = _split_linear_weight(
                flat, layout["in"], layout["in"], f"{prefix}.linear_up"
            )
        radial: Dict[str, np.ndarray] = {}
        for depth in range(len(tuple(config.radial_mlp)) + 1):
            w = take(f"{prefix}.conv_tp_weights.layer{depth}.weight")
            if w is not None:
                radial[f"layer{depth}"] = w
        scope["conv_tp_weights"] = radial
        flat = take(f"{prefix}.linear.weight")
        if flat is not None:
            scope["linear"] = _split_linear_weight(
                flat, layout["message"], layout["message"], f"{prefix}.linear"
            )
        flat = take(f"{prefix}.skip_tp.weight")
        if flat is not None:
            skip_features = (
                layout["in"] if layout["residual"] else layout["message"]
            )
            skip_target = (
                layout["target"] if layout["residual"] else layout["message"]
            )
            scope["skip_tp"] = _split_skip_tp_weight(
                flat, skip_features, num_elements, skip_target,
                f"{prefix}.skip_tp",
            )
        params[f"interaction_{index}"] = scope

        # Product basis: one contraction per output irrep group.
        product: Dict[str, np.ndarray] = {}
        for i_out, (mul_out, ir_out) in enumerate(layout["target"]):
            order1, order2, order3 = _symmetric_paths(
                layout["message"], ir_out, config.correlation
            )
            torch_prefix = (
                f"products.{index}.symmetric_contractions.contractions.{i_out}"
            )
            # mace-torch stores the max-correlation weights as weights_max and
            # the lower orders (descending) as weights.0, weights.1, ...
            by_order = {3: order3, 2: order2, 1: order1}
            orders = list(range(config.correlation, 0, -1))
            sources = [
                (f"{torch_prefix}.weights_max", f"w{orders[0]}_{i_out}",
                 by_order[orders[0]])
            ]
            for j, order in enumerate(orders[1:]):
                sources.append(
                    (f"{torch_prefix}.weights.{j}", f"w{order}_{i_out}",
                     by_order[order])
                )
            for torch_name, our_name, paths in sources:
                tensor = tensors.pop(torch_name, None)
                if tensor is None:
                    report.missing.append(torch_name)
                    if strict:
                        raise KeyError(f"checkpoint is missing {torch_name}")
                    continue
                if tensor.shape == (num_elements, len(paths), mul_out):
                    product[our_name] = tensor
                    report.mapped.append(torch_name)
                    if our_name.startswith(("w2", "w3")):
                        # Shape match alone does not prove the torch
                        # symmetrized-U weights are expressed in this trunk's
                        # iterated-coupling basis for correlation >= 2.
                        report.basis_assumed.append(torch_name)
                        logger.warning(
                            "MACE import: %s mapped by shape only — torch "
                            "symmetric-contraction weights are in e3nn's "
                            "symmetrized-U basis; the iterated-coupling basis "
                            "is assumed to coincide (unverified for "
                            "correlation >= 2). Validate trunk outputs before "
                            "trusting freeze_trunk results.",
                            torch_name,
                        )
                else:
                    report.mismatched.append(
                        f"{torch_name}: torch symmetrized-U basis has shape "
                        f"{tensor.shape}, iterated-coupling basis expects "
                        f"{(num_elements, len(paths), mul_out)}"
                    )
                    if strict:
                        raise ValueError(report.mismatched[-1])
        params[f"product_{index}"] = product
        flat = take(f"products.{index}.linear.weight")
        if flat is not None:
            params[f"product_linear_{index}"] = _split_linear_weight(
                flat, layout["target"], layout["target"],
                f"products.{index}.linear",
            )

    for name in list(tensors):
        if name.startswith(_IGNORED_PREFIXES):
            report.ignored.append(name)
        else:
            report.mismatched.append(f"{name}: unrecognized checkpoint tensor")
            if strict:
                raise ValueError(report.mismatched[-1])

    logger.info("MACE import: %s", report.summary())
    import jax

    jax_params = jax.tree_util.tree_map(
        lambda v: np.asarray(v, dtype=np.float32), params
    )
    return jax_params, report


def export_mace_state_dict(trunk_params: Dict, config) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax trunk params -> mace-torch-schema state dict.

    Used by the round-trip tests and to hand trained trunks back to
    mace-torch users.
    """
    num_elements = config.resolved_num_elements
    hidden = Irreps(config.hidden_irreps)
    scalar_hidden = Irreps([(mul, ir) for mul, ir in hidden if ir.l == 0])
    attrs_irreps = Irreps(f"{num_elements}x0e")
    out: Dict[str, np.ndarray] = {}
    out["node_embedding.linear.weight"] = _merge_linear_weight(
        trunk_params["node_embedding"], attrs_irreps, scalar_hidden
    )
    out["radial_embedding.bessel_fn.bessel_weights"] = (
        np.arange(1, config.num_bessel + 1) * math.pi / config.r_max
    )
    for index, layout in enumerate(_layer_layout(config)):
        prefix = f"interactions.{index}"
        scope = trunk_params[f"interaction_{index}"]
        out[f"{prefix}.linear_up.weight"] = _merge_linear_weight(
            scope["linear_up"], layout["in"], layout["in"]
        )
        for depth, w in sorted(scope["conv_tp_weights"].items()):
            out[f"{prefix}.conv_tp_weights.{depth}.weight"] = np.asarray(w)
        out[f"{prefix}.linear.weight"] = _merge_linear_weight(
            scope["linear"], layout["message"], layout["message"]
        )
        skip_features = layout["in"] if layout["residual"] else layout["message"]
        skip_target = (
            layout["target"] if layout["residual"] else layout["message"]
        )
        out[f"{prefix}.skip_tp.weight"] = _merge_skip_tp_weight(
            scope["skip_tp"], skip_features, num_elements, skip_target
        )
        product = trunk_params[f"product_{index}"]
        for i_out, (mul_out, ir_out) in enumerate(layout["target"]):
            torch_prefix = (
                f"products.{index}.symmetric_contractions.contractions.{i_out}"
            )
            if f"w3_{i_out}" in product:
                out[f"{torch_prefix}.weights_max"] = np.asarray(
                    product[f"w3_{i_out}"]
                )
            if f"w2_{i_out}" in product:
                out[f"{torch_prefix}.weights.0"] = np.asarray(
                    product[f"w2_{i_out}"]
                )
            if f"w1_{i_out}" in product:
                out[f"{torch_prefix}.weights.1"] = np.asarray(
                    product[f"w1_{i_out}"]
                )
        out[f"products.{index}.linear.weight"] = _merge_linear_weight(
            trunk_params[f"product_linear_{index}"],
            layout["target"],
            layout["target"],
        )
    return out


def insert_pretrained_trunk(params: Dict, trunk_params: Dict) -> Dict:
    """Replace the ``mace`` scope of a MaceScoreNetwork param tree."""
    import jax

    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    tree = dict(new_params["params"])
    fresh = tree["mace"]
    converted = jax.tree_util.tree_map(
        lambda fresh_leaf, new_leaf: np.asarray(
            new_leaf, dtype=np.float32
        ).reshape(fresh_leaf.shape),
        fresh,
        trunk_params,
    )
    tree["mace"] = converted
    return {**params, "params": tree}


def load_pretrained_mace_params(path: str, params: Dict, config) -> Dict:
    """One-shot: read a torch checkpoint file and graft it into the trunk."""
    from .egnn_import import load_torch_state_dict

    state_dict = load_torch_state_dict(path)
    trunk, report = import_mace_state_dict(state_dict, config, strict=True)
    logger.info("Loaded pretrained MACE from %s (%s)", path, report.summary())
    return insert_pretrained_trunk(params, trunk)

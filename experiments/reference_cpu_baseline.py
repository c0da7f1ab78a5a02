"""Measure the reference's CPU sampling throughput with a torch EGNN replica.

The reference (mila-iqia/diffusion_for_multi_scale_molecular_dynamics) drives
its predictor-corrector sampler from a Python loop, with one torch EGNN
forward per predictor/corrector step
(src/.../generators/predictor_corrector_axl_generator.py:112-147). This
script replicates the production network's exact cost anatomy in torch
(architecture from src/.../models/egnn.py:21-385 and
egnn_score_network.py:48-303, hyperparameters from the Si 2x2x2 config of
record: 4 E_GCL layers, 256-wide MLPs with 4 hidden layers each, radial
cutoff 7.5 A) and measures wall time per forward on the host CPU, including
the per-step periodic edge rebuild the reference performs
(egnn_utils.py:107). It then extrapolates to the production sampling
workload: 1000 steps x (1 predictor + 2 correctors) = 3000 forwards for a
batch of 32 samples of 64 atoms.

This is a faithful *replica*, not a copy: the modules are written from the
architecture description; update rules outside the network (D3PM posterior,
coordinate update) cost orders of magnitude less than the network and are
not modeled.

Writes experiments/reference_cpu_baseline.json, which bench.py reads to
report `vs_reference_cpu`.
"""

import argparse
import json
import os
import time

import torch
from torch import nn

HERE = os.path.dirname(os.path.abspath(__file__))

# Si 2x2x2 production configuration of record
# (reference experiments/.../Si_2x2x2/config_diffusion_egnn.yaml).
BATCH = 32
NATOMS = 64
CELL = 10.86  # A
CUTOFF = 7.5  # A
HIDDEN = 256
N_HIDDEN_LAYERS = 4
N_GCL_LAYERS = 4
NUM_CLASSES = 2  # Si + MASK
N_FORWARDS_PER_TRAJECTORY = 3000  # 1000 steps x (1 predictor + 2 correctors)


def _stack(input_size: int, hidden: int, n_hidden: int) -> nn.Sequential:
    """First Linear + act, then n_hidden x (Linear + act) (egnn.py:83-92)."""
    layers = [nn.Linear(input_size, hidden), nn.SiLU()]
    for _ in range(n_hidden):
        layers += [nn.Linear(hidden, hidden), nn.SiLU()]
    return nn.Sequential(*layers)


class EGCLReplica(nn.Module):
    """Cost replica of the reference E_GCL layer (egnn.py:21-288).

    message MLP: Linear(2h+1 -> H) + 4 x Linear(H -> H), SiLU throughout;
    node MLP:    Linear(h+H -> H) + 4 x Linear(H -> H) + Linear(H -> h);
    coord MLP:   Linear(H -> H) + 4 x Linear(H -> H) + Linear(H -> 1, no bias);
    mean aggregations, residual node update (production settings).
    """

    def __init__(self, hidden: int, n_hidden: int):
        super().__init__()
        self.message_mlp = _stack(2 * hidden + 1, hidden, n_hidden)
        node = _stack(hidden + hidden, hidden, n_hidden)
        node.append(nn.Linear(hidden, hidden))
        self.node_mlp = node
        coord = _stack(hidden, hidden, n_hidden)
        coord.append(nn.Linear(hidden, 1, bias=False))
        self.coord_mlp = coord

    def forward(self, h, edge_index, coord):
        row, col = edge_index[:, 0], edge_index[:, 1]
        coord_diff = coord[row] - coord[col]
        radial = (coord_diff**2).sum(dim=1, keepdim=True)
        messages = self.message_mlp(torch.cat([h[row], h[col], radial], dim=1))
        # coordinate update: mean-aggregated weighted differences.
        weights = self.coord_mlp(messages)
        coord_update = torch.zeros_like(coord).index_add_(
            0, row, coord_diff * weights
        )
        counts = torch.zeros(coord.shape[0], 1).index_add_(
            0, row, torch.ones(row.shape[0], 1)
        )
        coord = coord + coord_update / counts.clamp(min=1.0)
        # message aggregation (mean) + node update with residual.
        agg = torch.zeros(h.shape[0], messages.shape[1]).index_add_(
            0, row, messages
        )
        agg = agg / counts.clamp(min=1.0)
        h = h + self.node_mlp(torch.cat([h, agg], dim=1))
        return h, coord


class EGNNReplica(nn.Module):
    """Cost replica of the reference EGNN score network stack.

    (egnn.py:291-385: embedding Linear, n_layers x E_GCL, classification
    Linear; egnn_score_network.py:181-303: sigma+one-hot node features,
    Bloch-wave uplift of the relative coordinates, score projection.)
    """

    def __init__(self):
        super().__init__()
        self.embedding_in = nn.Linear(1 + NUM_CLASSES, HIDDEN)
        self.layers = nn.ModuleList(
            EGCLReplica(HIDDEN, N_HIDDEN_LAYERS) for _ in range(N_GCL_LAYERS)
        )
        self.node_classification = nn.Linear(HIDDEN, NUM_CLASSES)

    def forward(self, relative_coordinates, sigmas):
        batch, natoms, _ = relative_coordinates.shape
        edges = build_periodic_edges(relative_coordinates)
        # node features: sigma + one-hot atom types (egnn_score_network.py:181-192)
        onehot = torch.zeros(batch * natoms, NUM_CLASSES)
        onehot[:, 0] = 1.0
        h = torch.cat(
            [sigmas.expand(batch, natoms).reshape(-1, 1), onehot], dim=1
        )
        # Bloch uplift: z = [cos(2 pi x), sin(2 pi x)] (egnn_score_network.py:196-225)
        flat_x = relative_coordinates.reshape(-1, 3)
        z = torch.cat(
            [torch.cos(2 * torch.pi * flat_x), torch.sin(2 * torch.pi * flat_x)],
            dim=1,
        )
        h = self.embedding_in(h)
        for layer in self.layers:
            h, z = layer(h, edges, z)
        logits = self.node_classification(h)
        # Gamma projection back to normalized scores (egnn_score_network.py:276):
        # a handful of small contractions, modeled by one matmul.
        scores = z @ torch.zeros(z.shape[1], 3)
        return logits, scores


def build_periodic_edges(relative_coordinates: torch.Tensor) -> torch.Tensor:
    """Per-forward periodic radial-cutoff edge list (egnn_utils.py:107).

    The reference rebuilds the neighbor list with a pykeops kernel at every
    network call; this replica uses min-image torch distances (the box is
    10.86 A < 2 x 7.5 A cutoff, so the graph is near-fully-connected and the
    MLPs dominate the cost either way).
    """
    batch, natoms, _ = relative_coordinates.shape
    delta = relative_coordinates[:, :, None, :] - relative_coordinates[:, None, :, :]
    delta = delta - torch.round(delta)  # min image in fractional coordinates
    dist2 = (delta**2).sum(-1) * CELL**2
    mask = (dist2 < CUTOFF**2) & ~torch.eye(natoms, dtype=torch.bool)[None]
    src, dst = [], []
    for b in range(batch):
        rows, cols = torch.nonzero(mask[b], as_tuple=True)
        src.append(rows + b * natoms)
        dst.append(cols + b * natoms)
    return torch.stack([torch.cat(src), torch.cat(dst)], dim=1)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--probe_forwards", type=int, default=5)
    parser.add_argument("--threads", type=int, default=os.cpu_count())
    parser.add_argument(
        "--output", default=os.path.join(HERE, "reference_cpu_baseline.json")
    )
    args = parser.parse_args()

    torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    model = EGNNReplica().eval()

    x = torch.rand(BATCH, NATOMS, 3)
    sigmas = torch.full((1, 1), 0.1)

    with torch.no_grad():
        logits, scores = model(x, sigmas)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.probe_forwards):
            logits, scores = model(x, sigmas)
        per_forward = (time.perf_counter() - t0) / args.probe_forwards

    trajectory_seconds = per_forward * N_FORWARDS_PER_TRAJECTORY
    samples_per_s = BATCH / trajectory_seconds
    result = {
        "description": (
            "torch-CPU replica of the reference EGNN production sampler "
            "(Si 2x2x2: 3000 forwards, batch 32, 64 atoms, EGNN 4x256, "
            "cutoff 7.5 A, per-step edge rebuild)"
        ),
        "seconds_per_forward": round(per_forward, 4),
        "forwards_per_trajectory": N_FORWARDS_PER_TRAJECTORY,
        "batch": BATCH,
        "natoms": NATOMS,
        "samples_per_s": samples_per_s,
        "torch_threads": args.threads,
        "cpu_count": os.cpu_count(),
        "torch_version": torch.__version__,
        "probe_forwards": args.probe_forwards,
    }
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

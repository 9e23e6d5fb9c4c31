"""Device mesh + sharding rules.

TPU-native replacement for the reference's nn.DataParallelTable (SURVEY.md §2.3):
data parallelism is `pjit`/`shard_map` over a named mesh with XLA collectives over
ICI, not replicate/scatter/allreduce calls. A "model" axis is reserved so FC heads
*can* tensor-shard later without train-loop changes (SURVEY.md §2.3 TP row).

TP boundary (explicit): the foveal fc6/fc7 GEMMs and the final cls_bbox GEMM
shard over the "model" axis. fc6 is column-parallel, fc7 row-parallel (psum
output), and cls_bbox column-parallel — the standard Megatron pairing, so
the fc7 psum feeds a sharded GEMM instead of a replicated one and cls_bbox's
(F*fc_dim, K*classes+4*classes) kernel splits its output columns with no
extra collective beyond the slice/reshape gather XLA already inserts for the
(N, K, C) score view. cls_bbox falls back to replicated when its output dim
is not divisible by the model axis (it is data-dependent; 810 at COCO shards
2-way but not 4-way). The conv trunk stays REPLICATED: conv TP at VGG/COCO
scale would shard ~20 ms of convs that are HBM-bound, not FLOP-bound.
Revisit if a trunk 10x larger ever lands.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. n_data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = devices.size // n_model
    assert n_data * n_model <= devices.size, (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {devices.size}"
    )
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def largest_data_mesh(batch_size: int, devices=None) -> Mesh:
    """Widest pure-data mesh whose width divides `batch_size` — the shared
    auto-mesh rule of Trainer and cli/eval (one copy, can't drift)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while batch_size % n:
        n -= 1
    return make_mesh(n_data=n, devices=devices[:n])


@dataclass(frozen=True)
class MeshRules:
    """Central sharding rules: one place mapping logical tensor roles to specs."""

    mesh: Mesh

    # -- PartitionSpecs ------------------------------------------------------
    @property
    def batch(self) -> P:
        """Leading-axis data sharding: images, rois, labels, targets."""
        return P(DATA_AXIS)

    @property
    def replicated(self) -> P:
        return P()

    # -- tensor parallelism over the "model" axis -----------------------------
    def tree_sharding(self, tree):
        """Megatron-style TP rules applied by tree path (works for params AND
        optimizer state, whose momentum subtree mirrors param names):

          fc6_f* kernel  -> P(None, "model")   column-parallel
          fc6_f* bias    -> P("model")
          fc7_f* kernel  -> P("model", None)   row-parallel (psum output)
          cls_bbox kernel-> P(None, "model")   column-parallel
          cls_bbox bias  -> P("model")
          everything else replicated

        With a model axis of size 1 this degrades to pure replication; the
        train step code never changes (SURVEY.md §2.3 TP row: the mesh axis
        is reserved so FC heads *can* shard without train-loop changes).
        """
        n_model = self.mesh.shape[MODEL_AXIS]

        def rule(path, leaf):
            names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            if n_model > 1 and getattr(leaf, "ndim", 0) >= 1:
                in_fc6 = any(n.startswith("fc6_f") for n in names)
                # cls_bbox shards only when its output dim divides evenly:
                # explicit NamedSharding (unlike GSPMD-internal specs) rejects
                # ragged shards, and the dim (K*classes + 4*classes) is data-
                # dependent (810 at COCO: even, but not divisible by 4).
                in_cb = (any(n == "cls_bbox" for n in names)
                         and leaf.shape[-1] % n_model == 0)
                in_col = in_fc6 or in_cb
                in_fc7 = any(n.startswith("fc7_f") for n in names)
                is_kernel = names[-1] == "kernel"
                is_bias = names[-1] == "bias"
                if in_col and is_kernel and leaf.ndim == 2:
                    return NamedSharding(self.mesh, P(None, MODEL_AXIS))
                if in_col and is_bias and leaf.ndim == 1:
                    return NamedSharding(self.mesh, P(MODEL_AXIS))
                if in_fc7 and is_kernel and leaf.ndim == 2:
                    return NamedSharding(self.mesh, P(MODEL_AXIS, None))
            return NamedSharding(self.mesh, P())

        return jax.tree_util.tree_map_with_path(rule, tree)

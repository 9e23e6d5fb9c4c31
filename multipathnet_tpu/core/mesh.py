"""Device mesh + sharding rules.

TPU-native replacement for the reference's nn.DataParallelTable (SURVEY.md §2.3):
data parallelism is `pjit`/`shard_map` over a named mesh with XLA collectives over
ICI, not replicate/scatter/allreduce calls. A "model" axis is reserved so FC heads
*can* tensor-shard later without train-loop changes (SURVEY.md §2.3 TP row).
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

    @property
    def fc_kernel(self) -> P:
        """FC head kernels: shard output features over the model axis."""
        return P(None, MODEL_AXIS)

    # -- NamedShardings ------------------------------------------------------
    def shard_batch(self, tree):
        s = NamedSharding(self.mesh, self.batch)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def replicate(self, tree):
        s = NamedSharding(self.mesh, self.replicated)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def params_sharding(self, params):
        """Replicated params (DP). Future TP: route FC kernels to fc_kernel."""
        s = NamedSharding(self.mesh, self.replicated)
        return jax.tree_util.tree_map(lambda _: s, params)

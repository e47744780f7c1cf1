"""Device mesh construction.

Axes:
  data   — data parallelism over utterance minibatches (gradient psum)
  model  — tensor parallelism for the wide output/prefinal matmuls
           (3080 pdf-ids shard cleanly)

On a v5e slice the 'data' axis should ride ICI within a host and DCN across
hosts (jax.distributed handles the process mesh); 'model' stays intra-host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1


def make_mesh(config: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if config is None:
        config = MeshConfig(data=len(devices), model=1)
    n = config.data * config.model
    if n > len(devices):
        raise ValueError(f"mesh {config} needs {n} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:n]).reshape(config.data, config.model)
    return Mesh(grid, axis_names=("data", "model"))


def make_distributed_mesh(config: MeshConfig) -> Mesh:
    """Multi-host entry: call jax.distributed.initialize() first (driver or
    launcher does this); jax.devices() then spans all hosts."""
    return make_mesh(config)

"""Multi-chip scaling: device meshes, sharding rules, sharded train steps.

This layer is NEW engineering with no reference counterpart — the reference
is strictly single-process single-GPU (SURVEY.md §2.7).  Design follows the
jax scaling playbook: pick a mesh, annotate shardings with NamedSharding,
let XLA insert the collectives (psum over ICI for data-parallel gradients,
all-gather/reduce-scatter for tensor-parallel matmuls), profile, iterate.
"""

from kaldi_fp16_tpu.parallel.mesh import make_mesh, MeshConfig
from kaldi_fp16_tpu.parallel.data_parallel import (
    make_sharded_train_step, shard_batch, param_shardings,
)

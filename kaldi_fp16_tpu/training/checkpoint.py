"""Checkpointing: params + optimizer state + BN stats + loss scale + data
position, via orbax.

The reference has NO real checkpointing (SURVEY.md §5: only a Kaldi
final.mdl importer and a gob dump in the gotorch side-stack); this is a
required new capability: full save/restore including the data-iterator
position so training resumes mid-epoch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


@dataclass
class DataPosition:
    """Where the input pipeline is (file index + batches consumed) plus
    the trainer's RNG key at save time.  Both exist so a kill/resume
    REPLAYS the original run exactly: without the key, resumed steps
    re-derive SpecAugment/dropout noise from a fresh PRNGKey(seed) and
    the replayed trajectory silently diverges from the killed run
    (caught by tools/soak.py's replay-fidelity check, r3)."""
    epoch: int = 0
    file_index: int = 0
    batches_consumed: int = 0
    rng_key: Optional[np.ndarray] = None   # uint32[2] or None


def _to_pytree(params, net_state, opt_state, scale_state, step: int,
               data_pos: DataPosition) -> Dict[str, Any]:
    return {
        "params": params,
        "net_state": net_state,
        "opt_state": opt_state,
        "scale_state": scale_state._asdict() if hasattr(scale_state, "_asdict")
                       else scale_state,
        "meta": {
            "step": np.asarray(step),
            "epoch": np.asarray(data_pos.epoch),
            "file_index": np.asarray(data_pos.file_index),
            "batches_consumed": np.asarray(data_pos.batches_consumed),
            # always present so save/restore templates share one tree
            # structure; zeros = "not recorded" (restore maps it to None)
            "rng_key": (np.zeros(2, np.uint32) if data_pos.rng_key is None
                        else np.asarray(data_pos.rng_key, np.uint32)),
        },
    }


class CheckpointManager:
    """Thin orbax wrapper with a numpy .npz fallback when orbax is absent."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        else:  # pragma: no cover
            self._mgr = None

    def save(self, step: int, params, net_state, opt_state, scale_state,
             data_pos: DataPosition = DataPosition()) -> None:
        tree = _to_pytree(params, net_state, opt_state, scale_state, step,
                          data_pos)
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(tree))
            self._mgr.wait_until_finished()
        else:  # pragma: no cover
            flat, treedef = jax.tree_util.tree_flatten(tree)
            np.savez(os.path.join(self.directory, f"ckpt_{step}.npz"),
                     *[np.asarray(x) for x in flat])

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("ckpt_")]  # pragma: no cover
        return max(steps) if steps else None  # pragma: no cover

    def all_steps(self) -> list:
        """Retained checkpoint steps, ascending (bounded by max_to_keep
        — size it >= N when averaging the last N models)."""
        if self._mgr is not None:
            return sorted(self._mgr.all_steps())
        return sorted(int(f[5:-4]) for f in os.listdir(self.directory)
                      if f.startswith("ckpt_"))  # pragma: no cover

    def restore(self, step: Optional[int], params, net_state, opt_state,
                scale_state):
        """Restore into the given template structures.  Returns
        (params, net_state, opt_state, scale_state, step, DataPosition)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = _to_pytree(params, net_state, opt_state, scale_state, 0,
                              DataPosition())
        if self._mgr is not None:
            tree = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        else:  # pragma: no cover
            raise RuntimeError("orbax unavailable")
        meta = tree["meta"]
        key = np.asarray(meta["rng_key"], np.uint32)
        pos = DataPosition(epoch=int(meta["epoch"]),
                           file_index=int(meta["file_index"]),
                           batches_consumed=int(meta["batches_consumed"]),
                           rng_key=None if not key.any() else key)
        scale = scale_state.__class__(**tree["scale_state"]) \
            if hasattr(scale_state, "_asdict") else tree["scale_state"]
        return (tree["params"], tree["net_state"], tree["opt_state"], scale,
                int(meta["step"]), pos)

    def close(self):
        if self._mgr is not None:
            self._mgr.close()

"""Shared bootstrap for the CLI tools."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu():
    """Run a tool on CPU regardless of the ambient TPU platform pin."""
    import jax
    jax.config.update("jax_platforms", "cpu")


def enable_compile_cache(path: str = None):
    """Persistent XLA compilation cache shared across tool processes.

    The flagship train step costs minutes to compile; every CLI
    invocation is a fresh process, so without this each run repays the
    full compile.  Serialized executables are keyed on HLO + compile
    options, so correctness is unaffected.  Safe to call before any
    backend is initialized (config only); failures (read-only home,
    no jax) degrade to no cache rather than crashing numpy-only tools."""
    if os.environ.get("KALDI_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if path is None:
            path = os.path.join(os.path.expanduser("~"), ".cache",
                                "kaldi_fp16_tpu_xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def read_metrics(path):
    """Rows of a metrics JSONL file; tolerates a torn tail line (a
    killed training run tears its last write)."""
    import json
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


# NOTE: enable_compile_cache() is called explicitly from each tool's
# main() — NOT at import time — so that merely importing a tool module
# (tests, numpy-only helpers) has no filesystem or jax-config side
# effects.

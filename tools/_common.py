"""Shared bootstrap for the CLI tools."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu():
    """Run a tool on CPU regardless of the ambient TPU platform pin."""
    import jax
    jax.config.update("jax_platforms", "cpu")

"""Environment state serialization: full save/restore round-trips.

Functional parity target: the reference's pybullet scene serialization
(`beso/envs/block_pushing/utils/utils_pybullet.py:243-450`:
ObjState/XarmState dataclasses + write/read_pybullet_state) and its test
(`utils_pybullet_test.py`). In JAX the env state IS a pytree of arrays, so a
full-fidelity round-trip is a flatten -> npz -> unflatten.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_FORMAT_VERSION = "beso_tpu_env_state_v1"


def save_env_state(state: Any, path) -> None:
    """Serialize any env-state pytree (incl. batched states) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, _version=np.asarray(_FORMAT_VERSION),
             _treedef=np.asarray(str(treedef)), **arrays)


def load_env_state(template: Any, path) -> Any:
    """Restore an env-state pytree saved by save_env_state; `template`
    provides the tree structure (like the reference's env-specific loaders)."""
    with np.load(path, allow_pickle=False) as data:
        assert str(data["_version"]) == _FORMAT_VERSION, "unknown state format"
        leaves_t, treedef = jax.tree_util.tree_flatten(template)
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_t))]
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(x) for x in leaves])

"""Multi-chip scaling via jax.sharding: device mesh + sharding rules.

The reference is strictly single-process single-GPU (SURVEY.md 2.9/5.8: no
torch.distributed anywhere); parallelism here is NEW capability, designed
TPU-first:

* mesh axes ('dp', 'tp'): data parallelism over the batch/env dimension rides
  ICI via psum gradient all-reduce (inserted by XLA from shardings);
  tensor parallelism splits attention heads + MLP hidden dim.
* training: batch sharded P('dp'), params sharded by `tp_param_spec`
  (replicated over dp); XLA inserts all-reduces after the sharded matmuls.
* evaluation: the env batch (thousands of parallel rollouts) is sharded over
  'dp' — 4096 envs / 8 chips = 512 envs per chip, zero cross-chip traffic
  except metric reductions.

At BESO's model scale (~9.5M params) DP is the throughput lever; TP exists
for wider variants and to validate the collective paths.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Create a ('dp', 'tp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def make_multislice_mesh(n_slices: int, tp: int = 1,
                         devices=None) -> Mesh:
    """('dcn', 'dp', 'tp') mesh for multi-slice (multi-pod-segment) scaling.

    Axis placement follows the DCN/ICI hierarchy: only the OUTER 'dcn' axis
    crosses the data-center network; 'dp'/'tp' stay on ICI within a slice.
    Batches shard over ('dcn', 'dp') — the per-step cross-slice traffic is
    the gradient all-reduce over 'dcn' only (params are dp/tp-sharded the
    same way inside every slice), which is the standard multislice DP
    recipe. On real multislice TPU hardware the device order comes from
    `mesh_utils.create_hybrid_device_mesh` (slice-aware); on a flat
    single-slice or virtual CPU mesh it falls back to a reshape, which is
    functionally identical (and exercises the same collectives).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_slices == 0, f"{n} devices not divisible into {n_slices} slices"
    per_slice = n // n_slices
    assert per_slice % tp == 0, f"{per_slice} per-slice devices vs tp={tp}"
    dp = per_slice // tp
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, dp, tp), dcn_mesh_shape=(n_slices, 1, 1),
            devices=devices)
    except Exception:  # virtual CPU mesh / single-slice: flat reshape
        arr = np.asarray(devices).reshape(n_slices, dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch/env dimension shards over."""
    return tuple(a for a in ("dcn", "dp") if a in mesh.axis_names)


# TP partitioning rules for DiffusionGPT parameters:
# attention qkv / mlp fc split their OUTPUT features over 'tp';
# attention proj / mlp fc_proj split their INPUT features over 'tp'
# (Megatron-style column->row pairing: one all-reduce per block per matmul
# pair, riding ICI).
_TP_RULES = (
    (re.compile(r".*attn.*qkv.*kernel"), P(None, "tp")),
    (re.compile(r".*attn.*qkv.*bias"), P("tp")),
    (re.compile(r".*attn.*proj.*kernel"), P("tp", None)),
    (re.compile(r".*\bfc\b.*kernel"), P(None, "tp")),
    (re.compile(r".*\bfc\b.*bias"), P("tp")),
    (re.compile(r".*fc_proj.*kernel"), P("tp", None)),
)


def tp_param_spec(params: Any) -> Any:
    """PartitionSpec tree for a DiffusionGPT param tree (TP over heads/MLP)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, spec in _TP_RULES:
            if pat.match(name.replace("/", ".")):
                # only shard if the dimension divides evenly (checked by jit)
                return spec
        return P()  # replicate

    specs = [spec_for(path, leaf) for path, leaf in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def partition_params(params: Any, mesh: Mesh) -> Any:
    """Place a param tree on the mesh with TP sharding (dp-replicated)."""
    specs = tp_param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, (dict,)))


def partition_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch/env) dimension over all data axes
    ('dp', plus 'dcn' on a multislice mesh)."""
    sh = NamedSharding(mesh, P(data_axes(mesh)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

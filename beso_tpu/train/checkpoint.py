"""Checkpointing: full train-state save/restore + torch-key converter.

The reference only stores bare model weights — `model_state_dict.pth` (EMA)
and `non_ema_model_state_dict.pth` (`beso_agent.py:466-476`) — so it cannot
resume mid-training (SURVEY.md 5.4). Here the FULL TrainState (params,
optimizer state, EMA tree + counters, step) round-trips through orbax, and a
converter maps the reference's flat PyTorch key space
(`inner_model.blocks.N.attn.{query,key,value,proj}.{weight,bias}`, ...) onto
the flax parameter tree for checkpoint-parity validation.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def save_train_state(ts, directory: str, name: str = "best") -> None:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, ts, force=True)
    ckptr.wait_until_finished()


def restore_train_state(template, directory: str, name: str = "best"):
    import orbax.checkpoint as ocp

    path = Path(directory).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


# ---------------------------------------------------------------------------
# torch <-> flax parameter conversion for DiffusionGPT
# ---------------------------------------------------------------------------

def convert_torch_diffusion_gpt(state_dict: Mapping[str, Any],
                                n_layers: int) -> dict:
    """Map a reference `model_state_dict.pth` (GCDenoiser module names, see
    score_gpts.py:15-211) onto the beso_tpu DiffusionGPT param tree.

    torch Linear stores weight [out, in]; flax Dense kernel is [in, out].
    The reference keeps separate query/key/value Linears; ours is one fused
    qkv Dense, concatenated along the output dim in (q, k, v) order.
    """

    def w(key):
        t = state_dict[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def dense(prefix):
        return {"kernel": jnp.asarray(w(prefix + ".weight").T),
                "bias": jnp.asarray(w(prefix + ".bias"))}

    def ln(prefix):
        return {"scale": jnp.asarray(w(prefix + ".weight")),
                "bias": jnp.asarray(w(prefix + ".bias"))}

    p = "inner_model." if any(k.startswith("inner_model.") for k in state_dict) else ""
    params: dict = {
        "tok_emb": dense(p + "tok_emb"),
        "sigma_emb": dense(p + "sigma_emb"),
        "action_emb": dense(p + "action_emb"),
        "pos_emb": jnp.asarray(w(p + "pos_emb"))[0],
        "ln_f": ln(p + "ln_f"),
    }
    params["pos_emb"] = params["pos_emb"][None]  # keep [1, seq, D]

    for i in range(n_layers):
        bp = f"{p}blocks.{i}."
        q, k_, v = (w(bp + f"attn.{nm}.weight") for nm in ("query", "key", "value"))
        qb, kb, vb = (w(bp + f"attn.{nm}.bias") for nm in ("query", "key", "value"))
        params[f"block_{i}"] = {
            "ln1": ln(bp + "ln1"),
            "ln2": ln(bp + "ln2"),
            "attn": {
                "qkv": {"kernel": jnp.asarray(np.concatenate([q.T, k_.T, v.T], axis=1)),
                        "bias": jnp.asarray(np.concatenate([qb, kb, vb]))},
                "proj": dense(bp + "attn.proj"),
            },
            "fc": dense(bp + "mlp.0"),
            "fc_proj": dense(bp + "mlp.2"),
        }

    if p + "action_pred.weight" in state_dict:
        params["action_pred"] = dense(p + "action_pred")
    else:  # 2-layer SiLU head (score_gpts.py:186-190)
        params["action_pred_fc"] = dense(p + "action_pred.0")
        params["action_pred_out"] = dense(p + "action_pred.2")
    return {"params": params}


def load_torch_checkpoint(weights_path: str, n_layers: int,
                          filename: str = "model_state_dict.pth") -> dict:
    """Load a reference .pth checkpoint into a flax param tree
    (beso_agent.py:458-464)."""
    import torch

    sd = torch.load(os.path.join(weights_path, filename), map_location="cpu",
                    weights_only=False)
    return convert_torch_diffusion_gpt(sd, n_layers)


def export_torch_state_dict(params: dict, n_layers: int) -> dict:
    """Inverse conversion: flax param tree -> reference-style torch keys
    (numpy values), for cross-validation round-trips."""
    flat = {}
    pt = params["params"]

    def put(name, kernel_bias):
        flat[name + ".weight"] = np.asarray(kernel_bias["kernel"]).T
        flat[name + ".bias"] = np.asarray(kernel_bias["bias"])

    put("inner_model.tok_emb", pt["tok_emb"])
    put("inner_model.sigma_emb", pt["sigma_emb"])
    put("inner_model.action_emb", pt["action_emb"])
    flat["inner_model.pos_emb"] = np.asarray(pt["pos_emb"])
    flat["inner_model.ln_f.weight"] = np.asarray(pt["ln_f"]["scale"])
    flat["inner_model.ln_f.bias"] = np.asarray(pt["ln_f"]["bias"])
    for i in range(n_layers):
        b = pt[f"block_{i}"]
        D = np.asarray(b["attn"]["qkv"]["kernel"]).shape[0]
        qkv_w = np.asarray(b["attn"]["qkv"]["kernel"])  # [D, 3D]
        qkv_b = np.asarray(b["attn"]["qkv"]["bias"])
        for j, nm in enumerate(("query", "key", "value")):
            flat[f"inner_model.blocks.{i}.attn.{nm}.weight"] = qkv_w[:, j * D:(j + 1) * D].T
            flat[f"inner_model.blocks.{i}.attn.{nm}.bias"] = qkv_b[j * D:(j + 1) * D]
        put(f"inner_model.blocks.{i}.attn.proj", b["attn"]["proj"])
        put(f"inner_model.blocks.{i}.mlp.0", b["fc"])
        put(f"inner_model.blocks.{i}.mlp.2", b["fc_proj"])
        for ln_name in ("ln1", "ln2"):
            flat[f"inner_model.blocks.{i}.{ln_name}.weight"] = np.asarray(b[ln_name]["scale"])
            flat[f"inner_model.blocks.{i}.{ln_name}.bias"] = np.asarray(b[ln_name]["bias"])
    if "action_pred" in pt:
        put("inner_model.action_pred", pt["action_pred"])
    else:
        put("inner_model.action_pred.0", pt["action_pred_fc"])
        put("inner_model.action_pred.2", pt["action_pred_out"])
    return flat

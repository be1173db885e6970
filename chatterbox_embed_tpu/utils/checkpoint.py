"""Parameter checkpointing via Orbax (SURVEY.md §5: converted weights persist
in a TPU-native format; the `.npy` voice artifacts and `conds.pt` keep their
reference-compatible readers elsewhere)."""
from __future__ import annotations

import os
from typing import Any

import jax


def save_params(path: str, params: Any):
    """Save a parameter pytree to an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Any = None) -> Any:
    """Restore a parameter pytree; `like` provides the target structure
    (abstract shapes) when available."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct
                                  if hasattr(ocp.utils, "to_shape_dtype_struct")
                                  else (lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)),
                                  like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def convert_reference_checkpoints(ckpt_dir: str, out_dir: str):
    """One-shot conversion: reference safetensors -> Orbax trees on disk."""
    from . import weights as W
    os.makedirs(out_dir, exist_ok=True)
    mapping = {
        "ve": ("ve.safetensors", W.convert_voice_encoder),
        "t3": ("t3_cfg.safetensors", W.convert_t3),
        "s3gen": ("s3gen.safetensors", W.convert_s3gen),
    }
    for name, (fname, converter) in mapping.items():
        src = os.path.join(ckpt_dir, fname)
        if os.path.exists(src):
            params = converter(W.load_safetensors(src))
            save_params(os.path.join(out_dir, name), params)

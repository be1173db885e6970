"""Conditionals: the (T3 conditioning, S3Gen reference dict) pair with the
reference's on-disk `.pt` format preserved (reference: conditionals.py:9-51).

torch is used ONLY for (de)serialising `conds.pt` — the tensors are converted
to numpy/jnp immediately; nothing torch touches the compute path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from .models.t3 import T3Cond


@dataclasses.dataclass
class Conditionals:
    """t3: T3Cond fields; gen: prompt_token/prompt_token_len/prompt_feat/
    prompt_feat_len/embedding (reference: conditionals.py:16-30)."""
    t3: T3Cond
    gen: Dict[str, Any]

    def replace_emotion(self, emotion_adv: float) -> "Conditionals":
        return Conditionals(self.t3._replace(emotion_adv=float(emotion_adv)), self.gen)

    def save(self, path: str):
        import torch
        t3_dict = {
            "speaker_emb": torch.from_numpy(np.asarray(self.t3.speaker_emb)),
            "cond_prompt_speech_tokens": (
                torch.from_numpy(np.asarray(self.t3.cond_prompt_speech_tokens))
                if self.t3.cond_prompt_speech_tokens is not None else None),
            "emotion_adv": torch.tensor(np.asarray(self.t3.emotion_adv, np.float32)).reshape(1, 1, 1),
        }
        gen_dict = {k: (torch.from_numpy(np.asarray(v)) if v is not None else None)
                    for k, v in self.gen.items()}
        torch.save({"t3": t3_dict, "gen": gen_dict}, path)

    @classmethod
    def load(cls, path: str) -> "Conditionals":
        import torch
        raw = torch.load(path, map_location="cpu", weights_only=True)
        t3_raw, gen_raw = raw["t3"], raw["gen"]

        def tonp(v):
            return v.numpy() if torch.is_tensor(v) else v

        t3 = T3Cond(
            speaker_emb=jnp.asarray(tonp(t3_raw["speaker_emb"]), jnp.float32),
            cond_prompt_speech_tokens=(
                jnp.asarray(tonp(t3_raw["cond_prompt_speech_tokens"]), jnp.int32)
                if t3_raw.get("cond_prompt_speech_tokens") is not None else None),
            emotion_adv=float(np.asarray(tonp(t3_raw.get("emotion_adv", 0.5))).reshape(-1)[0]),
        )
        gen = {k: tonp(v) for k, v in gen_raw.items()}
        return cls(t3, gen)

"""Optional int8 weight quantization for the T3 backbone.

Decode is weight-streaming-bound (PERF_NOTES.md): int8 halves the bytes the
MXU pulls per step vs bf16. Symmetric per-output-channel scales; embeddings,
norms and heads stay full precision (they are small or quality-critical).
Opt-in: quality with converted checkpoints should be validated per-voice.
"""
from __future__ import annotations

from ..models import layers as L


def quantize_llama(llama_params: dict) -> dict:
    out = {"layers": [], "norm": llama_params["norm"]}
    for lp in llama_params["layers"]:
        out["layers"].append({
            "ln1": lp["ln1"], "ln2": lp["ln2"],
            "q": L.quantize_linear(lp["q"]),
            "k": L.quantize_linear(lp["k"]),
            "v": L.quantize_linear(lp["v"]),
            "o": L.quantize_linear(lp["o"]),
            "gate": L.quantize_linear(lp["gate"]),
            "up": L.quantize_linear(lp["up"]),
            "down": L.quantize_linear(lp["down"]),
        })
    return out


def quantize_t3(t3_params: dict) -> dict:
    out = dict(t3_params)
    out["llama"] = quantize_llama(t3_params["llama"])
    return out

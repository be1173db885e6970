"""Import the mounted PyTorch reference's modules for parity testing.

The reference tree at /root/reference is importable only with care:
- `chatterbox/__init__.py` does an installed-package metadata lookup and
  imports the full TTS/VC stack, so every package level is registered here as
  a bare namespace module (real `__path__`, no `__init__` execution);
- diffusers / conformer / librosa / torchaudio are not installed, so the
  small subset the reference touches is stubbed faithfully (diffusers'
  Attention / GELU-family / LoRACompatibleLinear semantics reproduced from
  the diffusers the reference pins);
- `chatterbox.models.s3tokenizer.__init__` imports the external s3tokenizer
  pip package; a constants-only stand-in is registered instead (the values
  mirror reference models/s3tokenizer/s3tokenizer.py:15-19).

Usage: `mod = refload.load("chatterbox.models.s3gen.decoder")`.
"""
from __future__ import annotations

import importlib
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

REF_SRC = "/root/reference/src"

_PACKAGES = [
    "chatterbox",
    "chatterbox.models",
    "chatterbox.models.s3gen",
    "chatterbox.models.s3gen.matcha",
    "chatterbox.models.s3gen.transformer",
    "chatterbox.models.s3gen.utils",
    "chatterbox.models.t3",
    "chatterbox.models.t3.modules",
    "chatterbox.models.t3.inference",
    "chatterbox.models.tokenizers",
    "chatterbox.models.voice_encoder",
]


def _module(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _unavailable(*a, **k):
    raise RuntimeError("stubbed dependency called in parity test")


# --------------------------------------------------------------------------
# diffusers subset (matcha/transformer.py + matcha/decoder.py imports)
# --------------------------------------------------------------------------

class _GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class _GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class _ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class _AdaLayerNorm(nn.Module):  # never instantiated by the used config
    def __init__(self, *a, **k):
        super().__init__()
        _unavailable()


class _Attention(nn.Module):
    """diffusers.models.attention_processor.Attention, inference subset used
    by BasicTransformerBlock: q/k/v projections to heads*dim_head, scaled
    softmax attention with an additive float mask, out projection."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, upcast_attention=False, out_bias=True,
                 scale_qk=True, **kw):
        super().__init__()
        inner = dim_head * heads
        self.heads = heads
        self.scale = dim_head ** -0.5 if scale_qk else 1.0
        cross = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.to_q = nn.Linear(query_dim, inner, bias=bias)
        self.to_k = nn.Linear(cross, inner, bias=bias)
        self.to_v = nn.Linear(cross, inner, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(inner, query_dim, bias=out_bias), nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kw):
        ctx = (encoder_hidden_states if encoder_hidden_states is not None
               else hidden_states)
        b, t, _ = hidden_states.shape
        def split(x):
            return x.view(b, x.shape[1], self.heads, -1).transpose(1, 2)
        q, k, v = split(self.to_q(hidden_states)), split(self.to_k(ctx)), split(self.to_v(ctx))
        logits = q @ k.transpose(-1, -2) * self.scale
        if attention_mask is not None:
            m = attention_mask
            if m.dim() == 3:
                m = m[:, None]
            logits = logits + m
        out = (logits.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, t, -1)
        return self.to_out[1](self.to_out[0](out))


def _get_activation(name: str) -> nn.Module:
    return {"silu": nn.SiLU(), "swish": nn.SiLU(), "relu": nn.ReLU(),
            "mish": nn.Mish(), "gelu": nn.GELU()}[name]


class _ConformerBlock(nn.Module):  # matcha ConformerWrapper (unused at runtime)
    def __init__(self, **kw):
        super().__init__()


def _ensure_stubs():
    if "chatterbox" in sys.modules:
        return
    _module("diffusers")
    _module("diffusers.models")
    _module("diffusers.models.attention", GELU=_GELU, GEGLU=_GEGLU,
            ApproximateGELU=_ApproximateGELU, AdaLayerNorm=_AdaLayerNorm,
            AdaLayerNormZero=_AdaLayerNorm)
    _module("diffusers.models.attention_processor", Attention=_Attention)
    _module("diffusers.models.lora", LoRACompatibleLinear=nn.Linear)
    _module("diffusers.utils")
    _module("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda c: c)
    _module("diffusers.models.activations", get_activation=_get_activation)

    _module("conformer", ConformerBlock=_ConformerBlock)

    lb = _module("librosa", load=_unavailable, resample=_unavailable)
    lb.filters = _module("librosa.filters", mel=_unavailable)
    lb.effects = _module("librosa.effects", trim=_unavailable)

    ta = _module("torchaudio")
    ta.compliance = _module("torchaudio.compliance")
    ta.compliance.kaldi = _module("torchaudio.compliance.kaldi",
                                  fbank=_unavailable)
    ta.functional = _module("torchaudio.functional", resample=_unavailable)
    ta.transforms = _module("torchaudio.transforms")

    for pkg in _PACKAGES:
        m = _module(pkg)
        path = [REF_SRC + "/" + pkg.replace(".", "/")]
        m.__path__ = path
        m.__spec__ = importlib.machinery.ModuleSpec(
            pkg, None, is_package=True)
        m.__spec__.submodule_search_locations = path

    # constants-only stand-in for the reference's s3tokenizer subpackage
    # (its __init__ imports the uninstallable pip package)
    _module("chatterbox.models.s3tokenizer",
            S3_SR=16_000, S3_HOP=160, S3_TOKEN_HOP=640, S3_TOKEN_RATE=25,
            SPEECH_VOCAB_SIZE=6561, SOS=6561, EOS=6562,
            S3Tokenizer=None, drop_invalid_tokens=None)


def load(modname: str):
    """Import a reference leaf module, e.g. 'chatterbox.models.s3gen.decoder'."""
    _ensure_stubs()
    return importlib.import_module(modname)

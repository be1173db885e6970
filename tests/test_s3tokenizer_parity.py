"""S3 tokenizer parity vs a torch replica of the upstream package layout.

The reference wraps the external `s3tokenizer` pip package's S3TokenizerV2
(reference: models/s3tokenizer/s3tokenizer.py:22-52), which is NOT importable
in this container. The replica below mirrors that package's model_v2
architecture and state-dict naming (encoder.conv1/conv2, blocks.N.attn.query/
key/value/out + fsmn_block, attn_ln/mlp/mlp_ln, quantizer._codebook.
project_down) so `utils.weights.convert_s3tokenizer` and the JAX model are
exercised end-to-end: torch state dict -> converter -> our quantize().
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn
import jax.numpy as jnp

from chatterbox_embed_tpu.config import S3TokenizerConfig
from chatterbox_embed_tpu.models import s3tokenizer as s3tok
from chatterbox_embed_tpu.utils import weights as W

TINY = S3TokenizerConfig(n_state=32, n_heads=4, n_layers=2, fsmn_kernel=7)


# ---------------------------------------------------------------------------
# torch replica (upstream s3tokenizer/model_v2.py layout)
# ---------------------------------------------------------------------------

class _FSMNAttention(nn.Module):
    def __init__(self, d, h, kernel):
        super().__init__()
        self.n_head = h
        self.query = nn.Linear(d, d)
        self.key = nn.Linear(d, d, bias=False)
        self.value = nn.Linear(d, d)
        self.out = nn.Linear(d, d)
        self.fsmn_block = nn.Conv1d(d, d, kernel, stride=1, padding=0,
                                    groups=d, bias=False)
        self.lp = (kernel - 1) // 2
        self.rp = kernel - 1 - self.lp

    def forward(self, x, mask_bias, mask_pad):
        q, k, v = self.query(x), self.key(x), self.value(x)
        b, t, d = q.shape
        scale = (d // self.n_head) ** -0.25
        qh = q.view(b, t, self.n_head, -1).permute(0, 2, 1, 3) * scale
        kh = k.view(b, t, self.n_head, -1).permute(0, 2, 3, 1) * scale
        vh = v.view(b, t, self.n_head, -1).permute(0, 2, 1, 3)
        mem = v * mask_pad
        m = F.pad(mem.transpose(1, 2), (self.lp, self.rp))
        mem = (self.fsmn_block(m).transpose(1, 2) + mem) * mask_pad
        qk = (qh @ kh + mask_bias).float()
        w = torch.softmax(qk, dim=-1).to(qh.dtype)
        wv = (w @ vh).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.out(wv) + mem


class _Block(nn.Module):
    def __init__(self, d, h, kernel):
        super().__init__()
        self.attn = _FSMNAttention(d, h, kernel)
        self.attn_ln = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(),
                                 nn.Linear(4 * d, d))
        self.mlp_ln = nn.LayerNorm(d)

    def forward(self, x, mask_bias, mask_pad):
        x = x + self.attn(self.attn_ln(x), mask_bias, mask_pad)
        return x + self.mlp(self.mlp_ln(x))


class _Encoder(nn.Module):
    def __init__(self, cfg: S3TokenizerConfig):
        super().__init__()
        self.conv1 = nn.Conv1d(cfg.n_mels, cfg.n_state, 3, stride=2, padding=1)
        self.conv2 = nn.Conv1d(cfg.n_state, cfg.n_state, 3, stride=2, padding=1)
        self.blocks = nn.ModuleList(
            [_Block(cfg.n_state, cfg.n_heads, cfg.fsmn_kernel)
             for _ in range(cfg.n_layers)])

    def forward(self, x, x_len):
        mask = (torch.arange(x.shape[-1])[None] < x_len[:, None]).float()
        x = F.gelu(self.conv1(x * mask[:, None]))
        x_len = (x_len + 1) // 2
        mask = (torch.arange(x.shape[-1])[None] < x_len[:, None]).float()
        x = F.gelu(self.conv2(x * mask[:, None]))
        x_len = (x_len + 1) // 2
        pad = (torch.arange(x.shape[-1])[None] < x_len[:, None]).float()
        bias = ((1.0 - pad) * -1e10)[:, None, None, :]
        x = x.permute(0, 2, 1)
        for blk in self.blocks:
            x = blk(x, bias, pad[:, :, None])
        return x, x_len


class _Codebook(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.project_down = nn.Linear(d, 8)

    def encode(self, x):
        h = self.project_down(x).tanh() * 0.9990000128746033
        h = h.round() + 1
        powers = torch.pow(3, torch.arange(8)).float()
        return (h * powers).sum(-1).long()


class _Quantizer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self._codebook = _Codebook(d)


class _TorchTokenizer(nn.Module):
    def __init__(self, cfg: S3TokenizerConfig):
        super().__init__()
        self.encoder = _Encoder(cfg)
        self.quantizer = _Quantizer(cfg.n_state)

    def quantize(self, mel, mel_len):
        hidden, code_len = self.encoder(mel, mel_len)
        return self.quantizer._codebook.encode(hidden), code_len


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    model = _TorchTokenizer(TINY).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_s3tokenizer(sd, prefix=""))
    return model, params


import jax  # noqa: E402  (after torch to keep import order deterministic)


def test_hidden_parity(pair, rng):
    model, params = pair
    mels = rng.standard_normal((2, TINY.n_mels, 24)).astype(np.float32)
    lens = np.asarray([24, 17], np.int32)
    with torch.no_grad():
        ref, ref_lens = model.encoder(torch.from_numpy(mels), torch.from_numpy(lens))
    ours, lens_j = s3tok.encode(params, jnp.asarray(mels), jnp.asarray(lens), TINY)
    np.testing.assert_array_equal(np.asarray(lens_j), ref_lens.numpy())
    # compare only valid positions (padded tails may differ)
    for b, l in enumerate(np.asarray(lens_j)):
        # fp32 reduction-order noise between XLA and torch convs is ~2e-4
        # per layer; structural errors are orders of magnitude larger.
        np.testing.assert_allclose(np.asarray(ours)[b, :l], ref[b, :l].numpy(),
                                   atol=2e-3, rtol=1e-2)


def test_token_parity(pair, rng):
    model, params = pair
    mels = rng.standard_normal((2, TINY.n_mels, 32)).astype(np.float32)
    lens = np.asarray([32, 21], np.int32)
    with torch.no_grad():
        ref_tok, ref_lens = model.quantize(torch.from_numpy(mels), torch.from_numpy(lens))
    tok, tok_lens = s3tok.quantize(params, jnp.asarray(mels), jnp.asarray(lens), TINY)
    np.testing.assert_array_equal(np.asarray(tok_lens), ref_lens.numpy())
    for b, l in enumerate(np.asarray(tok_lens)):
        np.testing.assert_array_equal(np.asarray(tok)[b, :l], ref_tok[b, :l].numpy())
    assert int(np.asarray(tok).max()) < 3 ** 8


def test_padding_bucket_invariance(pair, rng):
    """Tokens must not change when the mel buffer is padded to a bigger bucket."""
    _, params = pair
    mels = rng.standard_normal((1, TINY.n_mels, 20)).astype(np.float32)
    lens = jnp.asarray([20], jnp.int32)
    tok_a, _ = s3tok.quantize(params, jnp.asarray(mels), lens, TINY)
    padded = np.concatenate([mels, rng.standard_normal((1, TINY.n_mels, 12)).astype(np.float32)], -1)
    tok_b, _ = s3tok.quantize(params, jnp.asarray(padded), lens, TINY)
    np.testing.assert_array_equal(np.asarray(tok_a)[0, :5], np.asarray(tok_b)[0, :5])


def test_converter_flags_unused_keys(pair):
    model, _ = pair
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd["encoder.ln_post.weight"] = np.ones(32, np.float32)  # architecture drift
    def build(d):
        return W.convert_s3tokenizer(d, prefix="")
    with pytest.raises(ValueError, match="not consumed"):
        W._convert_validated(build, sd)


def test_converter_missing_key_is_diagnosed(pair):
    model, _ = pair
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del sd["encoder.blocks.1.attn.fsmn_block.weight"]
    def build(d):
        return W.convert_s3tokenizer(d, prefix="")
    with pytest.raises(KeyError, match="fsmn_block"):
        W._convert_validated(build, sd)

"""CFM estimator: a causal 1-D U-Net predicting the flow velocity field
(reference: models/s3gen/decoder.py:100-317, matcha/decoder.py:14-158,
matcha/transformer.py:138-316; config s3gen.py:76-87).

Shape: channels=[256] means no temporal down/up-sampling — the network is
1 down-stage + 12 mid-stages + 1 up-stage, each a causal resnet followed by
4 self-attention transformer blocks, all at full mel rate with 256 channels.
This is the hot inner graph of mel generation: it runs 2 (CFG) x 10 (Euler)
times per utterance, so everything is channel-last, bf16-friendly, and a
single fused XLA graph.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowDecoderConfig
from . import layers as L


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: FlowDecoderConfig = FlowDecoderConfig()):
    keys = iter(L.split_keys(key, 4096))
    nk = lambda: next(keys)
    c = cfg.channels
    inner = cfg.num_heads * cfg.attention_head_dim          # 512

    def causal_block(d_in, d_out):
        return {"conv": L.conv1d_init(nk(), 3, d_in, d_out), "ln": L.layer_norm_init(d_out)}

    def resnet(d_in, d_out):
        return {
            "mlp": L.linear_init(nk(), cfg.time_embed_dim, d_out),
            "block1": causal_block(d_in, d_out),
            "block2": causal_block(d_out, d_out),
            "res_conv": L.conv1d_init(nk(), 1, d_in, d_out),
        }

    def tblock():
        return {
            "ln1": L.layer_norm_init(c),
            "q": L.linear_init(nk(), c, inner, bias=False),
            "k": L.linear_init(nk(), c, inner, bias=False),
            "v": L.linear_init(nk(), c, inner, bias=False),
            "o": L.linear_init(nk(), inner, c),
            "ln3": L.layer_norm_init(c),
            "ff1": L.linear_init(nk(), c, 4 * c),
            "ff2": L.linear_init(nk(), 4 * c, c),
        }

    def stage(d_in, d_out):
        return {"resnet": resnet(d_in, d_out),
                "tblocks": [tblock() for _ in range(cfg.n_blocks)]}

    return {
        "time_mlp": {"lin1": L.linear_init(nk(), cfg.in_channels, cfg.time_embed_dim),
                     "lin2": L.linear_init(nk(), cfg.time_embed_dim, cfg.time_embed_dim)},
        "down": {**stage(cfg.in_channels, c), "downsample": L.conv1d_init(nk(), 3, c, c)},
        "mid": [stage(c, c) for _ in range(cfg.num_mid_blocks)],
        "up": {**stage(2 * c, c), "upsample": L.conv1d_init(nk(), 3, c, c)},
        "final_block": causal_block(c, c),
        "final_proj": L.conv1d_init(nk(), 1, c, cfg.out_channels),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _sinusoidal_t(t, dim, scale=1000.0):
    """(B,) diffusion timestep -> (B, dim) embedding (matcha/decoder.py:14-29)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10_000) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    ang = scale * t[:, None].astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _causal_conv3(p, xm, dtype, comm):
    """k=3 causal conv on a pre-masked input. Single-device: left-pad 2
    zeros. Sequence-parallel (comm set): the 2-column left halo comes from
    the previous shard via ppermute (the first shard's ppermute fill is
    zeros — exactly the causal pad), so the sharded conv is bit-identical
    to the unsharded one."""
    if comm is None:
        return L.conv1d(p, xm, padding=(2, 0), dtype=dtype)
    return L.conv1d(p, comm.halo(xm, 2), padding=(0, 0), dtype=dtype)


def _causal_block(p, x, mask, dtype, comm=None):
    """causal conv(k3) -> LayerNorm -> Mish, masked (decoder.py:48-61)."""
    h = _causal_conv3(p["conv"], x * mask, dtype, comm)
    h = L.layer_norm(p["ln"], h)
    return L.mish(h) * mask


def _resnet(p, x, mask, t_emb, dtype, comm=None):
    h = _causal_block(p["block1"], x, mask, dtype, comm)
    h = h + L.linear(p["mlp"], L.mish(t_emb), dtype)[:, None, :]
    h = _causal_block(p["block2"], h, mask, dtype, comm)
    return h + L.conv1d(p["res_conv"], x * mask, dtype=dtype)


def _tblock(p, x, n_heads, dtype, key_mask=None, comm=None):
    h = L.layer_norm(p["ln1"], x)
    q = L.split_heads(L.linear(p["q"], h, dtype), n_heads)
    k = L.split_heads(L.linear(p["k"], h, dtype), n_heads)
    v = L.split_heads(L.linear(p["v"], h, dtype), n_heads)
    if comm is not None:
        # sequence-parallel: queries stay sharded over T, keys/values are
        # all-gathered over the sp axis (at mel lengths K/V are ~1-2 MB —
        # one ICI all-gather beats a ring-attention schedule by a mile);
        # key_mask is already full-width (gathered once in forward)
        k = comm.gather(k)
        v = comm.gather(v)
        attn = L.mha(q, k, v, mask=key_mask)
    # flash halves batched S3Gen (the (B,H,T,T) logits are 58% of a pass —
    # microbench_cfm; bench batch16 s3gen 4.97 -> 1.89 s)
    elif L.use_flash_attention(x.shape[0]):
        attn = L.mha_flash(q, k, v, None if key_mask is None
                           else key_mask[:, 0, 0, :])
    else:
        # XLA fallback; long batched mels chunk queries so logits stay
        # O(B*H*chunk*T) — threshold ~1 GB of fp32 logits
        big = x.shape[0] * x.shape[1] * x.shape[1] * n_heads > (1 << 28)
        attn = (L.mha_chunked(q, k, v, mask=key_mask) if big
                else L.mha(q, k, v, mask=key_mask))
    x = x + L.linear(p["o"], L.merge_heads(attn), dtype)
    h = L.layer_norm(p["ln3"], x)
    h = L.linear(p["ff2"], jax.nn.gelu(L.linear(p["ff1"], h, dtype), approximate=False), dtype)
    return x + h


def _stage(p, x, mask, t_emb, n_heads, dtype, key_mask=None, comm=None):
    x = _resnet(p["resnet"], x, mask, t_emb, dtype, comm)
    for tb in p["tblocks"]:
        x = _tblock(tb, x, n_heads, dtype, key_mask, comm)
    return x


def forward(params, x, mu, t, spks, cond, mask=None,
            cfg: FlowDecoderConfig = FlowDecoderConfig(), dtype=jnp.float32,
            comm=None):
    """Velocity estimate.

    Args (all channel-last, unlike the torch reference's (B, C, T)):
      x:    (B, T, 80) noisy mel
      mu:   (B, T, 80) encoder output
      t:    (B,) diffusion time
      spks: (B, 80) speaker embedding
      cond: (B, T, 80) prompt-mel conditioning
      mask: (B, T, 1) or None
      comm: optional parallel.sp.SeqComm — the call is running inside a
        shard_map with T sharded over comm's mesh axis; convs halo-exchange
        and attention all-gathers K/V (see parallel/sp.py).
    Returns (B, T, 80).
    """
    b, tlen, _ = x.shape
    key_mask = None
    if mask is None:
        mask = jnp.ones((b, tlen, 1), x.dtype)
    else:
        # bucket-padding exactness: pad positions must not be attended to
        km = mask if comm is None else comm.gather(mask)
        key_mask = (km[..., 0] > 0)[:, None, None, :]        # (B, 1, 1, T_full)
    t_emb = _sinusoidal_t(t, cfg.in_channels)
    t_emb = L.linear(params["time_mlp"]["lin2"],
                     jax.nn.silu(L.linear(params["time_mlp"]["lin1"], t_emb)))

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, None, :], (b, tlen, spks.shape[-1])), cond],
        axis=-1).astype(dtype)

    h = _stage(params["down"], h, mask, t_emb, cfg.num_heads, dtype, key_mask, comm)
    skip = h
    h = _causal_conv3(params["down"]["downsample"], h * mask, dtype, comm)

    for st in params["mid"]:
        h = _stage(st, h, mask, t_emb, cfg.num_heads, dtype, key_mask, comm)

    h = jnp.concatenate([h, skip], axis=-1)
    h = _stage(params["up"], h, mask, t_emb, cfg.num_heads, dtype, key_mask, comm)
    h = _causal_conv3(params["up"]["upsample"], h * mask, dtype, comm)

    h = _causal_block(params["final_block"], h, mask, dtype, comm)
    out = L.conv1d(params["final_proj"], h * mask, dtype=dtype)
    return (out * mask).astype(jnp.float32)


def forward_mid_cached(params, x, mu, t, spks, cond, mask=None,
                       cfg: FlowDecoderConfig = FlowDecoderConfig(),
                       dtype=jnp.float32, mid_feats=None, reuse_mid=False):
    """DeepCache-style solver-step acceleration: the mid stack (12 stages x
    (resnet + 4 tblocks) at full size — ~85% of the pass) changes slowly
    between adjacent ODE steps, so on `reuse_mid` steps we recompute only
    the shallow down stage (whose output feeds the up stage's skip
    connection) and substitute the CACHED mid output.

    Returns (velocity, mid_feats): on fresh calls mid_feats is the newly
    computed mid output (cache it); on reuse calls it is passed through.
    Gated by CHATTERBOX_CFM_CACHE (cfm.solve_euler); opt-in because the
    reuse changes numerics — mel-distance bounds in tests/test_s3gen.py."""
    b, tlen, _ = x.shape
    key_mask = None
    if mask is None:
        mask = jnp.ones((b, tlen, 1), x.dtype)
    else:
        key_mask = (mask[..., 0] > 0)[:, None, None, :]
    t_emb = _sinusoidal_t(t, cfg.in_channels)
    t_emb = L.linear(params["time_mlp"]["lin2"],
                     jax.nn.silu(L.linear(params["time_mlp"]["lin1"], t_emb)))
    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, None, :], (b, tlen, spks.shape[-1])), cond],
        axis=-1).astype(dtype)
    h = _stage(params["down"], h, mask, t_emb, cfg.num_heads, dtype, key_mask)
    skip = h

    if reuse_mid:
        h = mid_feats
    else:
        h = _causal_conv3(params["down"]["downsample"], h * mask, dtype, None)
        for st in params["mid"]:
            h = _stage(st, h, mask, t_emb, cfg.num_heads, dtype, key_mask)
        # the carried cache must be `dtype` regardless of what the stage
        # math promoted to (a float32 `mask` upcasts h under bf16 compute):
        # the lax.cond in cfm.step_cached requires both branches to return
        # the same mid dtype as the scan carry (cfm.py mid0)
        mid_feats = h.astype(dtype)

    h = jnp.concatenate([h, skip], axis=-1)
    h = _stage(params["up"], h, mask, t_emb, cfg.num_heads, dtype, key_mask)
    h = _causal_conv3(params["up"]["upsample"], h * mask, dtype, None)
    h = _causal_block(params["final_block"], h, mask, dtype, None)
    out = L.conv1d(params["final_proj"], h * mask, dtype=dtype)
    return (out * mask).astype(jnp.float32), mid_feats

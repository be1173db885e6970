"""CAMPPlus x-vector speaker encoder producing the 192-d voice-clone
embedding (reference: models/s3gen/xvector.py:340-428; this embedding is the
`.npy` voice-clone payload, s3gen.py:108-119).

TPU design: everything is channel-last (NHWC / NWC) so XLA's conv tiling hits
the MXU directly; batch-norms are inference-mode affine folds; the dense-TDNN
concat growth is expressed as a python loop over statically-shaped convs
(30-52 layers, traced once per input bucket).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CAMPPlusConfig
from ..ops import fbank as fbank_ops
from . import layers as L


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _bn_relu_init(c):
    return {"bn": L.batch_norm_init(c)}


def init(key, cfg: CAMPPlusConfig = CAMPPlusConfig()):
    keys = iter(L.split_keys(key, 512))
    nk = lambda: next(keys)
    m = cfg.m_channels

    def res_block(c_in, c_out, stride):
        p = {
            "conv1": L.conv2d_init(nk(), 3, 3, c_in, c_out, bias=False),
            "bn1": L.batch_norm_init(c_out),
            "conv2": L.conv2d_init(nk(), 3, 3, c_out, c_out, bias=False),
            "bn2": L.batch_norm_init(c_out),
        }
        if stride != 1 or c_in != c_out:
            p["sc_conv"] = L.conv2d_init(nk(), 1, 1, c_in, c_out, bias=False)
            p["sc_bn"] = L.batch_norm_init(c_out)
        return p

    fcm = {
        "conv1": L.conv2d_init(nk(), 3, 3, 1, m, bias=False),
        "bn1": L.batch_norm_init(m),
        "layer1": [res_block(m, m, 2), res_block(m, m, 1)],
        "layer2": [res_block(m, m, 2), res_block(m, m, 1)],
        "conv2": L.conv2d_init(nk(), 3, 3, m, m, bias=False),
        "bn2": L.batch_norm_init(m),
    }

    channels = m * (cfg.feat_dim // 8)      # 32 * 10 = 320
    tdnn = {"conv": L.conv1d_init(nk(), 5, channels, cfg.init_channels, bias=False),
            "bn": L.batch_norm_init(cfg.init_channels)}
    channels = cfg.init_channels

    blocks = []
    transits = []
    bn_ch = cfg.bn_size * cfg.growth_rate
    for num_layers, ksz, dil in zip(cfg.block_layers, cfg.block_kernels, cfg.block_dilations):
        layers = []
        for i in range(num_layers):
            c_in = channels + i * cfg.growth_rate
            layers.append({
                "bn1": L.batch_norm_init(c_in),
                "linear1": L.conv1d_init(nk(), 1, c_in, bn_ch, bias=False),
                "bn2": L.batch_norm_init(bn_ch),
                "cam_local": L.conv1d_init(nk(), ksz, bn_ch, cfg.growth_rate, bias=False),
                "cam_l1": L.conv1d_init(nk(), 1, bn_ch, bn_ch // 2),
                "cam_l2": L.conv1d_init(nk(), 1, bn_ch // 2, cfg.growth_rate),
            })
        blocks.append({"layers": layers})
        channels += num_layers * cfg.growth_rate
        transits.append({"bn": L.batch_norm_init(channels),
                         "conv": L.conv1d_init(nk(), 1, channels, channels // 2, bias=False)})
        channels //= 2

    head = {
        "out_bn": L.batch_norm_init(channels),
        "dense_conv": L.conv1d_init(nk(), 1, channels * 2, cfg.embedding_size, bias=False),
        "dense_bn": L.batch_norm_init(cfg.embedding_size),
    }
    return {"fcm": fcm, "tdnn": tdnn, "blocks": blocks, "transits": transits, "head": head}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _res_block(p, x, stride):
    y = jax.nn.relu(L.batch_norm(p["bn1"], L.conv2d(p["conv1"], x, stride=(stride, 1), padding=1)))
    y = L.batch_norm(p["bn2"], L.conv2d(p["conv2"], y, stride=(1, 1), padding=1))
    if "sc_conv" in p:
        sc = L.batch_norm(p["sc_bn"], L.conv2d(p["sc_conv"], x, stride=(stride, 1), padding=[(0, 0), (0, 0)]))
    else:
        sc = x
    return jax.nn.relu(y + sc)


def _fcm(p, feats):
    """feats (B, T, F=80) -> (B, T, 320)."""
    x = jnp.swapaxes(feats, 1, 2)[..., None]        # (B, F, T, 1) NHWC, H=freq
    x = jax.nn.relu(L.batch_norm(p["bn1"], L.conv2d(p["conv1"], x, padding=1)))
    for blk in p["layer1"]:
        x = _res_block(blk, x, 2 if blk is p["layer1"][0] else 1)
    for blk in p["layer2"]:
        x = _res_block(blk, x, 2 if blk is p["layer2"][0] else 1)
    x = jax.nn.relu(L.batch_norm(p["bn2"], L.conv2d(p["conv2"], x, stride=(2, 1), padding=1)))
    b, f, t, c = x.shape                            # f = 10
    # torch reshapes (B, C, F, T) -> (B, C*F, T); match that interleaving
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)


def _seg_pool_avg(x, seg_len=100):
    """Ceil-mode segment average expanded back to T (reference: xvector.py:221-231)."""
    b, t, c = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(b, n_seg, seg_len, c).sum(axis=2)
    counts = np.minimum(seg_len, t - np.arange(n_seg) * seg_len).astype(np.float32)
    seg = sums / counts[None, :, None]
    seg = jnp.repeat(seg, seg_len, axis=1)[:, :t]
    return seg


def _cam_layer(p, x, ksz, dilation):
    y = L.conv1d(p["cam_local"], x, padding=(ksz - 1) // 2 * dilation, dilation=dilation)
    context = jnp.mean(x, axis=1, keepdims=True) + _seg_pool_avg(x)
    m = jax.nn.sigmoid(L.conv1d(p["cam_l2"], jax.nn.relu(L.conv1d(p["cam_l1"], context))))
    return y * m


def _dense_layer(p, x, ksz, dilation):
    y = L.conv1d(p["linear1"], jax.nn.relu(L.batch_norm(p["bn1"], x)))
    return _cam_layer(p, jax.nn.relu(L.batch_norm(p["bn2"], y)), ksz, dilation)


def forward(params, feats: jnp.ndarray, cfg: CAMPPlusConfig = CAMPPlusConfig()):
    """feats: (B, T, 80) mean-normalised kaldi fbank -> (B, 192) embedding."""
    x = _fcm(params["fcm"], feats.astype(jnp.float32))
    x = jax.nn.relu(L.batch_norm(params["tdnn"]["bn"],
                                 L.conv1d(params["tdnn"]["conv"], x, stride=2, padding=2)))
    for bi, (block, transit) in enumerate(zip(params["blocks"], params["transits"])):
        ksz, dil = cfg.block_kernels[bi], cfg.block_dilations[bi]
        for layer in block["layers"]:
            y = _dense_layer(layer, x, ksz, dil)
            x = jnp.concatenate([x, y], axis=-1)
        x = L.conv1d(transit["conv"], jax.nn.relu(L.batch_norm(transit["bn"], x)))
    x = jax.nn.relu(L.batch_norm(params["head"]["out_bn"], x))
    # stats pooling: mean + unbiased std over time
    mean = jnp.mean(x, axis=1)
    var = jnp.sum(jnp.square(x - mean[:, None, :]), axis=1) / jnp.maximum(x.shape[1] - 1, 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-10)], axis=-1)[:, None, :]
    emb = L.conv1d(params["head"]["dense_conv"], stats)
    emb = L.batch_norm(params["head"]["dense_bn"], emb)
    return emb[:, 0, :]


def _inference_impl(params, wav_16k: jnp.ndarray, cfg: CAMPPlusConfig):
    feats = fbank_ops.kaldi_fbank(wav_16k)            # (B, F, 80)
    feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return forward(params, feats, cfg)


_inference_jit = jax.jit(_inference_impl, static_argnames=("cfg",))


def inference(params, wav_16k: jnp.ndarray, cfg: CAMPPlusConfig = CAMPPlusConfig()):
    """wav_16k: (B, T) -> (B, 192). Includes the kaldi-fbank + CMN front-end
    (reference: xvector.py:45-58, 425-428). Jitted end-to-end."""
    return _inference_jit(params, wav_16k, cfg)

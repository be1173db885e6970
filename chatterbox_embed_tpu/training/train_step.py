"""Sharded training steps for the two trainable model families.

The reference defines losses but never calls them (SURVEY.md: T3.loss at
t3.py:168-202, CFM compute_loss at flow_matching.py:146-185 — no trainer).
This module supplies the missing trainer, TPU-native: one pjit'd step per
model over a dp x tp mesh (parallel/mesh.py), adamw in optax, batch sharded
over dp, Llama weights Megatron-sharded over tp, gradients reduced by the
collectives GSPMD inserts over ICI.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import T3Config, CFMConfig, FlowDecoderConfig
from ..models import t3 as t3_mod
from ..models import cfm as cfm_mod
from ..parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _adamw(lr: float = 1e-4, wd: float = 0.01):
    return optax.adamw(lr, weight_decay=wd)


# ---------------------------------------------------------------------------
# T3 (speech LM) training
# ---------------------------------------------------------------------------

def t3_loss_fn(params, batch: Dict[str, jnp.ndarray], cfg: T3Config, dtype):
    cond = t3_mod.T3Cond(speaker_emb=batch["speaker_emb"],
                         cond_prompt_speech_tokens=batch["cond_prompt_tokens"],
                         emotion_adv=batch["emotion_adv"])
    loss_text, loss_speech = t3_mod.loss(
        params, cond, batch["text_tokens"], batch["text_lens"],
        batch["speech_tokens"], batch["speech_lens"], cfg, dtype)
    return loss_text + loss_speech, {"loss_text": loss_text, "loss_speech": loss_speech}


def init_t3_train_state(params, lr: float = 1e-4) -> TrainState:
    opt = _adamw(lr)
    return TrainState(params, opt.init(params), jnp.int32(0))


def make_t3_train_step(mesh: Mesh, cfg: T3Config = T3Config(), lr: float = 1e-4,
                       dtype=jnp.float32, remat: bool = True):
    """Returns a jitted (state, batch) -> (state, metrics) step sharded over
    the mesh. Batch arrays shard over dp on axis 0."""
    opt = _adamw(lr)
    loss_core = t3_loss_fn
    if remat:
        # rematerialise the backbone to trade FLOPs for HBM during backward
        loss_core = jax.checkpoint(t3_loss_fn, static_argnums=(2, 3))

    def step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_core, has_aux=True)(
            state.params, batch, cfg, dtype)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss, step=state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    dp_spec = P("dp")
    batch_sharding = {
        "speaker_emb": dp_spec, "cond_prompt_tokens": dp_spec, "emotion_adv": dp_spec,
        "text_tokens": dp_spec, "text_lens": dp_spec,
        "speech_tokens": dp_spec, "speech_lens": dp_spec,
    }
    batch_shardings = {k: NamedSharding(mesh, v) for k, v in batch_sharding.items()}
    return jax.jit(step), batch_shardings


def shard_t3_state(state: TrainState, mesh: Mesh, lr: float = 1e-4) -> TrainState:
    """Place params per the tp/dp spec; re-init the optimizer so the adam
    moments (zeros_like of params) inherit the same shardings."""
    spec = mesh_lib.t3_param_spec(state.params)
    params = mesh_lib.shard_params(state.params, spec, mesh)
    return TrainState(params, _adamw(lr).init(params), state.step)


# ---------------------------------------------------------------------------
# CFM (flow decoder) training
# ---------------------------------------------------------------------------

def flow_loss_fn(params, key, batch, cfm_cfg: CFMConfig, dec_cfg: FlowDecoderConfig,
                 dtype):
    loss = cfm_mod.compute_loss(
        params, key, batch["mel"], batch["mu"], batch["spks"], batch["cond"],
        batch["mask"], cfm_cfg, dec_cfg, dtype)
    return loss, {"loss_cfm": loss}


def init_flow_train_state(params, lr: float = 1e-4) -> TrainState:
    opt = _adamw(lr)
    return TrainState(params, opt.init(params), jnp.int32(0))


def make_flow_train_step(mesh: Mesh, cfm_cfg: CFMConfig = CFMConfig(),
                         dec_cfg: FlowDecoderConfig = FlowDecoderConfig(),
                         lr: float = 1e-4, dtype=jnp.float32):
    opt = _adamw(lr)

    def step(state: TrainState, key, batch):
        (loss, metrics), grads = jax.value_and_grad(flow_loss_fn, has_aux=True)(
            state.params, key, batch, cfm_cfg, dec_cfg, dtype)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), dict(metrics, loss=loss)

    dp = NamedSharding(mesh, P("dp"))
    batch_shardings = {k: dp for k in ("mel", "mu", "spks", "cond", "mask")}
    return jax.jit(step), batch_shardings

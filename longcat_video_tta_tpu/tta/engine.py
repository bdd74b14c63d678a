"""Jitted TTA optimization engine.

Replaces the reference's per-method optimize_* loops
(run_delta_a.py:224-305 and siblings): AdamW/SGD + global-norm clip 1.0,
conditioning-aware loss, one fused XLA step
``(train_params, opt_state, rng) -> (train_params, opt_state, loss)``
with zero host round-trips inside the step.

Note on clipping: the reference clips some methods per-parameter
(run_delta_b.py:386-388) and others as a single tensor; we use
optax.clip_by_global_norm over the whole trainable tree (equivalent for
single-tensor methods, near-equivalent otherwise).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import DiTConfig, OptimConfig
from ..utils.tree import global_norm
from .adapters import AdapterScheme
from .losses import flow_matching_loss_conditioned


def build_optimizer(ocfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW (betas, eps 1e-15 — run_delta_a.py:245) or momentum-free SGD
    (the full-TTA default, run_full_tta.py — Adam state doesn't fit)."""
    lr = ocfg.lr
    if ocfg.warmup_steps > 0:
        # linear warmup to lr then constant (reference: warmup_steps,
        # run_full_tta.py / series yaml fixed blocks)
        lr = optax.linear_schedule(0.0, ocfg.lr, ocfg.warmup_steps)
    if ocfg.optimizer == "adamw":
        opt = optax.adamw(
            lr, b1=ocfg.betas[0], b2=ocfg.betas[1], eps=ocfg.eps,
            weight_decay=ocfg.weight_decay,
        )
    elif ocfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=ocfg.momentum or None)
    else:
        raise ValueError(f"unknown optimizer {ocfg.optimizer}")
    return optax.chain(optax.clip_by_global_norm(ocfg.grad_clip_norm), opt)


def make_train_step(
    scheme: AdapterScheme,
    cfg: DiTConfig,
    tx: optax.GradientTransformation,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
) -> Callable:
    """Build the jitted conditioned-loss train step for one method.

    step(train_params, opt_state, base_params, cond_latents,
         target_latents, text_emb, text_mask, rng)
      -> (train_params, opt_state, loss)
    """

    @jax.jit
    def step(train_params, opt_state, base_params, cond_latents,
             target_latents, text_emb, text_mask, rng):
        def loss_fn(tp):
            dit_params, adapters = scheme.to_forward(tp, base_params)
            return flow_matching_loss_conditioned(
                dit_params, cfg, cond_latents, target_latents,
                text_emb, text_mask, rng,
                adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
            )

        loss, grads = jax.value_and_grad(loss_fn)(train_params)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss

    return step


def adapter_norm(train_params) -> float:
    """delta_norm-style diagnostic (run_delta_a.py:302)."""
    return float(global_norm(train_params))

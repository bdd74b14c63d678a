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
from ..utils.memo import memoize_factory
from ..utils.tree import global_norm
from .adapters import AdapterScheme
from .losses import (
    flow_matching_loss_conditioned,
    flow_matching_loss_conditioned_fixed,
)

# The three make_* factories and build_optimizer are memoized on their
# arguments (utils/memo.py): repeat driver runs with equal configs in
# one process (in-process sweeps, the test suite) reuse one jit wrapper
# — and therefore its traces — instead of re-tracing per run. The
# factories are pure; cache hits require callers to pass the CANONICAL
# scheme/tx objects, which run_tta does by building them through the
# (also memoized) build_scheme/build_optimizer.


@memoize_factory
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


@memoize_factory
def make_train_step(
    scheme: AdapterScheme,
    cfg,
    tx: optax.GradientTransformation,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    loss_fn: Callable = flow_matching_loss_conditioned,
) -> Callable:
    """Build the jitted conditioned-loss train step for one method.

    step(train_params, opt_state, base_params, cond_latents,
         target_latents, text_emb, text_mask, rng)
      -> (train_params, opt_state, loss)

    ``loss_fn`` follows the conditioned-loss calling convention
    (dit_params, cfg, cond, target, text_a, text_b, rng, adapters=,
    attn_impl=, cp_mesh=, num_valid_target=); the LongCat loss binds
    (text_a, text_b) = (emb, mask), the MMDiT loss = (txt, y_vec).
    """
    cond_loss = loss_fn

    @jax.jit
    def step(train_params, opt_state, base_params, cond_latents,
             target_latents, text_emb, text_mask, rng,
             num_valid_target=None):
        def loss_fn(tp):
            dit_params, adapters = scheme.to_forward(tp, base_params)
            return cond_loss(
                dit_params, cfg, cond_latents, target_latents,
                text_emb, text_mask, rng,
                adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
                num_valid_target=num_valid_target,
            )

        loss, grads = jax.value_and_grad(loss_fn)(train_params)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss

    return step


@memoize_factory
def make_train_chunk(
    scheme: AdapterScheme,
    cfg,
    tx: optax.GradientTransformation,
    attn_impl: Optional[str] = None,
    cp_mesh=None,
    anchor_sigmas: Tuple[float, ...] = (),
    loss_fn: Callable = flow_matching_loss_conditioned,
    anchor_fn: Callable = flow_matching_loss_conditioned_fixed,
) -> Callable:
    """Device-side multi-step trainer: one XLA dispatch per k steps.

    The reference's optimize_* loops sync the host every step
    (``loss.item()``, run_delta_a.py:224-305) and run the early-stopping
    anchor eval as a separate blocking forward (early_stopping.py:190).
    Here a ``lax.scan`` runs ``k = len(variant_idx)`` optimizer steps on
    device, selecting the per-step training variant (augmentation pick or
    batch-TTA round-robin, run_delta_a.py:308-363) by dynamic index into
    stacked tensors, and — when ``val_latents`` is given — folds the fixed-
    sigma anchor loss into the same compiled call. The driver fetches
    (losses[k], anchor) with a single ``device_get`` per chunk, so host
    round-trips drop from ~2k+1 per check window to 1.

    chunk(train_params, opt_state, base_params,
          cond_stack,  # [V, B, C, T_cond, H, W]
          train_stack, # [V, B, C, T_tgt, H, W]
          emb_stack,   # [V, B, L, C_text]
          mask_stack,  # [V, B, L]
          variant_idx, # [k] int32 — per-step index into the stacks
          rngs,        # [k] PRNG keys
          val_latents=None, fixed_noises=None,
          valid_stack=None)  # [V] int32 — per-variant valid target
                             # latent count (shape bucketing)
      -> (train_params, opt_state, losses[k], anchor_loss | None)

    ``opt_state`` is donated; ``train_params`` is NOT (the early stopper
    snapshots are plain references to these immutable arrays).
    """

    def chunk(train_params, opt_state, base_params, cond_stack, train_stack,
              emb_stack, mask_stack, variant_idx, rngs,
              val_latents=None, fixed_noises=None, valid_stack=None):
        def body(carry, xs):
            tp, ost = carry
            i, r = xs

            def step_loss(tp_):
                dit_params, adapters = scheme.to_forward(tp_, base_params)
                return loss_fn(
                    dit_params, cfg, cond_stack[i], train_stack[i],
                    emb_stack[i], mask_stack[i], r,
                    adapters=adapters, attn_impl=attn_impl, cp_mesh=cp_mesh,
                    num_valid_target=(None if valid_stack is None
                                      else valid_stack[i]),
                )

            loss, grads = jax.value_and_grad(step_loss)(tp)
            updates, ost = tx.update(grads, ost, tp)
            tp = optax.apply_updates(tp, updates)
            return (tp, ost), loss

        (train_params, opt_state), losses = jax.lax.scan(
            body, (train_params, opt_state), (variant_idx, rngs))

        anchor = None
        if val_latents is not None:
            dit_params, adapters = scheme.to_forward(train_params,
                                                     base_params)
            # the anchor forward rides the same ring as the train steps;
            # cp_mesh is passed conditionally because the non-longcat
            # anchor fns (which the CLI never pairs with a context mesh)
            # do not take the kwarg
            anchor = anchor_fn(
                dit_params, cfg, cond_stack[0], val_latents,
                emb_stack[0], mask_stack[0], fixed_noises,
                fixed_sigmas=anchor_sigmas,
                adapters=adapters, attn_impl=attn_impl,
                **({"cp_mesh": cp_mesh} if cp_mesh is not None else {}),
            )
        return train_params, opt_state, losses, anchor

    return jax.jit(chunk, donate_argnums=(1,))


def adapter_norm(train_params) -> float:
    """delta_norm-style diagnostic (run_delta_a.py:302)."""
    return float(global_norm(train_params))


@memoize_factory
def make_batched_train_chunk(
    scheme: AdapterScheme,
    cfg,
    tx: optax.GradientTransformation,
    attn_impl: Optional[str] = None,
    anchor_sigmas: Tuple[float, ...] = (),
    loss_fn: Callable = flow_matching_loss_conditioned,
    anchor_fn: Callable = flow_matching_loss_conditioned_fixed,
    mesh=None,
) -> Callable:
    """Video-parallel TTA: vmap the per-video optimizer over a leading
    video axis and (optionally) shard that axis over the mesh "data"
    dimension — the reference's SLURM-array data parallelism
    (SURVEY.md §2.10 DP row: "per-video loop is embarrassingly parallel
    across a pod slice") as ONE compiled program instead of a job fleet.

    chunk(tps, opt_states, base_params,
          cond, train,     # [V, B, C, T, H, W]
          emb, mask,       # [V, B, ...]
          rngs,            # [V, k] PRNG keys
          val_latents=None,   # [V, B, C, Tv, H, W]
          fixed_noises=None)  # [V, n_draws, B, ...]
      -> (tps, opt_states, losses [V, k], anchors [V] | None)

    ``tps``/``opt_states`` carry a leading V axis on every leaf (stack
    per-video scheme.init / tx.init results). ``base_params`` is shared
    (broadcast — the frozen backbone is one copy, replicated or sharded
    however the caller laid it out).
    """

    def one_video(tp, ost, base_params, cond, train, emb, mask, rngs,
                  val, noises):
        def body(carry, r):
            tp, ost = carry

            def step_loss(tp_):
                dit_params, adapters = scheme.to_forward(tp_, base_params)
                return loss_fn(
                    dit_params, cfg, cond, train, emb, mask, r,
                    adapters=adapters, attn_impl=attn_impl,
                )

            loss, grads = jax.value_and_grad(step_loss)(tp)
            updates, ost = tx.update(grads, ost, tp)
            tp = optax.apply_updates(tp, updates)
            return (tp, ost), loss

        (tp, ost), losses = jax.lax.scan(body, (tp, ost), rngs)
        anchor = jnp.zeros(())
        if val is not None:
            dit_params, adapters = scheme.to_forward(tp, base_params)
            anchor = anchor_fn(
                dit_params, cfg, cond, val, emb, mask, noises,
                fixed_sigmas=anchor_sigmas,
                adapters=adapters, attn_impl=attn_impl,
            )
        return tp, ost, losses, anchor

    def chunk(tps, opt_states, base_params, cond, train, emb, mask, rngs,
              val_latents=None, fixed_noises=None):
        out = jax.vmap(
            one_video,
            in_axes=(0, 0, None, 0, 0, 0, 0, 0,
                     None if val_latents is None else 0,
                     None if fixed_noises is None else 0),
        )(tps, opt_states, base_params, cond, train, emb, mask, rngs,
          val_latents, fixed_noises)
        tps, opt_states, losses, anchors = out
        if val_latents is None:
            anchors = None
        return tps, opt_states, losses, anchors

    if mesh is None:
        return jax.jit(chunk, donate_argnums=(1,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    vspec = NamedSharding(mesh, P("data"))

    def sharded(tps, opt_states, base_params, cond, train, emb, mask,
                rngs, val_latents=None, fixed_noises=None):
        shard = lambda t: jax.lax.with_sharding_constraint(
            t, vspec) if hasattr(t, "shape") else t
        cond, train, emb, mask = (jax.tree.map(shard, x)
                                  for x in (cond, train, emb, mask))
        tps = jax.tree.map(shard, tps)
        return chunk(tps, opt_states, base_params, cond, train, emb,
                     mask, rngs, val_latents, fixed_noises)

    return jax.jit(sharded, donate_argnums=(1,))

"""Anchored early stopping for TTA.

Behavior-compatible rebuild of the reference's ``AnchoredEarlyStopper``
(early_stopping.py:72-317): deterministic anchor loss on held-out val
latents at fixed sigmas x fixed noise draws (seeded from
md5(video_id) — early_stopping.py:166), checked every ``check_every``
steps, strategies ``patience`` / ``first_rise``, in-memory best-state
snapshot, ``state`` export with the full ``loss_history`` that
export_loss_curves.py consumes.

JAX notes: snapshots are plain references to immutable device arrays
(no deepcopy needed); the anchor evaluation is one jitted call.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DiTConfig, EarlyStoppingConfig
from .adapters import AdapterScheme
from .losses import flow_matching_loss_conditioned_fixed


def fixed_noise_seed(video_id: str) -> int:
    """md5-derived base seed (early_stopping.py:166 parity)."""
    return int(hashlib.md5(video_id.encode()).hexdigest()[:8], 16) % (2 ** 31)


class AnchoredEarlyStopper:
    def __init__(self, escfg: EarlyStoppingConfig, scheme: AdapterScheme,
                 dit_cfg, attn_impl: Optional[str] = None,
                 anchor_fn=flow_matching_loss_conditioned_fixed,
                 cp_mesh=None):
        self.cfg = escfg
        self.scheme = scheme
        self.dit_cfg = dit_cfg
        self.attn_impl = attn_impl
        self.anchor_fn = anchor_fn
        self.cp_mesh = cp_mesh
        self._reset()

    def _reset(self):
        self.base_params = None
        self.cond_latents = None
        self.val_latents = None
        self.text_emb = None
        self.text_mask = None
        self.fixed_noises = None
        self.best_loss = float("inf")
        self.best_state = None
        self.checks_without_improvement = 0
        self.step_count = 0
        self.stopped_early = False
        self.best_step = 0
        self.loss_history: List[Tuple[int, float]] = []

    # ------------------------------------------------------------------
    def setup(self, base_params, cond_latents, val_latents, text_emb,
              text_mask, video_id: str, initial_train_params):
        """Per-video initialization: cache tensors, draw fixed noises,
        snapshot the initial state, record the initial anchor loss."""
        self._reset()
        self.base_params = base_params
        self.cond_latents = cond_latents
        self.val_latents = val_latents
        self.text_emb = text_emb
        self.text_mask = text_mask

        seed = fixed_noise_seed(video_id)
        keys = [jax.random.PRNGKey(seed + d) for d in range(self.cfg.noise_draws)]
        self.fixed_noises = jnp.stack([
            jax.random.normal(k, val_latents.shape, jnp.float32) for k in keys
        ])

        self.best_state = initial_train_params
        self.best_loss = self._anchor_loss(initial_train_params)
        self.loss_history.append((0, self.best_loss))

    def _anchor_loss(self, train_params) -> float:
        dit_params, adapters = self.scheme.to_forward(
            train_params, self.base_params
        )
        loss = self.anchor_fn(
            dit_params, self.dit_cfg, self.cond_latents, self.val_latents,
            self.text_emb, self.text_mask, self.fixed_noises,
            fixed_sigmas=tuple(self.cfg.anchor_sigmas),
            adapters=adapters, attn_impl=self.attn_impl,
            **({"cp_mesh": self.cp_mesh} if self.cp_mesh is not None
               else {}),
        )
        return float(loss)

    # ------------------------------------------------------------------
    def step(self, current_step: int, train_params) -> Tuple[bool, Dict[str, Any]]:
        """Call every training step with the current trainable params.
        Returns (should_stop, info)."""
        self.step_count = current_step
        if current_step == 0 or current_step % self.cfg.check_every != 0:
            return False, {}

        return self.step_with_loss(current_step, train_params,
                                   self._anchor_loss(train_params))

    def step_with_loss(self, current_step: int, train_params,
                       anchor_loss: float) -> Tuple[bool, Dict[str, Any]]:
        """Record a precomputed anchor loss (the chunked trainer folds the
        anchor eval into the same XLA dispatch — engine.make_train_chunk)
        and apply the patience / first_rise decision."""
        self.step_count = current_step
        loss = float(anchor_loss)
        self.loss_history.append((current_step, loss))

        improved = loss < self.best_loss
        if improved:
            self.best_loss = loss
            self.best_step = current_step
            self.best_state = train_params  # immutable pytree reference
            self.checks_without_improvement = 0
        else:
            self.checks_without_improvement += 1

        info = {
            "anchor_loss": loss,
            "best_loss": self.best_loss,
            "best_step": self.best_step,
            "checks_without_improvement": self.checks_without_improvement,
        }
        should_stop = False
        if self.cfg.strategy == "patience":
            should_stop = (
                self.checks_without_improvement >= self.cfg.patience
            )
        elif self.cfg.strategy == "first_rise":
            should_stop = (not improved) and current_step > 0
        if should_stop:
            self.stopped_early = True
        return should_stop, info

    # ------------------------------------------------------------------
    def restore(self):
        """Return the best trainable params (caller swaps them in)."""
        return self.best_state

    @property
    def state(self) -> Optional[Dict[str, Any]]:
        if not self.loss_history:
            return None
        return {
            "stopped_early": self.stopped_early,
            "best_step": self.best_step,
            "best_loss": self.best_loss,
            "total_checks": len(self.loss_history),
            "loss_history": self.loss_history,
        }


def build_early_stopper(
    escfg: EarlyStoppingConfig, scheme: AdapterScheme, dit_cfg,
    attn_impl: Optional[str] = None,
    anchor_fn=flow_matching_loss_conditioned_fixed,
    cp_mesh=None,
) -> Optional[AnchoredEarlyStopper]:
    if not escfg.enabled:
        return None
    return AnchoredEarlyStopper(escfg, scheme, dit_cfg, attn_impl,
                                anchor_fn=anchor_fn, cp_mesh=cp_mesh)

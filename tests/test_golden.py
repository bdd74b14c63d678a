"""Golden numerical-regression tests (SURVEY.md §4: "shape/dtype golden
tests for VAE/DiT" the reference lacked). Values recorded on the CPU
backend at fixed seeds; a drift here means a semantic change to the
model math, not a refactor."""

import jax
import jax.numpy as jnp
import pytest

from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.models import dit as M, umt5 as U, vae as V
from longcat_video_tta_tpu.tta.losses import flow_matching_loss_conditioned

CFG = longcat_tiny()


def test_dit_forward_golden():
    params = M.init_dit(jax.random.PRNGKey(0), CFG.dit, zero_init=False)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 4, 8))
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (1, CFG.dit.text_len, CFG.dit.text_dim))
    mask = jnp.ones((1, CFG.dit.text_len), jnp.int32)
    out = M.dit_forward(params, CFG.dit, lat, jnp.full((1,), 500.0), text,
                        mask)
    assert float(out.sum()) == pytest.approx(0.5441559553146362, abs=1e-3)
    assert float(jnp.abs(out).max()) == pytest.approx(0.5175732970237732,
                                                      abs=1e-3)


def test_conditioned_loss_golden():
    params = M.init_dit(jax.random.PRNGKey(0), CFG.dit, zero_init=False)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 4, 8))
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (1, CFG.dit.text_len, CFG.dit.text_dim))
    mask = jnp.ones((1, CFG.dit.text_len), jnp.int32)
    loss = flow_matching_loss_conditioned(
        params, CFG.dit, lat[:, :, :2], lat[:, :, 2:], text, mask,
        jax.random.PRNGKey(7))
    assert float(loss) == pytest.approx(2.0191195011138916, abs=1e-3)


def test_vae_encode_golden():
    vp = V.init_vae(jax.random.PRNGKey(3), CFG.vae)
    vid = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 5, 16, 32),
                             minval=-1.0, maxval=1.0)
    z = V.vae_encode(vp, CFG.vae, vid)
    assert float(z.sum()) == pytest.approx(9.42812156677246, abs=1e-2)


def test_umt5_golden():
    tp = U.init_umt5(jax.random.PRNGKey(5), CFG.text)
    ids = jax.random.randint(jax.random.PRNGKey(6),
                             (1, CFG.text.max_length), 0,
                             CFG.text.vocab_size)
    emb = U.umt5_encode(tp, CFG.text, ids, jnp.ones_like(ids))
    assert float(emb.sum()) == pytest.approx(-16.78590965270996, abs=1e-2)

"""UMT5 encoder: shape, mask invariance of unmasked positions, bias buckets."""

import jax
import jax.numpy as jnp
import numpy as np

from longcat_video_tta_tpu.config import longcat_tiny
from longcat_video_tta_tpu.models import umt5 as U

CFG = longcat_tiny().text


def test_encode_shape():
    params = U.init_umt5(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, CFG.max_length), 0,
                             CFG.vocab_size)
    mask = jnp.ones((2, CFG.max_length), jnp.int32)
    out = U.umt5_encode(params, CFG, ids, mask)
    assert out.shape == (2, CFG.max_length, CFG.d_model)


def test_masked_tokens_do_not_leak():
    """Changing ids under the padding mask must not change unmasked outputs."""
    params = U.init_umt5(jax.random.PRNGKey(0), CFG)
    L = CFG.max_length
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, L), 0, CFG.vocab_size)
    mask = jnp.ones((1, L), jnp.int32).at[:, 8:].set(0)
    out1 = U.umt5_encode(params, CFG, ids, mask)
    ids2 = ids.at[:, 8:].set(0)
    out2 = U.umt5_encode(params, CFG, ids2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :8]), np.asarray(out2[:, :8]),
                               atol=1e-5)


def test_relative_bucket_symmetry_properties():
    b = U._relative_position_bucket(jnp.array([-64, -2, -1, 0, 1, 2, 64]),
                                    num_buckets=32, max_distance=128)
    b = np.asarray(b)
    assert b[3] == 0                      # zero distance -> bucket 0
    assert (b[4:] >= 16).all()            # positive side offset by half
    assert (b[:3] < 16).all()
    assert b[0] != b[1]                   # far vs near distinguishable

"""Full generate_vc-chain parity vs an independent torch oracle
(VERDICT r4 #5): flow-match Euler schedule + CFG + KV-cache prefix
conditioning + unpatchify -> VAE decode, at tiny geometry.

The module-level oracles (test_oracle_dit / test_oracle_vae) close the
converter risk; this closes the SAMPLER risk — a step-indexing or
sigma-schedule off-by-one, a wrong CFG combine, or a cache-vs-concat
prefix mismatch would pass every module test and still corrupt every
generated video. The torch side re-implements the documented reference
semantics (generate_vc: common.py:566-611; scheduler config
common.py:68-70; sigma shift / euler conventions of
FlowMatchEulerDiscreteScheduler) with explicit per-step Python, using
the already-oracle-validated LongCatDiTOracle as the network.

Parity is asserted at MULTIPLE step counts (each has its own sigma
schedule, so agreement pins every step's sigma/timestep/CFG/euler
math), on BOTH sampler paths (KV-cache and concat — proving the cache
prefix is semantics-preserving), and through the decode chain to
pixels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_oracles import LongCatDiTOracle, WanVAEOracle  # noqa: E402

from longcat_video_tta_tpu.config import (  # noqa: E402
    DiTConfig, SchedulerConfig, VAEConfig,
)
from longcat_video_tta_tpu.models.convert import (  # noqa: E402
    convert_torch_dit_state, convert_torch_vae_state,
)
from longcat_video_tta_tpu.models import vae as jvae  # noqa: E402
from longcat_video_tta_tpu.pipeline.sampler import sample_latents  # noqa: E402

DIT = DiTConfig(
    hidden_size=64, depth=2, num_heads=4, in_channels=4, out_channels=4,
    patch_size=(1, 2, 2), adaln_tembed_dim=32, ffn_dim=96, text_dim=40,
    text_len=12, rope_dims=(4, 6, 6), t_embed_freq_dim=16,
    param_dtype="float32", compute_dtype="float32", remat=False,
)
VAE = VAEConfig(
    z_dim=4, base_dim=8, dim_mults=(1, 2, 4, 4), num_res_blocks=1,
    temporal_downsample=(False, True, True),
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4),
    param_dtype="float32", compute_dtype="float32",
)
SCHED = SchedulerConfig()  # shift 5.0, 1000 train timesteps


def torch_build_sigmas(n_steps, cfg):
    """Mirror of models/scheduler.py::build_sigmas in numpy."""
    s = np.linspace(1.0, 1.0 / n_steps, n_steps)
    s = cfg.shift * s / (1.0 + (cfg.shift - 1.0) * s)
    s = s * cfg.sigma_max
    return np.concatenate([s, [0.0]]).astype(np.float32)


def torch_generate_vc(model, cond, init_noise, emb, mask, neg_emb,
                      neg_mask, g, n_steps):
    """Reference-semantics sampler: per-step concat(cond, x) forward
    with per-token timesteps [0..0, t..t], CFG combine, euler step.
    Returns the per-step latent trajectory (list of [B,C,Lg,H,W])."""
    sigmas = torch_build_sigmas(n_steps, SCHED)
    x = torch.from_numpy(init_noise) * float(sigmas[0])
    cond_t = torch.from_numpy(cond)
    n_cond = cond_t.shape[2]
    B = x.shape[0]
    emb2 = torch.from_numpy(np.concatenate([neg_emb, emb], 0))
    mask2 = torch.from_numpy(np.concatenate([neg_mask, mask], 0))
    traj = []
    with torch.no_grad():
        for i in range(n_steps):
            sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
            t_val = sigma * SCHED.num_train_timesteps
            full = torch.cat([cond_t, x], dim=2)
            full2 = torch.cat([full, full], dim=0)
            nt = full.shape[2]
            tsteps = torch.zeros((2 * B, nt))
            tsteps[:, n_cond:] = t_val
            v_all = model(full2, tsteps, emb2, mask2,
                          num_cond_latents=n_cond)
            v = v_all[:, :, n_cond:]
            v_u, v_c = v[:B], v[B:]
            v = v_u + g * (v_c - v_u)
            x = x + (sigma_next - sigma) * v
            traj.append(x.numpy().copy())
    return traj


@pytest.fixture(scope="module")
def stack():
    torch.manual_seed(21)
    model = LongCatDiTOracle(DIT).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    dit_params = convert_torch_dit_state(sd, DIT)
    rng = np.random.RandomState(5)
    B, L = 1, DIT.text_len
    data = {
        "cond": rng.randn(B, 4, 1, 8, 8).astype(np.float32) * 0.3,
        "noise": rng.randn(B, 4, 2, 8, 8).astype(np.float32),
        "emb": rng.randn(B, L, DIT.text_dim).astype(np.float32),
        "neg_emb": rng.randn(B, L, DIT.text_dim).astype(np.float32),
        "mask": np.ones((B, L), np.float32),
    }
    data["mask"][0, 9:] = 0.0
    data["neg_mask"] = np.ones((B, L), np.float32)
    return model, dit_params, data


@pytest.mark.parametrize("n_steps", [1, 2, 4])
@pytest.mark.parametrize("use_kv_cache", [True, False])
def test_sampler_matches_torch_chain(stack, n_steps, use_kv_cache):
    model, dit_params, d = stack
    g = 4.0
    traj = torch_generate_vc(model, d["cond"], d["noise"], d["emb"],
                             d["mask"], d["neg_emb"], d["neg_mask"],
                             g, n_steps)
    ours = np.asarray(sample_latents(
        dit_params, DIT, SCHED, jax.random.PRNGKey(0),
        jnp.asarray(d["emb"]), jnp.asarray(d["mask"]),
        jnp.asarray(d["neg_emb"]), jnp.asarray(d["neg_mask"]), g,
        num_gen_latents=2, num_steps=n_steps, lat_h=8, lat_w=8,
        cond_latents=jnp.asarray(d["cond"]),
        use_kv_cache=use_kv_cache, attn_impl="xla",
        init_noise=jnp.asarray(d["noise"]),
    ))
    # agreement at every step count pins each schedule's sigma set,
    # timestep mapping, CFG combine, and euler increment
    np.testing.assert_allclose(ours, traj[-1], atol=2e-3, rtol=2e-3)


def test_t2v_path_matches_torch(stack):
    """No-conditioning (generate_t2v) chain: same schedule/CFG math with
    n_cond=0."""
    model, dit_params, d = stack
    g, n_steps = 4.0, 3
    traj = torch_generate_vc(
        model, np.zeros((1, 4, 0, 8, 8), np.float32), d["noise"],
        d["emb"], d["mask"], d["neg_emb"], d["neg_mask"], g, n_steps)
    ours = np.asarray(sample_latents(
        dit_params, DIT, SCHED, jax.random.PRNGKey(0),
        jnp.asarray(d["emb"]), jnp.asarray(d["mask"]),
        jnp.asarray(d["neg_emb"]), jnp.asarray(d["neg_mask"]), g,
        num_gen_latents=2, num_steps=n_steps, lat_h=8, lat_w=8,
        cond_latents=None, attn_impl="xla",
        init_noise=jnp.asarray(d["noise"]),
    ))
    np.testing.assert_allclose(ours, traj[-1], atol=2e-3, rtol=2e-3)


def test_chain_through_vae_decode(stack):
    """Latents from the sampler decode to the same pixels through the
    converted VAE as through the torch oracle decoder — closing the
    unpatchify -> denormalize -> decode tail of generate_vc
    (common.py:209-221, 566-611)."""
    model, dit_params, d = stack
    ours = np.asarray(sample_latents(
        dit_params, DIT, SCHED, jax.random.PRNGKey(0),
        jnp.asarray(d["emb"]), jnp.asarray(d["mask"]),
        jnp.asarray(d["neg_emb"]), jnp.asarray(d["neg_mask"]), 4.0,
        num_gen_latents=2, num_steps=2, lat_h=8, lat_w=8,
        cond_latents=jnp.asarray(d["cond"]),
        use_kv_cache=True, attn_impl="xla",
        init_noise=jnp.asarray(d["noise"]),
    ))
    torch.manual_seed(7)
    vmodel = WanVAEOracle(VAE).eval()
    with torch.no_grad():
        for p in vmodel.parameters():
            p.normal_(std=0.15)
    vsd = {k: v.numpy() for k, v in vmodel.state_dict().items()}
    vparams = convert_torch_vae_state(vsd, VAE)

    jpix = np.asarray(jvae.vae_decode(vparams, VAE, jnp.asarray(ours)))
    with torch.no_grad():
        tdec = vmodel.decode(torch.from_numpy(ours)).numpy()
    tpix = np.clip((tdec + 1.0) / 2.0, 0.0, 1.0)
    assert jpix.shape == tpix.shape
    np.testing.assert_allclose(jpix, tpix, atol=2e-3, rtol=2e-3)

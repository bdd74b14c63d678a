"""TTA engine: all 7 methods train, zero-init identity, the
delta_a ≡ delta_b(G=1) equivalence (the reference validated this
empirically as series delta_a_equiv_verify — SURVEY.md §4.4), latent
split semantics, early stopping lifecycle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcat_video_tta_tpu.config import (
    AdapterConfig,
    EarlyStoppingConfig,
    FrameConfig,
    OptimConfig,
    longcat_tiny,
)
from longcat_video_tta_tpu.models.dit import dit_forward, init_dit
from longcat_video_tta_tpu.tta import (
    build_early_stopper,
    build_optimizer,
    build_scheme,
    flow_matching_loss_conditioned,
    make_train_step,
    split_tta_latents,
)
from longcat_video_tta_tpu.tta.split import (
    estimate_tta_split_budget,
    resolve_frame_window,
)

CFG = longcat_tiny().dit


@pytest.fixture(scope="module")
def setup():
    params = init_dit(jax.random.PRNGKey(0), CFG, zero_init=False)
    B, C = 1, CFG.in_channels
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, C, 6, 8, 12))
    text = jax.random.normal(jax.random.PRNGKey(2),
                             (B, CFG.text_len, CFG.text_dim))
    mask = jnp.ones((B, CFG.text_len), jnp.int32)
    return params, latents, text, mask


ALL_METHODS = [
    AdapterConfig(method="delta_a"),
    AdapterConfig(method="delta_b", num_groups=2, delta_target="timestep"),
    AdapterConfig(method="delta_b", num_groups=2, delta_target="hidden",
                  delta_dim=16),
    AdapterConfig(method="delta_c"),
    AdapterConfig(method="film", num_groups=2, film_mode="shift_scale"),
    AdapterConfig(method="lora", lora_rank=2, lora_alpha=4.0,
                  target_blocks="last_1"),
    AdapterConfig(method="norm_tune", norm_target="all_norm"),
    AdapterConfig(method="full"),
]


@pytest.mark.parametrize("acfg", ALL_METHODS,
                         ids=lambda a: f"{a.method}-{a.delta_target}"
                         if a.method == "delta_b" else a.method)
def test_method_trains_and_loss_decreases(acfg, setup):
    """Every method: zero-init identity vs base loss, then training on a
    fixed rng cycle actually DECREASES the loss on that cycle."""
    params, latents, text, mask = setup
    cond, train, val = split_tta_latents(latents, 2, 0.25)

    scheme = build_scheme(CFG, acfg)
    tp = scheme.init(jax.random.PRNGKey(3), base_params=params)

    # zero-init adapters must not change the loss vs no adapters
    dit_params, adapters = scheme.to_forward(tp, params)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]
    base_loss = flow_matching_loss_conditioned(
        params, CFG, cond, train, text, mask, rngs[0])
    init_loss = flow_matching_loss_conditioned(
        dit_params, CFG, cond, train, text, mask, rngs[0],
        adapters=adapters)
    np.testing.assert_allclose(float(init_loss), float(base_loss),
                               rtol=1e-5)

    def eval_cycle(tp):
        dp, ad = scheme.to_forward(tp, params)
        return float(np.mean([
            float(flow_matching_loss_conditioned(
                dp, CFG, cond, train, text, mask, r, adapters=ad))
            for r in rngs
        ]))

    before = eval_cycle(tp)
    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))
    step = make_train_step(scheme, CFG, tx)
    opt_state = tx.init(tp)
    for i in range(9):
        tp, opt_state, loss = step(tp, opt_state, params, cond, train,
                                   text, mask, rngs[i % 3])
        assert np.isfinite(float(loss))
    after = eval_cycle(tp)
    assert after < before, (
        f"{acfg.method}: loss did not decrease ({before} -> {after})")


def test_delta_a_equiv_delta_b_group1(setup):
    """delta_a ≡ delta_b(G=1, timestep, all blocks) at the block level:
    with the final layer's adaLN kernel zeroed (so the only difference
    — final-layer modulation — is removed), the two injections must
    produce identical velocities for the same delta vector."""
    params, latents, text, mask = setup
    params = dict(params)
    params["final"] = {
        "adaln": {
            "kernel": jnp.zeros_like(params["final"]["adaln"]["kernel"]),
            "bias": params["final"]["adaln"]["bias"],
        },
        "proj": params["final"]["proj"],
    }
    delta = jax.random.normal(jax.random.PRNGKey(9),
                              (CFG.adaln_tembed_dim,)) * 0.2
    t = jnp.full((1,), 500.0)

    sa = build_scheme(CFG, AdapterConfig(method="delta_a"))
    sb = build_scheme(CFG, AdapterConfig(method="delta_b", num_groups=1,
                                         delta_target="timestep"))
    _, ad_a = sa.to_forward({"delta": delta}, params)
    _, ad_b = sb.to_forward({"deltas": delta[None]}, params)

    out_a = dit_forward(params, CFG, latents, t, text, mask, adapters=ad_a)
    out_b = dit_forward(params, CFG, latents, t, text, mask, adapters=ad_b)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5)


def test_lora_builtin_equivalent_to_custom(setup):
    """--use-builtin-lora selects the merged-weight formulation
    (W + scale*a@b folded into base kernels, the reference's builtin
    LoRAModule forward patch); it must match the side-branch custom
    formulation in forward AND after training steps (the custom≡builtin
    signal the reference's lora_builtin_comparison series carried,
    summary_printout.txt:456-469)."""
    params, latents, text, mask = setup
    base = AdapterConfig(method="lora", lora_rank=2, lora_alpha=4.0,
                         lora_target_ffn=True, target_blocks="all")
    s_custom = build_scheme(CFG, base)
    s_builtin = build_scheme(
        CFG, dataclasses.replace(base, lora_builtin=True))
    tp = s_custom.init(jax.random.PRNGKey(3), base_params=params)
    # non-trivial b so the delta is active
    tp = jax.tree.map(lambda x: x + 0.01, tp)

    t = jnp.full((1,), 500.0)
    pc, ac = s_custom.to_forward(tp, params)
    pb, ab = s_builtin.to_forward(tp, params)
    assert ab == {}  # builtin injects via the kernels, not adapters
    out_c = dit_forward(pc, CFG, latents, t, text, mask, adapters=ac)
    out_b = dit_forward(pb, CFG, latents, t, text, mask, adapters=ab)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_b),
                               atol=2e-4)

    # gradients agree too -> training is equivalent (SGD: updates are
    # linear in grads, so fp-noise isn't sign-amplified as under Adam)
    tx = build_optimizer(OptimConfig(optimizer="sgd", lr=1e-2))
    c, tr, _ = split_tta_latents(latents, 2, 0.25)
    for scheme in (s_custom, s_builtin):
        step = make_train_step(scheme, CFG, tx)
        tpi, ost = tp, tx.init(tp)
        for s in range(2):
            tpi, ost, loss = step(tpi, ost, params, c, tr, text, mask,
                                  jax.random.PRNGKey(10 + s))
        if scheme is s_custom:
            ref_tp, ref_loss = tpi, float(loss)
        else:
            np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
            for a, b in zip(jax.tree.leaves(ref_tp),
                            jax.tree.leaves(tpi)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-5)


def test_split_tta_latents_sizes(setup):
    _, latents, _, _ = setup  # T=6
    cond, train, val = split_tta_latents(latents, 2, 0.25)
    assert cond.shape[2] == 2 and train.shape[2] == 3 and val.shape[2] == 1
    # degenerate: cond takes all but one frame -> val absorbs remainder,
    # then train falls back to remainder and val drops
    cond, train, val = split_tta_latents(latents, 7, 0.25)
    assert cond.shape[2] == 5 and train.shape[2] == 1 and val is None


def test_estimate_budget_mirrors_split():
    est = estimate_tta_split_budget(24, 8, 0.25)
    # 24 frames -> 1+23//4 = 6 latents; ctx 8 -> 1+7//4 = 2
    assert est == {"total_latents": 6, "cond_latents": 2,
                   "train_latents": 3, "val_latents": 1}


def test_resolve_frame_window_clamps_gt_leak():
    f = FrameConfig(num_cond_frames=14, gen_start_frame=10,
                    tta_total_frames=40)
    r = resolve_frame_window(f)
    # clamped to the anchor, then rounded down to 4k+1 (causal VAE)
    assert r.tta_total_frames == 9
    assert r.tta_context_frames == 9
    # non-4k+1 cond windows are rounded down so the latent boundary
    # stays flush with the anchor (ADVICE r1)
    assert r.num_cond_frames == 13


def test_resolve_frame_window_rounds_4k1():
    f = FrameConfig(num_cond_frames=13, gen_start_frame=32,
                    tta_total_frames=24)
    r = resolve_frame_window(f)
    assert r.num_cond_frames == 13
    assert r.tta_total_frames == 21  # 24 -> 21 (4k+1)
    assert r.tta_context_frames == 13


def test_early_stopper_lifecycle(setup):
    params, latents, text, mask = setup
    cond, train, val = split_tta_latents(latents, 2, 0.4)
    scheme = build_scheme(CFG, AdapterConfig(method="delta_a"))
    tp = scheme.init(jax.random.PRNGKey(0), base_params=params)

    es = build_early_stopper(
        EarlyStoppingConfig(check_every=1, patience=2, noise_draws=1,
                            anchor_sigmas=(0.5,)),
        scheme, CFG)
    es.setup(params, cond, val, text, mask, "vid_001", tp)
    assert len(es.loss_history) == 1

    # script the anchor losses so the control logic is tested
    # deterministically: initial was X; feed two non-improving values
    seq = iter([es.best_loss + 1.0, es.best_loss + 2.0])
    es._anchor_loss = lambda _tp: next(seq)
    bad = {"delta": jnp.full_like(tp["delta"], 10.0)}
    stop1, info1 = es.step(1, bad)
    assert not stop1 and info1["checks_without_improvement"] == 1
    stop2, info2 = es.step(2, bad)
    assert stop2 and es.stopped_early
    # restore returns the best (initial) state
    best = es.restore()
    np.testing.assert_allclose(np.asarray(best["delta"]),
                               np.asarray(tp["delta"]))
    st = es.state
    assert st["total_checks"] == 3 and st["best_step"] == 0


def test_early_stopper_noise_determinism():
    from longcat_video_tta_tpu.tta.early_stopping import fixed_noise_seed
    assert fixed_noise_seed("abc") == fixed_noise_seed("abc")
    assert fixed_noise_seed("abc") != fixed_noise_seed("abd")


def test_norm_tune_param_counts(setup):
    """Partition selects exactly the norm affines (SURVEY §2.3: the three
    scopes differ; qk_norm covers self+cross q/k RMS weights)."""
    params, _, _, _ = setup
    s_cross = build_scheme(CFG, AdapterConfig(method="norm_tune",
                                              norm_target="cross_attn_norm"))
    s_qk = build_scheme(CFG, AdapterConfig(method="norm_tune",
                                           norm_target="qk_norm"))
    s_all = build_scheme(CFG, AdapterConfig(method="norm_tune",
                                            norm_target="all_norm"))
    n_cross = s_cross.num_params(s_cross.init(None, params))
    n_qk = s_qk.num_params(s_qk.init(None, params))
    n_all = s_all.num_params(s_all.init(None, params))
    L, D, dh = CFG.depth, CFG.hidden_size, CFG.head_dim
    assert n_cross == L * D * 2
    assert n_qk == L * dh * 4
    assert n_all == n_cross + n_qk


def test_norm_tune_also_tune_delta_combo(setup):
    """--also-tune-delta: norm affines AND a delta_a vector train together
    (reference: run_norm_tune_tta.py:311)."""
    params, latents, text, mask = setup
    cond, train, _ = split_tta_latents(latents, 2, 0.25)
    acfg = AdapterConfig(method="norm_tune", norm_target="cross_attn_norm",
                         also_tune_delta=True)
    scheme = build_scheme(CFG, acfg)
    tp = scheme.init(jax.random.PRNGKey(0), base_params=params)
    assert "delta_t" in tp and "norms" in tp

    dp, adapters = scheme.to_forward(tp, params)
    assert adapters is not None and "delta_t" in adapters

    tx = build_optimizer(OptimConfig(lr=1e-2, warmup_steps=2))
    step = make_train_step(scheme, CFG, tx)
    opt_state = tx.init(tp)
    for i in range(3):
        tp, opt_state, loss = step(tp, opt_state, params, cond, train,
                                   text, mask, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
    assert float(jnp.abs(tp["delta_t"]).max()) > 0  # delta actually moved


def test_warmup_schedule_scales_lr():
    """warmup_steps > 0: first update is tiny, later updates full-size."""
    import optax

    tx = build_optimizer(OptimConfig(lr=1.0, optimizer="sgd",
                                     warmup_steps=4, grad_clip_norm=1e9))
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.ones((4,))}
    st = tx.init(p)
    up0, st = tx.update(g, st, p)
    for _ in range(5):
        up, st = tx.update(g, st, p)
    assert float(jnp.abs(up0["w"]).max()) < 0.3
    np.testing.assert_allclose(np.asarray(up["w"]), -1.0, rtol=1e-5)


def test_chunked_trainer_matches_per_step(setup):
    """make_train_chunk (one dispatch per k steps + fused anchor eval,
    VERDICT r1 item 9) must be step-for-step identical to the per-step
    make_train_step loop: same losses, same final params, same anchor."""
    from longcat_video_tta_tpu.tta.engine import make_train_chunk
    from longcat_video_tta_tpu.tta.losses import (
        flow_matching_loss_conditioned_fixed,
    )

    params, latents, text, mask = setup
    cond, train, val = split_tta_latents(latents, 2, 0.25)
    scheme = build_scheme(CFG, AdapterConfig(method="delta_b", num_groups=2,
                                             delta_target="timestep"))
    tx = build_optimizer(OptimConfig(lr=1e-2, optimizer="adamw"))
    sigmas = (0.25, 0.75)
    noises = jax.random.normal(jax.random.PRNGKey(9),
                               (2,) + val.shape, jnp.float32)
    rngs = [jax.random.PRNGKey(500 + i) for i in range(6)]

    # two "variants" with an alternating schedule
    cond2 = cond * 0.9
    train2 = train * 1.1
    sel = [0, 1, 0, 0, 1, 1]

    # per-step reference path
    step = make_train_step(scheme, CFG, tx)
    tp_a = scheme.init(jax.random.PRNGKey(3), base_params=params)
    os_a = tx.init(tp_a)
    losses_a = []
    for s in range(6):
        c = cond if sel[s] == 0 else cond2
        t = train if sel[s] == 0 else train2
        tp_a, os_a, loss = step(tp_a, os_a, params, c, t, text, mask,
                                rngs[s])
        losses_a.append(float(loss))
    dp_a, ad_a = scheme.to_forward(tp_a, params)
    anchor_a = float(flow_matching_loss_conditioned_fixed(
        dp_a, CFG, cond, val, text, mask, noises, fixed_sigmas=sigmas,
        adapters=ad_a))

    # chunked path: 2 chunks of 3
    chunk = make_train_chunk(scheme, CFG, tx, anchor_sigmas=sigmas)
    tp_b = scheme.init(jax.random.PRNGKey(3), base_params=params)
    os_b = tx.init(tp_b)
    cond_stack = jnp.stack([cond, cond2])
    train_stack = jnp.stack([train, train2])
    emb_stack = jnp.stack([text, text])
    mask_stack = jnp.stack([mask, mask])
    losses_b = []
    anchor_b = None
    for lo in (0, 3):
        tp_b, os_b, lvec, anchor = chunk(
            tp_b, os_b, params, cond_stack, train_stack, emb_stack,
            mask_stack, jnp.asarray(sel[lo:lo + 3], jnp.int32),
            jnp.stack(rngs[lo:lo + 3]),
            val_latents=val if lo == 3 else None,
            fixed_noises=noises if lo == 3 else None)
        losses_b.extend(float(x) for x in lvec)
        if anchor is not None:
            anchor_b = float(anchor)

    np.testing.assert_allclose(losses_a, losses_b, rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(tp_a), jax.tree.leaves(tp_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(anchor_a, anchor_b, rtol=2e-5, atol=1e-6)


def test_early_stopper_step_with_loss_matches_step(setup):
    """step_with_loss must make the same decisions as step when fed the
    loss that step would have computed."""
    from longcat_video_tta_tpu.config import EarlyStoppingConfig

    escfg = EarlyStoppingConfig(enabled=True, check_every=1, patience=2,
                                strategy="patience")
    params, latents, text, mask = setup
    scheme = build_scheme(CFG, AdapterConfig(method="delta_a"))
    stopper = build_early_stopper(escfg, scheme, CFG)
    cond, _, val = split_tta_latents(latents, 2, 0.25)
    tp = scheme.init(jax.random.PRNGKey(3), base_params=params)
    stopper.setup(params, cond, val, text, mask, "vid.mp4", tp)
    seq = [1.0, 0.5, 0.6, 0.7]  # improve, then 2 rises -> stop at 4th
    outcomes = [stopper.step_with_loss(i + 1, tp, v)[0]
                for i, v in enumerate(seq)]
    assert outcomes == [False, False, False, True]
    assert stopper.best_step == 2 and stopper.best_loss == 0.5
    assert [h[1] for h in stopper.loss_history[1:]] == seq

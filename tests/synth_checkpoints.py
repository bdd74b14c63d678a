"""Synthetic torch-layout state_dicts in the documented upstream
layouts (LongCat DiT / WAN VAE / HF UMT5) for converter tests."""

import numpy as np


def make_dit_sd(cfg, seed=0):
    rng = np.random.RandomState(seed)
    D, Ct, F, dh, L = (cfg.hidden_size, cfg.adaln_tembed_dim, cfg.ffn_dim,
                       cfg.head_dim, cfg.depth)
    pdim = (cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2]
            * cfg.in_channels)
    out_dim = (cfg.patch_size[0] * cfg.patch_size[1] * cfg.patch_size[2]
               * cfg.out_channels)

    def lin(o, i):
        return rng.randn(o, i).astype(np.float32) * 0.02

    sd = {
        "x_embedder.proj.weight": lin(D, pdim),
        "x_embedder.proj.bias": np.zeros(D, np.float32),
        "t_embedder.mlp.0.weight": lin(Ct, cfg.t_embed_freq_dim),
        "t_embedder.mlp.0.bias": np.zeros(Ct, np.float32),
        "t_embedder.mlp.2.weight": lin(Ct, Ct),
        "t_embedder.mlp.2.bias": np.zeros(Ct, np.float32),
        "y_embedder.y_proj.0.weight": lin(D, cfg.text_dim),
        "y_embedder.y_proj.0.bias": np.zeros(D, np.float32),
        "y_embedder.y_proj.2.weight": lin(D, D),
        "y_embedder.y_proj.2.bias": np.zeros(D, np.float32),
        "final_layer.adaLN_modulation.1.weight": lin(2 * D, Ct),
        "final_layer.adaLN_modulation.1.bias": np.zeros(2 * D, np.float32),
        "final_layer.linear.weight": lin(out_dim, D),
        "final_layer.linear.bias": np.zeros(out_dim, np.float32),
    }
    for i in range(L):
        sd.update({
            f"blocks.{i}.adaLN_modulation.1.weight": lin(6 * D, Ct),
            f"blocks.{i}.adaLN_modulation.1.bias": np.zeros(6 * D,
                                                            np.float32),
            f"blocks.{i}.attn.qkv.weight": lin(3 * D, D),
            f"blocks.{i}.attn.qkv.bias": np.zeros(3 * D, np.float32),
            f"blocks.{i}.attn.proj.weight": lin(D, D),
            f"blocks.{i}.attn.proj.bias": np.zeros(D, np.float32),
            f"blocks.{i}.attn.q_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.attn.k_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.cross_attn.q_linear.weight": lin(D, D),
            f"blocks.{i}.cross_attn.q_linear.bias": np.zeros(D, np.float32),
            f"blocks.{i}.cross_attn.kv_linear.weight": lin(2 * D, D),
            f"blocks.{i}.cross_attn.kv_linear.bias": np.zeros(2 * D,
                                                              np.float32),
            f"blocks.{i}.cross_attn.proj.weight": lin(D, D),
            f"blocks.{i}.cross_attn.proj.bias": np.zeros(D, np.float32),
            f"blocks.{i}.cross_attn.q_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.cross_attn.k_norm.weight": np.ones(dh, np.float32),
            f"blocks.{i}.pre_crs_attn_norm.weight": np.ones(D, np.float32),
            f"blocks.{i}.pre_crs_attn_norm.bias": np.zeros(D, np.float32),
            f"blocks.{i}.ffn.w1.weight": lin(F, D),
            f"blocks.{i}.ffn.w3.weight": lin(F, D),
            f"blocks.{i}.ffn.w2.weight": lin(D, F),
        })
    return sd


def make_vae_sd(cfg, seed=0):
    """Wan2.1-style naming (see convert_torch_vae_state docstring)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv3(name, cin, cout, kt, kh, kw):
        sd[name + ".weight"] = rng.randn(cout, cin, kt, kh, kw).astype(
            np.float32) * 0.2
        sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1

    def conv2(name, cin, cout, kh=3, kw=3):
        sd[name + ".weight"] = rng.randn(cout, cin, kh, kw).astype(
            np.float32) * 0.2
        sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1

    def norm(name, c):
        sd[name + ".gamma"] = rng.rand(c, 1, 1, 1).astype(np.float32) + 0.5

    def res(prefix, cin, cout):
        norm(prefix + ".residual.0", cin)
        conv3(prefix + ".residual.2", cin, cout, 3, 3, 3)
        norm(prefix + ".residual.3", cout)
        conv3(prefix + ".residual.6", cout, cout, 3, 3, 3)
        if cin != cout:
            conv3(prefix + ".shortcut", cin, cout, 1, 1, 1)

    def attn(prefix, c):
        norm(prefix + ".norm", c)
        conv2(prefix + ".to_qkv", c, 3 * c, 1, 1)
        conv2(prefix + ".proj", c, c, 1, 1)

    from longcat_video_tta_tpu.models.vae import decoder_channel_plan

    dims = [cfg.base_dim * m for m in cfg.dim_mults]
    n = len(dims)

    conv3("encoder.conv1", 3, dims[0], 3, 3, 3)
    k = 0
    for i in range(n):
        cin = dims[i - 1] if i > 0 else dims[0]
        for j in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{k}", cin if j == 0 else dims[i],
                dims[i])
            k += 1
        if i < n - 1:
            conv2(f"encoder.downsamples.{k}.resample.1", dims[i], dims[i])
            if cfg.temporal_downsample[i]:
                conv3(f"encoder.downsamples.{k}.time_conv", dims[i],
                      dims[i], 3, 1, 1)
            k += 1
    res("encoder.middle.0", dims[-1], dims[-1])
    attn("encoder.middle.1", dims[-1])
    res("encoder.middle.2", dims[-1], dims[-1])
    norm("encoder.head.0", dims[-1])
    conv3("encoder.head.2", dims[-1], 2 * cfg.z_dim, 3, 3, 3)
    conv3("conv1", 2 * cfg.z_dim, 2 * cfg.z_dim, 1, 1, 1)  # quant

    conv3("conv2", cfg.z_dim, cfg.z_dim, 1, 1, 1)  # post-quant
    conv3("decoder.conv1", cfg.z_dim, dims[-1], 3, 3, 3)
    res("decoder.middle.0", dims[-1], dims[-1])
    attn("decoder.middle.1", dims[-1])
    res("decoder.middle.2", dims[-1], dims[-1])
    k = 0
    for cin, cout, has_rs, has_t in decoder_channel_plan(cfg):
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{k}", cin if j == 0 else cout, cout)
            k += 1
        if has_rs:
            # Wan decoder Resample: spatial conv halves channels
            conv2(f"decoder.upsamples.{k}.resample.1", cout, cout // 2)
            if has_t:
                conv3(f"decoder.upsamples.{k}.time_conv", cout, 2 * cout,
                      3, 1, 1)
            k += 1
    norm("decoder.head.0", dims[0])
    conv3("decoder.head.2", dims[0], 3, 3, 3, 3)
    return sd


def make_umt5_sd(cfg, seed=0):
    """HF UMT5EncoderModel naming."""
    rng = np.random.RandomState(seed)
    d, inner, dff = cfg.d_model, cfg.num_heads * cfg.d_kv, cfg.d_ff

    def lin(o, i):
        return rng.randn(o, i).astype(np.float32) * 0.05

    sd = {"shared.weight": lin(cfg.vocab_size, d),
          "encoder.final_layer_norm.weight": np.ones(d, np.float32)}
    for i in range(cfg.num_layers):
        a = f"encoder.block.{i}.layer.0.SelfAttention."
        sd.update({
            a + "q.weight": lin(inner, d),
            a + "k.weight": lin(inner, d),
            a + "v.weight": lin(inner, d),
            a + "o.weight": lin(d, inner),
            a + "relative_attention_bias.weight": lin(
                cfg.relative_attention_num_buckets, cfg.num_heads),
            f"encoder.block.{i}.layer.0.layer_norm.weight":
                np.ones(d, np.float32),
            f"encoder.block.{i}.layer.1.DenseReluDense.wi_0.weight":
                lin(dff, d),
            f"encoder.block.{i}.layer.1.DenseReluDense.wi_1.weight":
                lin(dff, d),
            f"encoder.block.{i}.layer.1.DenseReluDense.wo.weight":
                lin(d, dff),
            f"encoder.block.{i}.layer.1.layer_norm.weight":
                np.ones(d, np.float32),
        })
    return sd

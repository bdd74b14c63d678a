"""Independent torch implementations of the documented upstream model
conventions, used as conversion oracles.

These modules are written in the torch idiom (nn.Module / nn.Linear /
explicit per-block loops) with state_dict key names matching the
upstream layouts the converters in models/convert.py expect
(SURVEY.md §2.8). The tests random-init them, run the torch forward,
convert the state_dict, run our JAX forward, and require numerical
equality — validating the one link in the real-weight parity chain that
is testable without the real checkpoint: the converter layout (fused
orders, transposes, stacking) AND every forward convention both sides
must agree on (RoPE, adaLN chunk order, eps, fp32 islands, ...).

This is NOT a translation of our JAX code: where a convention is
ambiguous, it is pinned to the dominant public convention and marked as
a CHOICE in convert_torch_dit_state's docstring. See
tests/test_oracle_dit.py / tests/test_oracle_vae.py.

Reference usage contract: /root/reference/delta_experiment/scripts/
run_delta_a.py:134-217 (embed pipeline, fp32 t_embedder,
text_tokens_zero_pad), run_norm_tune_tta.py:74-98 (norm inventory),
run_lora_tta.py:142-168 (fused qkv(3)/kv(2), ffn w1/w2/w3).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# LongCat-style video DiT
# ---------------------------------------------------------------------------


def timestep_embedding(t: torch.Tensor, dim: int,
                       max_period: float = 10000.0) -> torch.Tensor:
    """Standard DiT sinusoid: cat([cos, sin]) over dim/2 frequencies."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32) / half)
    args = t.float().reshape(-1, 1) * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedder(nn.Module):
    def __init__(self, freq_dim: int, hidden: int):
        super().__init__()
        self.freq_dim = freq_dim
        self.mlp = nn.Sequential(
            nn.Linear(freq_dim, hidden), nn.SiLU(), nn.Linear(hidden, hidden))

    def forward(self, t):  # fp32 end-to-end (run_delta_a.py:161-165)
        return self.mlp(timestep_embedding(t, self.freq_dim))


class XEmbedder(nn.Module):
    """Patch embed as Conv3d with kernel == stride == patch (the standard
    video-DiT layout; the converter also accepts a Linear)."""

    def __init__(self, in_ch: int, hidden: int, patch):
        super().__init__()
        self.proj = nn.Conv3d(in_ch, hidden, patch, stride=patch)

    def forward(self, x):  # [B, C, T, H, W] -> [B, N, D]
        x = self.proj(x)  # [B, D, nt, nh, nw]
        B, D = x.shape[:2]
        return x.flatten(2).transpose(1, 2).contiguous()  # [B, nt*nh*nw, D]


class YEmbedder(nn.Module):
    def __init__(self, text_dim: int, hidden: int):
        super().__init__()
        self.y_proj = nn.Sequential(
            nn.Linear(text_dim, hidden), nn.GELU(approximate="tanh"),
            nn.Linear(hidden, hidden))

    def forward(self, y):
        return self.y_proj(y)


class HeadRMSNorm(nn.Module):
    """Per-head RMSNorm over head_dim with a learned [head_dim] scale."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        dt = x.dtype
        x = x.float()
        x = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)
        return (x * self.weight.float()).to(dt)


def rope_angles_3d(nt, nh, nw, rope_dims, theta=10000.0, t_offset=0):
    """Factored (t,h,w) rotary angle table [nt*nh*nw, head_dim//2]."""
    def axis(n, d, off=0):
        freqs = 1.0 / (theta ** (
            torch.arange(0, d, 2, dtype=torch.float32) / d))
        pos = torch.arange(n, dtype=torch.float32) + off
        return pos[:, None] * freqs[None]

    dt_, dh_, dw_ = rope_dims
    at = axis(nt, dt_, t_offset)[:, None, None, :].expand(nt, nh, nw, -1)
    ah = axis(nh, dh_)[None, :, None, :].expand(nt, nh, nw, -1)
    aw = axis(nw, dw_)[None, None, :, :].expand(nt, nh, nw, -1)
    return torch.cat([at, ah, aw], dim=-1).reshape(nt * nh * nw, -1)


def apply_rope_torch(x, ang, interleaved: bool):
    """x: [B, S, H, dh]; ang: [S, dh//2]."""
    cos = torch.cos(ang)[None, :, None, :]
    sin = torch.sin(ang)[None, :, None, :]
    if interleaved:
        # complex-mul style: pairs (x[2i], x[2i+1]) rotated together
        xr = x.reshape(*x.shape[:-1], -1, 2)
        xa, xb = xr[..., 0], xr[..., 1]
        out = torch.stack([xa * cos - xb * sin, xb * cos + xa * sin], -1)
        return out.reshape(x.shape)
    half = x.shape[-1] // 2
    xa, xb = x[..., :half], x[..., half:]
    return torch.cat([xa * cos - xb * sin, xb * cos + xa * sin], dim=-1)


def _prefix_attn(q, k, v, num_cond: int):
    """[B, S, H, dh] prefix-block-causal attention: cond queries attend
    only within the cond prefix; noise queries attend everywhere."""
    B, S, H, dh = q.shape
    q = q.transpose(1, 2)
    k = k.transpose(1, 2)
    v = v.transpose(1, 2)
    mask = None
    if num_cond > 0:
        qi = torch.arange(S)[:, None]
        kj = torch.arange(S)[None, :]
        mask = (qi >= num_cond) | (kj < num_cond)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
    return o.transpose(1, 2).reshape(B, S, H * dh)


class SelfAttention(nn.Module):
    def __init__(self, hidden, num_heads, rope_dims, rope_theta,
                 rope_interleaved):
        super().__init__()
        self.nH = num_heads
        self.dh = hidden // num_heads
        self.qkv = nn.Linear(hidden, 3 * hidden)
        self.proj = nn.Linear(hidden, hidden)
        self.q_norm = HeadRMSNorm(self.dh)
        self.k_norm = HeadRMSNorm(self.dh)
        self.rope_dims = rope_dims
        self.rope_theta = rope_theta
        self.rope_interleaved = rope_interleaved

    def forward(self, x, grid, num_cond_tokens):
        B, S, D = x.shape
        nt, nh, nw = grid
        qkv = self.qkv(x).reshape(B, S, 3, self.nH, self.dh)
        q, k, v = qkv.unbind(2)
        q, k = self.q_norm(q), self.k_norm(k)
        ang = rope_angles_3d(nt, nh, nw, self.rope_dims, self.rope_theta)
        q = apply_rope_torch(q, ang, self.rope_interleaved)
        k = apply_rope_torch(k, ang, self.rope_interleaved)
        return self.proj(_prefix_attn(q, k, v, num_cond_tokens))


class CrossAttention(nn.Module):
    def __init__(self, hidden, num_heads):
        super().__init__()
        self.nH = num_heads
        self.dh = hidden // num_heads
        self.q_linear = nn.Linear(hidden, hidden)
        self.kv_linear = nn.Linear(hidden, 2 * hidden)
        self.proj = nn.Linear(hidden, hidden)
        self.q_norm = HeadRMSNorm(self.dh)
        self.k_norm = HeadRMSNorm(self.dh)

    def forward(self, x, y):
        B, S, D = x.shape
        L = y.shape[1]
        q = self.q_linear(x).reshape(B, S, self.nH, self.dh)
        kv = self.kv_linear(y).reshape(B, L, 2, self.nH, self.dh)
        k, v = kv.unbind(2)
        q, k = self.q_norm(q), self.k_norm(k)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return self.proj(o.transpose(1, 2).reshape(B, S, D))


class SwiGLU(nn.Module):
    def __init__(self, hidden, ffn_dim):
        super().__init__()
        self.w1 = nn.Linear(hidden, ffn_dim, bias=False)
        self.w3 = nn.Linear(hidden, ffn_dim, bias=False)
        self.w2 = nn.Linear(ffn_dim, hidden, bias=False)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


def _modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


class DiTBlock(nn.Module):
    def __init__(self, hidden, num_heads, ffn_dim, adaln_dim, rope_dims,
                 rope_theta, rope_interleaved):
        super().__init__()
        self.attn = SelfAttention(hidden, num_heads, rope_dims, rope_theta,
                                  rope_interleaved)
        self.cross_attn = CrossAttention(hidden, num_heads)
        self.pre_crs_attn_norm = nn.LayerNorm(hidden, eps=1e-6)
        self.ffn = SwiGLU(hidden, ffn_dim)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(adaln_dim, 6 * hidden))
        self.norm = nn.LayerNorm(hidden, eps=1e-6, elementwise_affine=False)

    def forward(self, x, y, t, grid, num_cond_latents):
        B, S, D = x.shape
        nt, nh, nw = grid
        spatial = nh * nw
        # t: [B, nt, Ct]; per-latent-frame modulation broadcast over space
        mod = self.adaLN_modulation(t)  # [B, nt, 6D]
        mod = mod[:, :, None, :].expand(B, nt, spatial, 6 * D)
        mod = mod.reshape(B, S, 6 * D)
        sm, cm, gm, sp, cp, gp = mod.chunk(6, dim=-1)

        num_cond_tokens = num_cond_latents * spatial
        h = _modulate(self.norm(x), sm, cm)
        x = x + gm * self.attn(h, grid, num_cond_tokens)
        x = x + self.cross_attn(self.pre_crs_attn_norm(x), y)
        h = _modulate(self.norm(x), sp, cp)
        x = x + gp * self.ffn(h)
        return x


class FinalLayer(nn.Module):
    def __init__(self, hidden, adaln_dim, out_dim):
        super().__init__()
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(adaln_dim, 2 * hidden))
        self.linear = nn.Linear(hidden, out_dim)
        self.norm = nn.LayerNorm(hidden, eps=1e-6, elementwise_affine=False)

    def forward(self, x, t, grid):
        B, S, D = x.shape
        nt, nh, nw = grid
        mod = self.adaLN_modulation(t)  # [B, nt, 2D]
        mod = mod[:, :, None, :].expand(B, nt, nh * nw, 2 * D)
        mod = mod.reshape(B, S, 2 * D)
        shift, scale = mod.chunk(2, dim=-1)
        return self.linear(_modulate(self.norm(x), shift, scale))


class LongCatDiTOracle(nn.Module):
    """Torch implementation of the documented LongCat DiT conventions,
    with state_dict keys matching convert_torch_dit_state. Mirrors the
    reference wrapper pipeline (run_delta_a.py:134-217): x_embedder ->
    fp32 t_embedder (per latent frame) -> y_embedder + zero-pad text
    masking -> blocks -> final_layer -> unpatchify."""

    def __init__(self, cfg, rope_interleaved: bool = False):
        super().__init__()
        self.cfg = cfg
        self.patch_size = cfg.patch_size
        self.text_tokens_zero_pad = cfg.text_tokens_zero_pad
        D, Ct = cfg.hidden_size, cfg.adaln_tembed_dim
        self.x_embedder = XEmbedder(cfg.in_channels, D, cfg.patch_size)
        self.t_embedder = TimestepEmbedder(cfg.t_embed_freq_dim, Ct)
        self.y_embedder = YEmbedder(cfg.text_dim, D)
        self.blocks = nn.ModuleList([
            DiTBlock(D, cfg.num_heads, cfg.ffn_dim, Ct, cfg.rope_dims,
                     cfg.rope_theta, rope_interleaved)
            for _ in range(cfg.depth)
        ])
        pt, ph, pw = cfg.patch_size
        self.final_layer = FinalLayer(D, Ct,
                                      pt * ph * pw * cfg.out_channels)

    def unpatchify(self, x, nt, nh, nw):
        pt, ph, pw = self.patch_size
        C = self.cfg.out_channels
        B = x.shape[0]
        x = x.reshape(B, nt, nh, nw, pt, ph, pw, C)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(B, C, nt * pt, nh * ph, nw * pw)

    def forward(self, hidden_states, timestep, encoder_hidden_states,
                encoder_attention_mask=None, num_cond_latents=0):
        B, _, T, H, W = hidden_states.shape
        pt, ph, pw = self.patch_size
        nt, nh, nw = T // pt, H // ph, W // pw

        if timestep.dim() == 1:
            timestep = timestep[:, None].expand(-1, nt)

        x = self.x_embedder(hidden_states)
        t = self.t_embedder(timestep.float().flatten()).reshape(B, nt, -1)

        y = self.y_embedder(encoder_hidden_states)
        if self.text_tokens_zero_pad and encoder_attention_mask is not None:
            y = y * encoder_attention_mask[:, :, None].to(y.dtype)

        for block in self.blocks:
            x = block(x, y, t, (nt, nh, nw), num_cond_latents // pt)

        x = self.final_layer(x, t, (nt, nh, nw))
        return self.unpatchify(x, nt, nh, nw).float()


# ---------------------------------------------------------------------------
# Wan2.1 causal video VAE
# ---------------------------------------------------------------------------
#
# Independent torch implementation of the public Wan2.1 VAE architecture
# (the model LongCat vendors as ``AutoencoderKLWan``; reference usage
# common.py:158-221), INCLUDING the per-conv feat-cache chunked
# encode/decode protocol ([1, 4, 4, ...] pixel-frame chunks on encode,
# one latent frame per chunk on decode). That cache protocol IS the
# ground-truth temporal semantics that models/vae.py re-derives as
# monolithic whole-clip convolutions; tests/test_oracle_vae.py asserts
# the two agree numerically through convert_torch_vae_state.

WAN_CACHE_T = 2


class WanCausalConv3d(nn.Conv3d):
    """Conv3d whose temporal padding is causal — doubled left-only zero
    pad — and may be partially pre-filled by a carried input tail."""

    def __init__(self, cin, cout, kernel, stride=1, padding=0):
        super().__init__(cin, cout, kernel, stride=stride, padding=0)
        if isinstance(padding, int):
            padding = (padding, padding, padding)
        self._pads = padding

    def forward(self, x, cache=None):
        pt, ph, pw = self._pads
        left = 2 * pt
        if cache is not None:
            x = torch.cat([cache.to(x.dtype), x], dim=2)
            left -= cache.shape[2]
        x = F.pad(x, (pw, pw, ph, ph, max(left, 0), 0))
        return super().forward(x)


class WanRMSNorm(nn.Module):
    """Channelwise L2 normalize * sqrt(C) * gamma (bias-free). gamma
    keeps the broadcast shape of the upstream checkpoint: (C, 1, 1) when
    applied per-frame (``images=True``), (C, 1, 1, 1) on video."""

    def __init__(self, dim, images=True):
        super().__init__()
        tail = (1, 1) if images else (1, 1, 1)
        self.gamma = nn.Parameter(torch.ones(dim, *tail))
        self._scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self._scale * self.gamma


def _wan_cached_conv(conv, x, fc, fi):
    """One cached causal-conv application: carry the last WAN_CACHE_T
    input frames between chunks; a 1-frame chunk's carry is left-extended
    with the previous carry's last frame (zeros right after 'Rep')."""
    idx = fi[0]
    prev = fc.get(idx)
    tail = x[:, :, -WAN_CACHE_T:].clone()
    if tail.shape[2] < WAN_CACHE_T and prev is not None:
        pad = (torch.zeros_like(tail[:, :, :1]) if isinstance(prev, str)
               else prev[:, :, -1:])
        tail = torch.cat([pad, tail], dim=2)
    y = conv(x, None if (prev is None or isinstance(prev, str)) else prev)
    fc[idx] = tail
    fi[0] += 1
    return y


class WanResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.residual = nn.Sequential(
            WanRMSNorm(cin, images=False), nn.SiLU(),
            WanCausalConv3d(cin, cout, 3, padding=1),
            WanRMSNorm(cout, images=False), nn.SiLU(), nn.Dropout(0.0),
            WanCausalConv3d(cout, cout, 3, padding=1),
        )
        self.shortcut = (WanCausalConv3d(cin, cout, 1)
                         if cin != cout else nn.Identity())

    def forward(self, x, fc=None, fi=None):
        h = self.shortcut(x)
        for layer in self.residual:
            if isinstance(layer, WanCausalConv3d) and fc is not None:
                x = _wan_cached_conv(layer, x, fc, fi)
            else:
                x = layer(x)
        return x + h


class WanAttention(nn.Module):
    """Per-frame spatial self-attention with a fused to_qkv 1x1 conv."""

    def __init__(self, dim):
        super().__init__()
        self.norm = WanRMSNorm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        b, c, t, h, w = x.shape
        flat = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        y = self.norm(flat)
        qkv = self.to_qkv(y).reshape(b * t, 3, c, h * w)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [BT, C, HW]
        attn = torch.softmax(
            q.transpose(1, 2) @ k * (c ** -0.5), dim=-1)  # [BT, HW, HW]
        o = (attn @ v.transpose(1, 2)).transpose(1, 2).reshape(b * t, c, h, w)
        o = self.proj(o)
        return x + o.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


class WanResample(nn.Module):
    """Spatial 2x resample (decoder convs HALVE channels), optionally
    fused with the temporal resample time_conv and its cache protocol:

    - upsample3d: time first. Chunk 0 only sets the 'Rep' marker (frame
      1 is temporally identity); later chunks run the C->2C time_conv
      causally over the carried tail, each output splitting into two
      interleaved frames.
    - downsample3d: space first. Chunk 0 caches its (single) frame
      untouched; later chunks run the UNPADDED stride-2 time_conv over
      [carry | chunk] — windows (f1,f2,f3), (f3,f4,f5), ...
    """

    def __init__(self, dim, mode):
        super().__init__()
        self.mode = mode
        if mode.startswith("upsample"):
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1),
            )
            if mode == "upsample3d":
                self.time_conv = WanCausalConv3d(
                    dim, dim * 2, (3, 1, 1), padding=(1, 0, 0))
        else:
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)),
                nn.Conv2d(dim, dim, 3, stride=(2, 2)),
            )
            if mode == "downsample3d":
                self.time_conv = WanCausalConv3d(
                    dim, dim, (3, 1, 1), stride=(2, 1, 1))

    def forward(self, x, fc=None, fi=None):
        b, c = x.shape[:2]
        if self.mode == "upsample3d" and fc is not None:
            idx = fi[0]
            prev = fc.get(idx)
            if prev is None:
                fc[idx] = "Rep"
                fi[0] += 1
            else:
                t = x.shape[2]
                tail = x[:, :, -WAN_CACHE_T:].clone()
                if tail.shape[2] < WAN_CACHE_T:
                    pad = (torch.zeros_like(tail[:, :, :1])
                           if isinstance(prev, str) else prev[:, :, -1:])
                    tail = torch.cat([pad, tail], dim=2)
                y = self.time_conv(
                    x, None if isinstance(prev, str) else prev)
                fc[idx] = tail
                fi[0] += 1
                y = y.reshape(b, 2, c, t, *x.shape[3:])
                x = torch.stack((y[:, 0], y[:, 1]), dim=3)
                x = x.reshape(b, c, 2 * t, *x.shape[4:])
        t = x.shape[2]
        flat = x.permute(0, 2, 1, 3, 4).reshape(b * t, *x.shape[1:2],
                                                *x.shape[3:])
        flat = self.resample(flat)
        x = flat.reshape(b, t, *flat.shape[1:]).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and fc is not None:
            idx = fi[0]
            prev = fc.get(idx)
            if prev is None:
                fc[idx] = x.clone()
                fi[0] += 1
            else:
                tail = x[:, :, -1:].clone()
                x = self.time_conv(torch.cat([prev[:, :, -1:], x], dim=2))
                fc[idx] = tail
                fi[0] += 1
        return x


class WanEncoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * m for m in cfg.dim_mults]
        self.conv1 = WanCausalConv3d(3, dims[0], 3, padding=1)
        downs = []
        for i in range(len(dims)):
            cin = dims[i - 1] if i > 0 else dims[0]
            for j in range(cfg.num_res_blocks):
                downs.append(WanResBlock(cin if j == 0 else dims[i], dims[i]))
            if i < len(dims) - 1:
                mode = ("downsample3d" if cfg.temporal_downsample[i]
                        else "downsample2d")
                downs.append(WanResample(dims[i], mode))
        self.downsamples = nn.ModuleList(downs)
        self.middle = nn.ModuleList([
            WanResBlock(dims[-1], dims[-1]),
            WanAttention(dims[-1]),
            WanResBlock(dims[-1], dims[-1]),
        ])
        self.head = nn.Sequential(
            WanRMSNorm(dims[-1], images=False), nn.SiLU(),
            WanCausalConv3d(dims[-1], 2 * cfg.z_dim, 3, padding=1),
        )

    def forward(self, x, fc, fi):
        x = _wan_cached_conv(self.conv1, x, fc, fi)
        for layer in self.downsamples:
            x = layer(x, fc, fi)
        for layer in self.middle:
            x = layer(x, fc, fi) if isinstance(layer, WanResBlock) else layer(x)
        for layer in self.head:
            if isinstance(layer, WanCausalConv3d):
                x = _wan_cached_conv(layer, x, fc, fi)
            else:
                x = layer(x)
        return x


class WanDecoder3d(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dims = [cfg.base_dim * m for m in cfg.dim_mults]
        dims_dec = [dims[-1]] + dims[::-1]
        ups_flag = tuple(cfg.temporal_downsample)[::-1]
        n = len(dims)
        self.conv1 = WanCausalConv3d(cfg.z_dim, dims_dec[0], 3, padding=1)
        self.middle = nn.ModuleList([
            WanResBlock(dims_dec[0], dims_dec[0]),
            WanAttention(dims_dec[0]),
            WanResBlock(dims_dec[0], dims_dec[0]),
        ])
        ups = []
        for i in range(n):
            # every Resample's spatial conv halved the channels, so each
            # scale after the first starts at half the recorded width
            cin = dims_dec[i] if i == 0 else dims_dec[i] // 2
            cout = dims_dec[i + 1]
            for j in range(cfg.num_res_blocks + 1):
                ups.append(WanResBlock(cin if j == 0 else cout, cout))
            if i < n - 1:
                mode = "upsample3d" if ups_flag[i] else "upsample2d"
                ups.append(WanResample(cout, mode))
        self.upsamples = nn.ModuleList(ups)
        self.head = nn.Sequential(
            WanRMSNorm(dims[0], images=False), nn.SiLU(),
            WanCausalConv3d(dims[0], 3, 3, padding=1),
        )

    def forward(self, x, fc, fi):
        x = _wan_cached_conv(self.conv1, x, fc, fi)
        for layer in self.middle:
            x = layer(x, fc, fi) if isinstance(layer, WanResBlock) else layer(x)
        for layer in self.upsamples:
            x = layer(x, fc, fi)
        for layer in self.head:
            if isinstance(layer, WanCausalConv3d):
                x = _wan_cached_conv(layer, x, fc, fi)
            else:
                x = layer(x)
        return x


class WanVAEOracle(nn.Module):
    """Full Wan2.1 VAE with the upstream chunked cache protocol.

    ``encode`` chunks pixels as [1, 4, 4, ...] frames and returns the
    (mu, logvar) moments after the model-level quant conv (``conv1``);
    ``decode`` applies the post-quant conv (``conv2``) then runs the
    decoder one latent frame at a time. State-dict names match the
    upstream checkpoint layout consumed by convert_torch_vae_state.
    """

    def __init__(self, cfg):
        super().__init__()
        assert cfg.temporal_factor == 4, "Wan chunk protocol is 4x temporal"
        self.cfg = cfg
        self.encoder = WanEncoder3d(cfg)
        self.conv1 = WanCausalConv3d(2 * cfg.z_dim, 2 * cfg.z_dim, 1)
        self.conv2 = WanCausalConv3d(cfg.z_dim, cfg.z_dim, 1)
        self.decoder = WanDecoder3d(cfg)

    def encode(self, x):
        fc = {}
        t = x.shape[2]
        outs = []
        for i in range(1 + (t - 1) // 4):
            fi = [0]
            chunk = (x[:, :, :1] if i == 0
                     else x[:, :, 1 + 4 * (i - 1):1 + 4 * i])
            outs.append(self.encoder(chunk, fc, fi))
        moments = self.conv1(torch.cat(outs, dim=2))
        mu, logvar = moments.chunk(2, dim=1)
        return mu, logvar

    def decode(self, z):
        fc = {}
        x = self.conv2(z)
        outs = []
        for i in range(z.shape[2]):
            fi = [0]
            outs.append(self.decoder(x[:, :, i:i + 1], fc, fi))
        return torch.cat(outs, dim=2)

"""Minimal torch reimplementation of the diffusers 0.31 SVD blocks.

Used ONLY by tests to break the circularity of the UNet/VAE conversion tests
(round-1 verdict item: the converter tests previously generated "torch"
state dicts from our own tree). These modules re-state, in plain torch, the
published semantics of diffusers' `SpatioTemporalResBlock` and
`TransformerSpatioTemporalModel` as consumed by the reference UNet
(/root/reference/evoworld/trainer/unet_plucker.py:13); parameter names
reproduce the diffusers state-dict naming so the real converters apply.

diffusers itself is not installed in this image — semantics were
reconstructed from the published library (v0.31 transformer_temporal.py /
resnet.py); if a detail here drifts from our Flax blocks the parity test
fails, which is the point.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class AlphaBlender(nn.Module):
    """merge_strategy='learned_with_images'."""

    def __init__(self, alpha: float = 0.5):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([alpha]))

    def get_alpha(self, image_only_indicator, ndims):
        alpha = torch.where(
            image_only_indicator.bool(),
            torch.ones(1, 1, device=image_only_indicator.device),
            torch.sigmoid(self.mix_factor)[..., None],
        )
        if ndims == 5:      # (B, C, F, H, W)
            return alpha[:, None, :, None, None]
        if ndims == 3:      # (B*S, F, C) blended at (B, F, S, C)? -> resblock only
            return alpha.reshape(-1)[:, None, None]
        raise ValueError(ndims)

    def forward(self, x_spatial, x_temporal, image_only_indicator):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return res + h


class TemporalResnetBlock(nn.Module):
    """(B, C, F, H, W); conv kernel (3, 1, 1)."""

    def __init__(self, ch, temb_ch, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, ch, eps=eps)
        self.conv1 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb_ch, ch)
        self.norm2 = nn.GroupNorm(32, ch, eps=eps)
        self.conv2 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        # temb: (B, F, C_t) -> (B, C, F) broadcast over H, W.
        t = self.time_emb_proj(F.silu(temb))
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """diffusers resnet.py::SpatioTemporalResBlock (eps per SVD config)."""

    def __init__(self, in_ch, out_ch, temb_ch, eps=1e-6, temporal_eps=1e-6):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(in_ch, out_ch, temb_ch, eps)
        self.temporal_res_block = TemporalResnetBlock(out_ch, temb_ch, temporal_eps)
        self.time_mixer = AlphaBlender()

    def forward(self, x, temb, image_only_indicator):
        # x: (B*F, C, H, W); temb: (B*F, C_t); indicator: (B, F).
        num_frames = image_only_indicator.shape[-1]
        h = self.spatial_res_block(x, temb)
        bf, ch, height, width = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, ch, height, width).permute(0, 2, 1, 3, 4)
        temb5 = temb.reshape(b, num_frames, -1)
        ht = self.temporal_res_block(h5, temb5)
        mixed = self.time_mixer(
            x_spatial=h5, x_temporal=ht, image_only_indicator=image_only_indicator
        )
        return mixed.permute(0, 2, 1, 3, 4).reshape(bf, ch, height, width)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class Attention(nn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim=None):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim or dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim or dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, sq, inner = q.shape
        hd = inner // self.heads
        q = q.view(b, sq, self.heads, hd).transpose(1, 2)
        k = k.view(b, -1, self.heads, hd).transpose(1, 2)
        v = v.view(b, -1, self.heads, hd).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, sq, inner)
        return self.to_out[0](out)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, head_dim, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TemporalBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, cross_dim):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, head_dim, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, num_frames, context):
        # x: (B*F, S, C) -> (B*S, F, C)
        bf, s, c = x.shape
        b = bf // num_frames
        x = x.view(b, num_frames, s, c).permute(0, 2, 1, 3).reshape(b * s, num_frames, c)
        x = x + self.ff_in(self.norm_in(x))
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        x = x.view(b, s, num_frames, c).permute(0, 2, 1, 3).reshape(bf, s, c)
        return x


class Timesteps(nn.Module):
    """flip_sin_to_cos=True, downscale_freq_shift=0."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        import math

        half = self.dim // 2
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        freqs = torch.exp(exponent / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, hidden, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TransformerSpatioTemporalModel(nn.Module):
    """diffusers transformer_temporal.py::TransformerSpatioTemporalModel."""

    def __init__(self, heads, head_dim, in_ch, cross_dim, num_layers=1):
        super().__init__()
        inner = heads * head_dim
        self.inner = inner
        self.norm = nn.GroupNorm(32, in_ch, eps=1e-6)
        self.proj_in = nn.Linear(in_ch, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, head_dim, cross_dim) for _ in range(num_layers)]
        )
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(inner, heads, head_dim, cross_dim) for _ in range(num_layers)]
        )
        self.time_proj = Timesteps(inner)
        self.time_pos_embed = TimestepEmbedding(inner, inner * 4, inner)
        self.time_mixer = AlphaBlender()
        self.proj_out = nn.Linear(inner, in_ch)

    def forward(self, x, context, image_only_indicator):
        # x: (B*F, C, H, W); context: (B*F, S_ctx, cross_dim); indicator (B, F).
        bf, ch, height, width = x.shape
        num_frames = image_only_indicator.shape[-1]
        b = bf // num_frames
        residual = x

        ctx_first = context.reshape(b, num_frames, -1, context.shape[-1])[:, 0]
        seq = height * width
        time_context = (
            ctx_first[:, None]
            .broadcast_to(b, seq, ctx_first.shape[1], ctx_first.shape[2])
            .reshape(b * seq, ctx_first.shape[1], ctx_first.shape[2])
        )

        h = self.norm(x)
        h = h.permute(0, 2, 3, 1).reshape(bf, seq, ch)
        h = self.proj_in(h)

        frame_idx = torch.arange(num_frames).repeat(b)
        emb = self.time_pos_embed(self.time_proj(frame_idx))[:, None]

        for block, tblock in zip(self.transformer_blocks, self.temporal_transformer_blocks):
            h = block(h, context)
            h_mix = h + emb
            h_mix = tblock(h_mix, num_frames, time_context)
            # Blend at (B, F, S, C) like the 5-dim resblock path.
            alpha = torch.where(
                image_only_indicator.bool(), torch.ones_like(self.time_mixer.mix_factor),
                torch.sigmoid(self.time_mixer.mix_factor),
            )[:, :, None, None]
            hs = h.view(b, num_frames, seq, self.inner)
            ht = h_mix.view(b, num_frames, seq, self.inner)
            h = (alpha * hs + (1 - alpha) * ht).view(bf, seq, self.inner)

        h = self.proj_out(h)
        h = h.reshape(bf, height, width, ch).permute(0, 3, 1, 2)
        return h + residual


class VAEMidAttention(nn.Module):
    """diffusers Attention as configured in the VAE mid blocks
    (unet_3d_blocks.py MidBlockTemporalDecoder / SD VAE: GroupNorm(32,
    eps=1e-6) on the spatial map, qkv+out with bias, residual connection,
    heads = channels // attention_head_dim)."""

    def __init__(self, ch, head_dim=512):
        super().__init__()
        self.ch = ch
        self.heads = max(ch // head_dim, 1)
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.Sequential(nn.Linear(ch, ch))

    def forward(self, x):
        # x: (N, C, H, W)
        n, c, height, width = x.shape
        residual = x
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(n, height * width, c)
        dim = c // self.heads

        def split(t):
            return t.reshape(n, -1, self.heads, dim).transpose(1, 2)

        q, k, v = split(self.to_q(h)), split(self.to_k(h)), split(self.to_v(h))
        attn = torch.softmax(q @ k.transpose(-1, -2) / dim ** 0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(n, -1, c)
        out = self.to_out(out).reshape(n, height, width, c).permute(0, 3, 1, 2)
        return out + residual

"""Torch twin of the full SVD spatio-temporal UNet SHELL.

Extends tests/torch_svd_blocks.py to the whole
`UNetSpatioTemporalConditionModel` wiring of the reference
(/root/reference/evoworld/trainer/unet_plucker.py:68-487): conv_in,
time/added-time embeddings, 4 down blocks (cross/cross/cross/plain), mid,
4 up blocks, conv_norm_out/conv_out, with diffusers state-dict naming so
`models/weights.py::convert_unet_state_dict` applies to a genuinely
torch-produced checkpoint. Test-only; independently restates the published
wiring so a skip-connection / embedding-broadcast drift in
`models/unet.py` fails the full-model parity test.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_svd_blocks import (
    SpatioTemporalResBlock,
    TimestepEmbedding,
    Timesteps,
    TransformerSpatioTemporalModel,
)

EPS = 1e-5  # models/unet.py resblock eps


class Downsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, heads, cross_dim, num_layers, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(in_ch if i == 0 else out_ch, out_ch, temb_ch, EPS, EPS)
            for i in range(num_layers)
        ])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads, out_ch // heads, out_ch, cross_dim)
            for _ in range(num_layers)
        ])
        self.downsamplers = nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None

    def forward(self, x, temb, context, indicator):
        outs = []
        for resnet, attn in zip(self.resnets, self.attentions):
            x = resnet(x, temb, indicator)
            x = attn(x, context, indicator)
            outs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs.append(x)
        return x, outs


class DownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, num_layers, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(in_ch if i == 0 else out_ch, out_ch, temb_ch, EPS, EPS)
            for i in range(num_layers)
        ])
        self.downsamplers = nn.ModuleList([Downsample2D(out_ch)]) if add_downsample else None

    def forward(self, x, temb, indicator):
        outs = []
        for resnet in self.resnets:
            x = resnet(x, temb, indicator)
            outs.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            outs.append(x)
        return x, outs


class UNetMidBlockSpatioTemporal(nn.Module):
    def __init__(self, ch, temb_ch, heads, cross_dim):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(ch, ch, temb_ch, EPS, EPS),
            SpatioTemporalResBlock(ch, ch, temb_ch, EPS, EPS),
        ])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads, ch // heads, ch, cross_dim)
        ])

    def forward(self, x, temb, context, indicator):
        x = self.resnets[0](x, temb, indicator)
        x = self.attentions[0](x, context, indicator)
        return self.resnets[1](x, temb, indicator)


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    def __init__(self, res_in_chs, out_ch, temb_ch, heads, cross_dim, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(c, out_ch, temb_ch, EPS, EPS) for c in res_in_chs
        ])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads, out_ch // heads, out_ch, cross_dim)
            for _ in res_in_chs
        ])
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None

    def forward(self, x, skips, temb, context, indicator):
        # diffusers consumes the skip tuple from the END (deepest first).
        for resnet, attn in zip(self.resnets, self.attentions):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb, indicator)
            x = attn(x, context, indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UpBlockSpatioTemporal(nn.Module):
    def __init__(self, res_in_chs, out_ch, temb_ch, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(c, out_ch, temb_ch, EPS, EPS) for c in res_in_chs
        ])
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None

    def forward(self, x, skips, temb, indicator):
        for resnet in self.resnets:
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb, indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNetSpatioTemporalConditionModel(nn.Module):
    """Shell wiring per unet_plucker.py:355-487 (diffusers state-dict names)."""

    def __init__(self, in_channels=18, out_channels=4,
                 block_out_channels=(32, 64, 64, 64), heads=(1, 2, 2, 2),
                 layers_per_block=2, cross_dim=48, addition_time_embed_dim=256):
        super().__init__()
        ch0 = block_out_channels[0]
        temb_ch = ch0 * 4
        self.ch0 = ch0
        self.addition_time_embed_dim = addition_time_embed_dim
        cross_flags = (True, True, True, False)

        self.conv_in = nn.Conv2d(in_channels, ch0, 3, padding=1)
        self.time_proj = Timesteps(ch0)
        self.time_embedding = TimestepEmbedding(ch0, temb_ch, temb_ch)
        self.add_time_proj = Timesteps(addition_time_embed_dim)
        self.add_embedding = TimestepEmbedding(addition_time_embed_dim * 3, temb_ch, temb_ch)

        self.down_blocks = nn.ModuleList()
        skip_chs = [ch0]
        in_ch = ch0
        n = len(block_out_channels)
        for i, out_ch in enumerate(block_out_channels):
            last = i == n - 1
            if cross_flags[i]:
                blk = CrossAttnDownBlockSpatioTemporal(
                    in_ch, out_ch, temb_ch, heads[i], cross_dim, layers_per_block, not last)
            else:
                blk = DownBlockSpatioTemporal(in_ch, out_ch, temb_ch, layers_per_block, not last)
            self.down_blocks.append(blk)
            skip_chs += [out_ch] * layers_per_block + ([out_ch] if not last else [])
            in_ch = out_ch

        self.mid_block = UNetMidBlockSpatioTemporal(
            block_out_channels[-1], temb_ch, heads[-1], cross_dim)

        self.up_blocks = nn.ModuleList()
        x_ch = block_out_channels[-1]
        for i in range(n):
            level = n - 1 - i
            out_ch = block_out_channels[level]
            n_layers = layers_per_block + 1
            popped = [skip_chs.pop() for _ in range(n_layers)]
            res_in = []
            for c in popped:
                res_in.append(x_ch + c)
                x_ch = out_ch
            last = i == n - 1
            if cross_flags[level]:
                blk = CrossAttnUpBlockSpatioTemporal(
                    res_in, out_ch, temb_ch, heads[level], cross_dim, not last)
            else:
                blk = UpBlockSpatioTemporal(res_in, out_ch, temb_ch, not last)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, out_channels, 3, padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids):
        # sample: (B, F, C, H, W); context: (B, 1, cross); time_ids: (B, 3).
        batch, num_frames = sample.shape[:2]
        timesteps = torch.as_tensor(timestep).reshape(-1).expand(batch)
        emb = self.time_embedding(self.time_proj(timesteps))
        time_embeds = self.add_time_proj(added_time_ids.flatten()).reshape(batch, -1)
        emb = emb + self.add_embedding(time_embeds)

        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(num_frames, dim=0)
        context = encoder_hidden_states.repeat_interleave(num_frames, dim=0)
        indicator = torch.zeros(batch, num_frames, dtype=sample.dtype)

        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            if isinstance(block, CrossAttnDownBlockSpatioTemporal):
                x, outs = block(x, emb, context, indicator)
            else:
                x, outs = block(x, emb, indicator)
            skips.extend(outs)

        x = self.mid_block(x, emb, context, indicator)

        for block in self.up_blocks:
            if isinstance(block, CrossAttnUpBlockSpatioTemporal):
                x = block(x, skips, emb, context, indicator)
            else:
                x = block(x, skips, emb, indicator)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(batch, num_frames, *x.shape[1:])

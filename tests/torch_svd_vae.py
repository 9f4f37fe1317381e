"""Torch twin of the full `AutoencoderKLTemporalDecoder` (SVD VAE).

Test-only; restates the published diffusers 0.31 semantics independently
(autoencoders/autoencoder_kl_temporal_decoder.py + vae.py Encoder) with
diffusers state-dict naming so `models/weights.py::convert_vae_state_dict`
applies. Distinctive details mirrored: asymmetric (0,1) downsample padding
in the encoder, quant_conv (no post_quant_conv), decoder resblocks with NO
time embedding and a switched "learned" AlphaBlender (alpha_init 0), and
the final depth-3 temporal output conv.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2D(nn.Module):
    """temb-free spatial residual block (VAE variant)."""

    def __init__(self, in_ch, out_ch, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return res + h


class TemporalResnetBlock(nn.Module):
    """temb-free (B, C, F, H, W) residual block, kernel (3, 1, 1)."""

    def __init__(self, ch, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, ch, eps=eps)
        self.conv1 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(32, ch, eps=eps)
        self.conv2 = nn.Conv3d(ch, ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return x + h


class AlphaBlenderSwitch(nn.Module):
    """merge_strategy='learned' with switch_spatial_to_temporal_mix=True."""

    def __init__(self, alpha: float = 0.0):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([alpha]))

    def forward(self, x_spatial, x_temporal):
        alpha = 1.0 - torch.sigmoid(self.mix_factor)
        alpha = alpha.reshape(1, 1, 1, 1, 1).to(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    """VAE-decoder variant: temb-free, switched learned blend."""

    def __init__(self, in_ch, out_ch, eps=1e-6, temporal_eps=1e-5):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(in_ch, out_ch, eps)
        self.temporal_res_block = TemporalResnetBlock(out_ch, temporal_eps)
        self.time_mixer = AlphaBlenderSwitch()

    def forward(self, x, num_frames):
        h = self.spatial_res_block(x)
        bf, ch, height, width = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, ch, height, width).permute(0, 2, 1, 3, 4)
        ht = self.temporal_res_block(h5)
        mixed = self.time_mixer(h5, ht)
        return mixed.permute(0, 2, 1, 3, 4).reshape(bf, ch, height, width)


class VAEMidAttentionWrapper(nn.Module):
    """Names the qkv/out like diffusers Attention inside mid blocks."""

    def __init__(self, ch, head_dim=512):
        super().__init__()
        from tests.torch_svd_blocks import VAEMidAttention

        self._impl = VAEMidAttention(ch, head_dim=head_dim)
        # expose the impl's submodules under our own names for state_dict
        self.group_norm = self._impl.group_norm
        self.to_q = self._impl.to_q
        self.to_k = self._impl.to_k
        self.to_v = self._impl.to_v
        self.to_out = self._impl.to_out

    def forward(self, x):
        return self._impl(x)


class Encoder(nn.Module):
    def __init__(self, block_out_channels=(32, 32, 64, 64), layers_per_block=2, latent_channels=4):
        super().__init__()
        ch0, chN = block_out_channels[0], block_out_channels[-1]
        self.conv_in = nn.Conv2d(3, ch0, 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = ch0
        for i, out_ch in enumerate(block_out_channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch)
                for j in range(layers_per_block)
            ])
            if i != len(block_out_channels) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            else:
                blk.downsamplers = None
            self.down_blocks.append(blk)
            in_ch = out_ch
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            ResnetBlock2D(chN, chN), ResnetBlock2D(chN, chN)
        ])
        self.mid_block.attentions = nn.ModuleList([VAEMidAttentionWrapper(chN)])
        self.conv_norm_out = nn.GroupNorm(32, chN, eps=1e-6)
        self.conv_out = nn.Conv2d(chN, 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if blk.downsamplers is not None:
                # diffusers Downsample2D pad=0 branch: asymmetric (0,1,0,1).
                x = blk.downsamplers[0].conv(F.pad(x, (0, 1, 0, 1)))
        x = self.mid_block.resnets[0](x)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TemporalDecoder(nn.Module):
    def __init__(self, block_out_channels=(32, 32, 64, 64), layers_per_block=2, latent_channels=4):
        super().__init__()
        chN = block_out_channels[-1]
        self.conv_in = nn.Conv2d(latent_channels, chN, 3, padding=1)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            SpatioTemporalResBlock(chN, chN), SpatioTemporalResBlock(chN, chN)
        ])
        self.mid_block.attentions = nn.ModuleList([VAEMidAttentionWrapper(chN)])
        rev = list(reversed(block_out_channels))
        self.up_blocks = nn.ModuleList()
        in_ch = chN
        for i, out_ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                SpatioTemporalResBlock(in_ch if j == 0 else out_ch, out_ch)
                for j in range(layers_per_block + 1)
            ])
            if i != len(rev) - 1:
                ups = nn.Module()
                ups.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([ups])
            else:
                blk.upsamplers = None
            self.up_blocks.append(blk)
            in_ch = out_ch
        ch0 = block_out_channels[0]
        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=1e-6)
        self.conv_out = nn.Conv2d(ch0, 3, 3, padding=1)
        self.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames):
        x = self.conv_in(z)
        x = self.mid_block.resnets[0](x, num_frames)
        x = self.mid_block.attentions[0](x)
        x = self.mid_block.resnets[1](x, num_frames)
        for blk in self.up_blocks:
            for r in blk.resnets:
                x = r(x, num_frames)
            if blk.upsamplers is not None:
                x = blk.upsamplers[0].conv(
                    F.interpolate(x, scale_factor=2.0, mode="nearest"))
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        bf, ch, height, width = x.shape
        b = bf // num_frames
        x5 = x.reshape(b, num_frames, ch, height, width).permute(0, 2, 1, 3, 4)
        x5 = self.time_conv_out(x5)
        return x5.permute(0, 2, 1, 3, 4).reshape(bf, ch, height, width)


class AutoencoderKLTemporalDecoder(nn.Module):
    def __init__(self, block_out_channels=(32, 32, 64, 64), latent_channels=4):
        super().__init__()
        self.encoder = Encoder(block_out_channels, latent_channels=latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.decoder = TemporalDecoder(block_out_channels, latent_channels=latent_channels)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def forward(self, x, num_frames):
        moments = self.encode_moments(x)
        z = moments[:, : moments.shape[1] // 2]
        return self.decoder(z, num_frames)

"""Independent torch twins of the VGGT camera head and DPT head.

Restate the upstream facebookresearch/vggt head architectures (the ones the
reference consumes through facebook/VGGT-1B model.pt,
/root/reference/unified_loop_consistency.py:125-127,352,366) with upstream
parameter naming, so their state dicts convert through the REAL
`models/vggt/weights.py` converter sections and numerical parity against
`models/vggt/heads.py` is non-circular:

  - Block/Attention/Mlp/LayerScale: vggt/layers/block.py defaults
    (pre-LN, fused qkv, optional LayerScale, exact GELU);
  - CameraHead: camera_head.py — token_norm, iterative adaLN-modulated
    trunk (Sequential(SiLU, Linear) modulation producing shift/scale/gate),
    deep-supervision loop detaching pred_pose_enc from iteration 1 on;
  - DPTHead: dpt_head.py — per-tap 1x1 projects + resize_layers
    (ConvTranspose 4/2, Identity, stride-2 Conv), scratch.layerN_rn 3x3
    bias-free convs, refinenet1..4 RefineNet fusion (ResidualConvUnit pairs,
    align_corners=True bilinear), output_conv1/output_conv2 head.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Mlp(nn.Module):
    def __init__(self, dim, hidden, out):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, out)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class LayerScale(nn.Module):
    def __init__(self, dim, init_values=0.01):
        super().__init__()
        self.gamma = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class RoPE2D(nn.Module):
    """croco/VGGT 2D rotary embedding (vggt/layers/rope.py, freq=100):
    head dim halves rotate by the token's (y, x) position respectively,
    GPT-NeoX rotate-half pairing with angles repeated twice."""

    def __init__(self, base=100.0):
        super().__init__()
        self.base = base

    @staticmethod
    def rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def apply_rope1d(self, tokens, pos1d):
        # tokens (B, H, S, D1), pos1d (B, S)
        d = tokens.shape[-1]
        inv = 1.0 / (self.base ** (torch.arange(0, d, 2).float() / d))
        ang = pos1d.float()[..., None] * inv  # (B, S, D1/2)
        ang = torch.cat((ang, ang), dim=-1)
        cos = ang.cos()[:, None, :, :]
        sin = ang.sin()[:, None, :, :]
        return tokens * cos + self.rotate_half(tokens) * sin

    def forward(self, tokens, positions):
        # tokens (B, H, S, D); positions (B, S, 2) = (y, x)
        d = tokens.size(3) // 2
        y, x = tokens.chunk(2, dim=-1)
        y = self.apply_rope1d(y, positions[:, :, 0])
        x = self.apply_rope1d(x, positions[:, :, 1])
        return torch.cat((y, x), dim=-1)


class Attention(nn.Module):
    def __init__(self, dim, num_heads, qk_norm=False, rope=None):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.q_norm = nn.LayerNorm(self.head_dim) if qk_norm else nn.Identity()
        self.k_norm = nn.LayerNorm(self.head_dim) if qk_norm else nn.Identity()
        self.rope = rope

    def forward(self, x, positions=None):
        b, s, d = x.shape
        qkv = self.qkv(x).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.unbind(2)
        # Upstream order: qk-norm first, then rotary (vggt Attention).
        q, k = self.q_norm(q), self.k_norm(k)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        if self.rope is not None and positions is not None:
            q = self.rope(q, positions)
            k = self.rope(k, positions)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(b, s, d))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qk_norm=False,
                 init_values=0.01, rope=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, num_heads, qk_norm, rope=rope)
        self.ls1 = LayerScale(dim, init_values)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), dim)
        self.ls2 = LayerScale(dim, init_values)

    def forward(self, x, positions=None):
        x = x + self.ls1(self.attn(self.norm1(x), positions))
        return x + self.ls2(self.mlp(self.norm2(x)))


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


class CameraHead(nn.Module):
    """Upstream camera_head.py trunk_fn (inference path)."""

    def __init__(self, dim_in=2048, trunk_depth=4, num_heads=16, out_dim=9):
        super().__init__()
        self.trunk_depth = trunk_depth
        self.token_norm = nn.LayerNorm(dim_in)
        self.trunk = nn.Sequential(
            *[Block(dim_in, num_heads) for _ in range(trunk_depth)]
        )
        self.trunk_norm = nn.LayerNorm(dim_in)
        self.empty_pose_tokens = nn.Parameter(torch.zeros(1, 1, out_dim))
        self.embed_pose = nn.Linear(out_dim, dim_in)
        self.poseLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(dim_in, 3 * dim_in)
        )
        self.adaln_norm = nn.LayerNorm(dim_in, elementwise_affine=False)
        self.pose_branch = Mlp(dim_in, dim_in // 2, out_dim)

    def forward(self, camera_tokens, num_iterations=4):
        b, s, _ = camera_tokens.shape
        pose_tokens = self.token_norm(camera_tokens)
        pred_pose_enc = None
        for _ in range(num_iterations):
            if pred_pose_enc is None:
                module_input = self.embed_pose(
                    self.empty_pose_tokens.expand(b, s, -1)
                )
            else:
                pred_pose_enc = pred_pose_enc.detach()
                module_input = self.embed_pose(pred_pose_enc)
            shift, scale, gate = self.poseLN_modulation(module_input).chunk(3, dim=-1)
            modulated = gate * modulate(self.adaln_norm(pose_tokens), shift, scale)
            modulated = modulated + pose_tokens
            modulated = self.trunk(modulated)
            delta = self.pose_branch(self.trunk_norm(modulated))
            pred_pose_enc = delta if pred_pose_enc is None else pred_pose_enc + delta
        return pred_pose_enc


def custom_interpolate(x, size):
    return F.interpolate(x, size=size, mode="bilinear", align_corners=True)


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        out = F.relu(x)
        out = self.conv1(out)
        out = F.relu(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, skip=None, size=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        if size is None:
            size = (x.shape[2] * 2, x.shape[3] * 2)
        x = custom_interpolate(x, size)
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self, layer_dims, features, out_channels):
        super().__init__()
        self.layer1_rn = nn.Conv2d(layer_dims[0], features, 3, padding=1, bias=False)
        self.layer2_rn = nn.Conv2d(layer_dims[1], features, 3, padding=1, bias=False)
        self.layer3_rn = nn.Conv2d(layer_dims[2], features, 3, padding=1, bias=False)
        self.layer4_rn = nn.Conv2d(layer_dims[3], features, 3, padding=1, bias=False)
        self.refinenet1 = FeatureFusionBlock(features)
        self.refinenet2 = FeatureFusionBlock(features)
        self.refinenet3 = FeatureFusionBlock(features)
        self.refinenet4 = FeatureFusionBlock(features)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, padding=1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(32, out_channels, 1),
        )


class DPTHead(nn.Module):
    """Upstream dpt_head.py (feature path, activation applied by callers)."""

    def __init__(self, dim_in=2048, features=256,
                 layer_dims=(256, 512, 1024, 1024), out_channels=2,
                 patch_size=14):
        super().__init__()
        self.patch_size = patch_size
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, oc, 1) for oc in layer_dims]
        )
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(layer_dims[0], layer_dims[0], 4, stride=4),
            nn.ConvTranspose2d(layer_dims[1], layer_dims[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(layer_dims[3], layer_dims[3], 3, stride=2, padding=1),
        ])
        self.scratch = Scratch(layer_dims, features, out_channels)

    def forward(self, layer_tokens, patch_hw, image_hw):
        ph, pw = patch_hw
        feats = []
        for i, tokens in enumerate(layer_tokens):
            n, p, c = tokens.shape
            x = tokens.permute(0, 2, 1).reshape(n, c, ph, pw)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            feats.append(x)
        l1 = self.scratch.layer1_rn(feats[0])
        l2 = self.scratch.layer2_rn(feats[1])
        l3 = self.scratch.layer3_rn(feats[2])
        l4 = self.scratch.layer4_rn(feats[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = custom_interpolate(out, image_hw)
        return self.scratch.output_conv2(out)

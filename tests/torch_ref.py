"""Compact PyTorch model with the reference's exact forward semantics
(``/root/reference/src/models/vit.py``) — written fresh for the parity
harness: golden logits are produced here, converted to JAX params, and the
Flax model must match within the 1e-3 fp32 bar (BASELINE.json north star).
"""

from __future__ import annotations

import torch
from torch import nn


class TorchBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.norm1 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def attn(self, x):
        b, n, c = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        a = (q @ k.transpose(-2, -1)) * self.scale
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(b, n, c))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.norm2(x)
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x


class TorchRefViT(nn.Module):
    """state_dict keys follow the reference layout exactly so the converter
    (gavit_tpu.utils.torch_convert) applies unchanged."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3, num_classes=14,
                 embed_dim=192, depth=2, num_heads=3, mlp_ratio=4.0):
        super().__init__()
        n = (img_size // patch_size) ** 2
        self.img_size, self.patch_size = img_size, patch_size
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            in_chans, embed_dim, kernel_size=patch_size, stride=patch_size
        )
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, embed_dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(embed_dim, num_heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(embed_dim)
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x):  # x: [B, C, H, W]
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat((cls, x), dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])


def reference_state_dict(model: TorchRefViT) -> dict:
    """Remap this module's keys to the reference layout
    (blocks.N.attn.qkv, blocks.N.mlp.fc1, ...)."""
    sd = {}
    for key, val in model.state_dict().items():
        if key.startswith("blocks."):
            parts = key.split(".")
            name = parts[2]
            if name in ("qkv", "proj"):
                key = f"blocks.{parts[1]}.attn.{name}.{parts[3]}"
            elif name in ("fc1", "fc2"):
                key = f"blocks.{parts[1]}.mlp.{name}.{parts[3]}"
        sd[key] = val.detach().clone()
    return sd

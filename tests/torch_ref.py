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


class TorchRefCriterion(nn.Module):
    """The reference DynamicWeightedLoss
    (``/root/reference/src/training/losses.py:7-68``), transcribed term for
    term: learnable λ softmax over WBCE(pos_weight) / focal(γ=2) /
    ASL(γ⁺=1, γ⁻=4, clamp 1e-8)."""

    def __init__(self, pos_weight):
        super().__init__()
        self.lambda_wbce = nn.Parameter(torch.tensor(1.0))
        self.lambda_focal = nn.Parameter(torch.tensor(1.0))
        self.lambda_asl = nn.Parameter(torch.tensor(1.0))
        self.register_buffer("pos_weight", pos_weight)

    def forward(self, logits, targets):
        f = torch.nn.functional
        w = f.softmax(torch.stack([
            self.lambda_wbce, self.lambda_focal, self.lambda_asl]), dim=0)
        wbce = f.binary_cross_entropy_with_logits(
            logits, targets, pos_weight=self.pos_weight, reduction="mean")
        bce = f.binary_cross_entropy_with_logits(
            logits, targets, reduction="none")
        pt = torch.exp(-bce)
        focal = ((1 - pt) ** 2.0 * bce).mean()
        xs_pos = torch.sigmoid(logits)
        los_pos = targets * torch.log(torch.clamp(xs_pos, min=1e-8)) \
            * (1 - xs_pos)
        los_neg = (1 - targets) * torch.log(torch.clamp(1 - xs_pos, min=1e-8)) \
            * xs_pos.pow(4)
        asl = -(los_pos + los_neg).mean()
        return w[0] * wbce + w[1] * focal + w[2] * asl


class TorchRefTrainer:
    """The reference Trainer's exact update rule
    (``/root/reference/src/training/trainer.py:47-56,77-87,110-123``):
    AdamW over [model @ lr, criterion @ 0.1·lr] with top-level weight decay
    on both groups, per-step LambdaLR warmup→cosine (stepped AFTER the
    optimizer, so the first update runs at multiplier 0), and global-norm
    clipping of the MODEL gradients only. fp32 / no GradScaler — the
    reference's fp16 scaler cancels out of the update in exact arithmetic
    (scale → unscale_ before clip), and the CUDA autocast context is inert
    on CPU, so this is the semantics the parity bar pins."""

    def __init__(self, model, criterion, *, lr, weight_decay, beta1=0.9,
                 beta2=0.999, eps=1e-8, max_grad_norm=1.0,
                 warmup_steps=0, total_steps=1):
        import numpy as np

        self.model, self.criterion = model, criterion
        self.max_grad_norm = max_grad_norm
        self.optimizer = torch.optim.AdamW(
            [
                {"params": model.parameters()},
                {"params": criterion.parameters(), "lr": lr * 0.1},
            ],
            lr=lr, weight_decay=weight_decay, betas=(beta1, beta2), eps=eps,
        )

        def lr_lambda(step):
            if step < warmup_steps:
                return float(step) / float(max(1, warmup_steps))
            progress = float(step - warmup_steps) / float(
                max(1, total_steps - warmup_steps))
            return 0.5 * (1.0 + np.cos(np.pi * progress))

        self.scheduler = torch.optim.lr_scheduler.LambdaLR(
            self.optimizer, lr_lambda)

    def step(self, images, targets) -> float:
        outputs = self.model(images)
        loss = self.criterion(outputs, targets)
        self.optimizer.zero_grad(set_to_none=True)
        loss.backward()
        if self.max_grad_norm > 0:
            torch.nn.utils.clip_grad_norm_(
                self.model.parameters(), self.max_grad_norm)
        self.optimizer.step()
        self.scheduler.step()
        return float(loss.detach())


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

"""Write a synthetic MAE-format `.pth` checkpoint (ViT-B/16 @ 224px) with
the exact key layout of the reference's pretrained file
(``/root/reference/configs/baseline_config.yaml:23`` →
``src/models/vit.py:182-200``: ``checkpoint['model']``, head keys filtered
on load). Used to exercise the full MAE-init + pos-embed-interpolation CLI
path (finetune_384) until the real ``vit-b_CXR_0.5M_mae.pth`` is available.

Usage: python tools/make_fake_mae.py /tmp/vit-b_mae_fake.pth
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

from tests.torch_ref import TorchRefViT, reference_state_dict


def main(path):
    torch.manual_seed(0)
    model = TorchRefViT(img_size=224, patch_size=16, num_classes=14,
                        embed_dim=768, depth=12, num_heads=12)
    sd = reference_state_dict(model)
    torch.save({"model": sd, "note": "synthetic MAE-format init"}, path)
    n = sum(v.numel() for v in sd.values())
    print(f"wrote {path}: {len(sd)} tensors, {n/1e6:.1f}M params")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vit-b_mae_fake.pth")

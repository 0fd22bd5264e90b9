"""Generate the LPIPS converter/numerics golden
(tests/golden/lpips_tiny.npz) — the VAE treatment applied to LPIPS
(VERDICT r3 missing #2).

The oracle is an INDEPENDENT torch re-implementation of the standard
LPIPS(VGG-16) metric the reference uses via kiui.lpips
(ref: core/models.py:46-49,156-163), written here from the published
semantics with the CANONICAL state-dict key names real released weights
carry:

- a torchvision-style ``features`` Sequential — convs at indices
  0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28 with ReLU after each conv
  and MaxPool at 4,9,16,23 — producing ``features.{i}.weight/bias``;
- LPIPS linear heads named ``lin{k}.model.1.weight`` with shape
  [1, C_k, 1, 1], non-negative (the released checkpoints are);
- forward: scaling layer (shift/scale constants), taps after
  relu{1_2,2_2,3_3,4_3,5_3}, unit channel normalization
  x / (||x||_2 + 1e-10), squared diffs, 1x1 head, spatial mean, sum.

Widths are REDUCED (8/16/32/32/32 vs 64/128/256/512/512) so the fixture
stays ~100 KB; the structure, naming, and every converter mapping rule
are identical to the real checkpoint, so a drop-in of real released
weights exercises exactly the mappings this fixture pins.

Usage: python scripts/gen_golden_lpips.py
"""

import os

import numpy as np
import torch
import torch.nn as nn

STAGE_PLAN = ((2, 8), (2, 16), (3, 32), (3, 32), (3, 32))
SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
IMG = 64


def build_features():
    """torchvision-vgg16-shaped Sequential at STAGE_PLAN widths; conv
    indices land exactly on the canonical 0,2,5,7,10,... positions."""
    layers = []
    cin = 3
    for si, (n_convs, ch) in enumerate(STAGE_PLAN):
        for _ in range(n_convs):
            layers.append(nn.Conv2d(cin, ch, 3, padding=1))
            layers.append(nn.ReLU())
            cin = ch
        layers.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*layers[:-1])  # final pool unused (tap first)


class NetLinLayer(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.model = nn.Sequential(
            nn.Dropout(), nn.Conv2d(cin, 1, 1, bias=False),
        )


class LPIPSOracle(nn.Module):
    # Tap index = position AFTER the stage's last ReLU in `features`.
    TAPS = (3, 8, 15, 22, 29)
    POOLS = (4, 9, 16, 23)

    def __init__(self):
        super().__init__()
        self.features = build_features()
        for k, (_, ch) in enumerate(STAGE_PLAN):
            setattr(self, f"lin{k}", NetLinLayer(ch))

    def taps(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.TAPS:
                out.append(x)
        return out

    def forward(self, a, b):
        fa = self.taps((a - SHIFT) / SCALE)
        fb = self.taps((b - SHIFT) / SCALE)
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb) ** 2
            w = getattr(self, f"lin{k}").model[1].weight  # [1, C, 1, 1]
            contrib = (diff * w).sum(1)                    # [B, H, W]
            total = total + contrib.mean(dim=(1, 2))       # [B]
        return total


def main():
    torch.manual_seed(31)
    oracle = LPIPSOracle().eval()
    with torch.no_grad():
        # Non-negative heads like the released weights (our model applies
        # abs(), identity on these); scale ~1/C keeps distances O(1).
        for k, (_, ch) in enumerate(STAGE_PLAN):
            w = getattr(oracle, f"lin{k}").model[1].weight
            w.copy_(torch.rand_like(w) / ch)

    gen = torch.Generator().manual_seed(32)
    a = (torch.rand(2, 3, IMG, IMG, generator=gen) * 2 - 1)
    b = (torch.rand(2, 3, IMG, IMG, generator=gen) * 2 - 1)
    with torch.no_grad():
        d = oracle(a, b)
        d_same = oracle(a, a)

    # Split the state dict the way real files arrive: the VGG backbone
    # (features.*, a torchvision vgg16 .pth) and the LPIPS heads
    # (lin{k}.model.1.weight, the richzhang/kiui .pth).
    sd = oracle.state_dict()
    out = {
        "a": a.numpy().astype(np.float32),
        "b": b.numpy().astype(np.float32),
        "dist": d.numpy().astype(np.float32),
        "dist_same": d_same.numpy().astype(np.float32),
    }
    for k, v in sd.items():
        group = "vgg_sd/" if k.startswith("features.") else "lin_sd/"
        out[group + k] = v.numpy().astype(np.float32)

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "lpips_tiny.npz")
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)}: dist {d.numpy()}, "
          f"self-dist {d_same.numpy()}")


if __name__ == "__main__":
    main()

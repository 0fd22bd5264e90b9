"""Generate the VAE golden fixture (tests/golden/vae_tiny.npz).

diffusers is absent in this environment, so the oracle is a minimal
torch re-implementation of diffusers' AutoencoderKL written HERE from
its documented semantics (GroupNorm(32, eps 1e-6) + SiLU resnets with
1x1 shortcuts, single-head bottleneck attention with 1/sqrt(C) scale,
stride-2 downsample conv with asymmetric (0,1,0,1) padding, nearest
x2 + conv upsample, quant/post_quant 1x1 convs) — an INDEPENDENT
implementation in a different framework with the CANONICAL diffusers
state-dict key names, so the fixture pins both the weight-converter
mapping (real key strings) and the Flax model numerics
(ref: mvdream/pipeline_mvdream.py:29-37,339-345).

Usage: python scripts/gen_golden_vae.py
"""

import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BLOCKS = (32, 64)
LAYERS = 2
LATENT = 4
IMG = 32


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).permute(0, 2, 1)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        a = torch.softmax(q @ k.transpose(1, 2) / C ** 0.5, dim=-1)
        o = self.to_out[0](a @ v)
        return x + o.permute(0, 2, 1).reshape(B, C, H, W)


class MidBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(ch, ch),
                                      ResnetBlock(ch, ch)])
        self.attentions = nn.ModuleList([Attention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout)
             for j in range(LAYERS)])
        self.downsamplers = (nn.ModuleList([Downsample(cout)])
                             if downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class UpBlock(nn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout)
             for j in range(LAYERS + 1)])
        self.upsamplers = (nn.ModuleList([Upsample(cout)])
                           if upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(3, BLOCKS[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = BLOCKS[0]
        for i, ch in enumerate(BLOCKS):
            self.down_blocks.append(
                DownBlock(cin, ch, downsample=(i != len(BLOCKS) - 1)))
            cin = ch
        self.mid_block = MidBlock(BLOCKS[-1])
        self.conv_norm_out = nn.GroupNorm(32, BLOCKS[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(BLOCKS[-1], 2 * LATENT, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self):
        super().__init__()
        rev = tuple(reversed(BLOCKS))
        self.conv_in = nn.Conv2d(LATENT, rev[0], 3, padding=1)
        self.mid_block = MidBlock(rev[0])
        self.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, ch in enumerate(rev):
            self.up_blocks.append(
                UpBlock(cin, ch, upsample=(i != len(rev) - 1)))
            cin = ch
        self.conv_norm_out = nn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class AutoencoderKL(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = Encoder()
        self.decoder = Decoder()
        self.quant_conv = nn.Conv2d(2 * LATENT, 2 * LATENT, 1)
        self.post_quant_conv = nn.Conv2d(LATENT, LATENT, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def main():
    torch.manual_seed(11)
    vae = AutoencoderKL().eval()
    x = torch.randn(1, 3, IMG, IMG,
                    generator=torch.Generator().manual_seed(12))
    z = torch.randn(1, LATENT, IMG // 2, IMG // 2,
                    generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        moments = vae.encode_moments(x)
        rgb = vae.decode(z)

    out = {
        "x": x.numpy().astype(np.float32),
        "z": z.numpy().astype(np.float32),
        "moments": moments.numpy().astype(np.float32),
        "rgb": rgb.numpy().astype(np.float32),
    }
    for k, v in vae.state_dict().items():
        out["sd/" + k] = v.numpy().astype(np.float32)
    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "vae_tiny.npz")
    np.savez_compressed(dst, **out)
    names = [k for k in out if k.startswith("sd/")]
    print(f"wrote {os.path.abspath(dst)}: {len(names)} tensors, "
          f"moments {tuple(moments.shape)}, rgb {tuple(rgb.shape)}")


if __name__ == "__main__":
    main()

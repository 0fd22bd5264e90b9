"""Generate the diffusion multi-view U-Net golden fixture
(tests/golden/mvunet_tiny.npz).

Runs the REFERENCE torch MultiViewUNetModel (ref: mvdream/mv_unet.py:
615-1005 — timestep + camera embeddings, SpatialTransformer3D with
cross-view self-attention over (b f) l c -> b (f l) c, CLIP-context
cross-attention) on CPU at a tiny config and records its state dict and
one forward pass. tests/test_golden_unet.py then converts the state
dict with tools/convert_diffusion.py and asserts our Flax model
reproduces the output — end-to-end numeric validation of the diffusion
converter AND model math (~1000 reference lines of parity surface).

The reference module hard-imports CUDA/absent deps; they are stubbed
with exact-math equivalents, none of which carry parameters:
- xformers.ops.memory_efficient_attention -> plain softmax attention
  (same math: scale 1/sqrt(K), no pre-scaled q).
- diffusers ModelMixin/ConfigMixin -> nn.Module/object (config
  machinery unused under direct construction).
- kiui.cam.orbit_camera -> unused by the UNet forward (import-time only).

Usage: LGM_REFERENCE=/root/reference python scripts/gen_golden_mvunet.py
"""

import os
import sys
import types

ref = os.environ.get("LGM_REFERENCE", "/root/reference")
sys.path.insert(0, ref)

import numpy as np  # noqa: E402
import torch  # noqa: E402

# --- stubs --------------------------------------------------------------
xf = types.ModuleType("xformers")
xf_ops = types.ModuleType("xformers.ops")


def _mea(q, k, v, attn_bias=None, op=None):
    # xformers semantics for 3-D [B, M, K] inputs.
    assert attn_bias is None
    scale = q.shape[-1] ** -0.5
    att = torch.einsum("bmk,bnk->bmn", q * scale, k).softmax(dim=-1)
    return torch.einsum("bmn,bnk->bmk", att, v)


xf_ops.memory_efficient_attention = _mea
xf.ops = xf_ops
sys.modules["xformers"] = xf
sys.modules["xformers.ops"] = xf_ops

dcu = types.ModuleType("diffusers.configuration_utils")
dcu.ConfigMixin = object
dmm = types.ModuleType("diffusers.models.modeling_utils")
dmm.ModelMixin = torch.nn.Module
dm = types.ModuleType("diffusers.models")
dm.modeling_utils = dmm
dpkg = types.ModuleType("diffusers")
dpkg.configuration_utils = dcu
dpkg.models = dm
for name, mod in (("diffusers", dpkg),
                  ("diffusers.configuration_utils", dcu),
                  ("diffusers.models", dm),
                  ("diffusers.models.modeling_utils", dmm)):
    sys.modules[name] = mod

kiui_stub = types.ModuleType("kiui")
kcam = types.ModuleType("kiui.cam")
kcam.orbit_camera = None  # get_camera only; not on the UNet forward path
kiui_stub.cam = kcam
sys.modules["kiui"] = kiui_stub
sys.modules["kiui.cam"] = kcam

from mvdream.mv_unet import MultiViewUNetModel  # noqa: E402

# Tiny-but-complete: 2 levels, attention at both, camera embedding,
# text cross-attention. (The ip/Resampler branch has fixed 1280-dim
# internals in the reference — covered by the mapping round-trip tests.)
CFG = dict(
    image_size=8,
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    channel_mult=(1, 2),
    num_head_channels=16,
    transformer_depth=1,
    context_dim=32,
    camera_dim=16,
    ip_dim=0,
)
B, H, W, L = 1, 8, 8, 7


def _emit(cfg, frames, fname, seed_model, seed_data, with_ip):
    torch.manual_seed(seed_model)
    net = MultiViewUNetModel(**cfg).eval()

    gen = torch.Generator().manual_seed(seed_data)
    x = torch.randn(B * frames, cfg["in_channels"], H, W, generator=gen)
    t = torch.full((B * frames,), 417, dtype=torch.long)
    ctx = torch.randn(B * frames, L, cfg["context_dim"], generator=gen)
    cam = torch.randn(B * frames, cfg["camera_dim"], generator=gen)
    kw = {}
    out = {}
    if with_ip:
        # ImageDream: CLIP image tokens -> Resampler; reference latent
        # overwrites the last frame (ref: mv_unet.py:988-991).
        ip = torch.randn(B * frames, 16, 1280, generator=gen)
        ip_img = torch.randn(B, cfg["in_channels"], H, W, generator=gen)
        kw = dict(ip=ip, ip_img=ip_img)
        out["ip"] = ip.numpy().astype(np.float32)
        out["ip_img"] = ip_img.numpy().astype(np.float32)
    with torch.no_grad():
        y = net(x.clone(), timesteps=t, context=ctx, camera=cam,
                num_frames=frames, **kw)

    out.update({
        "x": x.numpy().astype(np.float32),
        "t": t.numpy().astype(np.int64),
        "context": ctx.numpy().astype(np.float32),
        "camera": cam.numpy().astype(np.float32),
        "output": y.numpy().astype(np.float32),
    })
    for k, v in net.state_dict().items():
        out["sd/" + k] = v.numpy().astype(np.float32)

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       fname)
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)}: output {tuple(y.shape)}")


def main():
    _emit(CFG, frames=4, fname="mvunet_tiny.npz",
          seed_model=4, seed_data=5, with_ip=False)
    # ImageDream variant: ip branch on, 4+1 frames (5th = ip frame).
    ip_cfg = dict(CFG, ip_dim=8, ip_weight=1.0)
    _emit(ip_cfg, frames=5, fname="mvunet_ip_tiny.npz",
          seed_model=6, seed_data=7, with_ip=True)


if __name__ == "__main__":
    main()

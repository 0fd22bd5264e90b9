"""Generate full-architecture golden fixtures (tests/golden/*_ladder.npz).

The tiny 2-down/2-up golden (gen_golden_unet.py) never exercises the real
presets' ladder structure: the big preset has 6 down blocks and 5 up
blocks whose skip connections use the asymmetric index
``down_channels[max(-2-i, -len)]`` (ref: core/unet.py:280), reaching
indices -2..-6 — the tiny config only ever hits -2. These fixtures run
the REFERENCE torch U-Net at the full big/small block structure with
width-reduced channels (structure, not width, selects the code paths;
full-width state dicts would be a 1.6 GB fixture) and small spatial size.

Also generates the 6-view LGM forward_gaussians golden from the
reference's LVIS variant (core/models_lvis.py:102 hardcodes the 6-view
reshape that the 4-view golden cannot cover).

Usage: LGM_REFERENCE=/root/reference python scripts/gen_golden_ladders.py
"""

import os
import sys
import types

os.environ["XFORMERS_DISABLED"] = "1"

ref = os.environ.get("LGM_REFERENCE", "/root/reference")
sys.path.insert(0, ref)

# --- stubs for CUDA-bound / absent reference deps (see gen_golden_lgm) --
gs_stub = types.ModuleType("core.gs")
gs_stub.GaussianRenderer = lambda opt: None
sys.modules["core.gs"] = gs_stub

kiui_stub = types.ModuleType("kiui")
lpips_stub = types.ModuleType("kiui.lpips")
lpips_stub.LPIPS = None
kiui_stub.lpips = lpips_stub
sys.modules["kiui"] = kiui_stub
sys.modules["kiui.lpips"] = lpips_stub

tyro_stub = types.ModuleType("tyro")
tyro_stub.extras = types.SimpleNamespace(
    subcommand_type_from_defaults=lambda *a, **k: None
)
sys.modules["tyro"] = tyro_stub

ipdb_stub = types.ModuleType("ipdb")
ipdb_stub.set_trace = lambda *a, **k: None
sys.modules["ipdb"] = ipdb_stub

import numpy as np  # noqa: E402
import torch  # noqa: E402

from core.unet import UNet  # noqa: E402  (reference module)
from core.options import Options  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "golden")

# Width-reduced ladders: same BLOCK structure as the presets
# (ref: core/options.py:85-106), channels /16 clamped to 32 (GroupNorm32
# needs multiples of 32). The asymmetric skip indexing and attention
# placement depend only on tuple lengths and flags.
LADDERS = {
    # lrm/small structure: 6 down, 4 up
    "unet_small_ladder": dict(
        down_channels=(32, 32, 32, 32, 64, 64),
        down_attention=(False, False, False, True, True, True),
        mid_attention=True,
        up_channels=(64, 64, 32, 32),
        up_attention=(True, True, True, False),
    ),
    # big structure: 6 down, 5 up (skip indices -2..-6)
    "unet_big_ladder": dict(
        down_channels=(32, 32, 32, 32, 64, 64),
        down_attention=(False, False, False, True, True, True),
        mid_attention=True,
        up_channels=(64, 64, 32, 32, 32),
        up_attention=(True, True, True, False, False),
    ),
}
V, H, W = 4, 64, 64  # 6 down blocks: 64 -> 2 at the mid block


def gen_unet(name, cfg, seed):
    torch.manual_seed(seed)
    net = UNet(in_channels=9, out_channels=14, layers_per_block=2,
               **cfg).eval()
    x = torch.randn(V, 9, H, W,
                    generator=torch.Generator().manual_seed(seed + 1))
    with torch.no_grad():
        y = net(x)
    out = {
        "input": x.numpy().astype(np.float32),
        "output": y.numpy().astype(np.float32),
    }
    for k, v in net.state_dict().items():
        out["sd/unet." + k] = v.numpy().astype(np.float32)
    dst = os.path.join(GOLDEN_DIR, name + ".npz")
    np.savez_compressed(dst, **out)
    n = sum(v.size for k, v in out.items() if k.startswith("sd/"))
    print(f"wrote {os.path.abspath(dst)}: {n} params, out {tuple(y.shape)}")


def gen_lgm_lvis6():
    """6-view forward_gaussians from the reference LVIS LGM variant.

    Attention is disabled in this fixture: the reference MVAttention
    hardcodes num_frames=4 (core/unet.py:24), so with V=6 it groups
    images into chunks of 4 STRADDLING scene/view boundaries (and
    crashes outright at batch 1: 6 images are not divisible into frames
    of 4). Our MVAttention attends over the configured per-scene view
    count — a deliberate fix, documented in PARITY.md — so only the
    attention-free paths (6-view reshape at models_lvis.py:102, final
    conv, activations) are reference-comparable."""
    from core.models_lvis import LGM as LGM6  # noqa: E402

    cfg = dict(
        input_size=16,
        down_channels=(32, 64),
        down_attention=(False, False),
        mid_attention=False,
        up_channels=(64, 32),
        up_attention=(False, False),
        splat_size=16,
        lambda_lpips=0.0,
        num_input_views=6,
    )
    torch.manual_seed(7)
    model = LGM6(Options(**cfg)).eval()
    x = torch.randn(1, 6, 9, 16, 16,
                    generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        gaussians = model.forward_gaussians(x)
    out = {
        "input": x.numpy().astype(np.float32),
        "output": gaussians.numpy().astype(np.float32),
    }
    for k, v in model.state_dict().items():
        out["sd/" + k] = v.numpy().astype(np.float32)
    dst = os.path.join(GOLDEN_DIR, "lgm_lvis6.npz")
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)}: out {tuple(gaussians.shape)}")


def main():
    gen_unet("unet_small_ladder", LADDERS["unet_small_ladder"], seed=10)
    gen_unet("unet_big_ladder", LADDERS["unet_big_ladder"], seed=20)
    gen_lgm_lvis6()


if __name__ == "__main__":
    main()

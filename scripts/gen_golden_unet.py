"""Generate the UNet golden-parity fixture (tests/golden/unet_tiny.npz).

Runs the REFERENCE torch multi-view U-Net (ref: core/unet.py:234-319) on
CPU with xformers disabled, at a tiny-but-structurally-complete config
(asymmetric skips, cross-view attention, GroupNorm32), and records its
randomly-initialized state dict plus one (input, output) pair.

tests/test_golden_unet.py then converts that state dict with
lgm_tpu.tools.convert_weights and asserts our Flax U-Net reproduces the
torch output — end-to-end numeric validation of the converter mapping
AND the model math, which the name-round-trip tests alone cannot give.

Usage (needs the reference checkout; the committed .npz makes the test
self-contained so CI never needs it):

    LGM_REFERENCE=/root/reference python scripts/gen_golden_unet.py
"""

import os
import sys

os.environ["XFORMERS_DISABLED"] = "1"

ref = os.environ.get("LGM_REFERENCE", "/root/reference")
sys.path.insert(0, ref)

import numpy as np  # noqa: E402
import torch  # noqa: E402

from core.unet import UNet  # noqa: E402  (reference module)

# Structurally complete tiny config: 2 down blocks (one with cross-view
# attention), attended mid, 2 up blocks (asymmetric skip indexing
# exercises down_channels[max(-2-i, -len)]). Channels are multiples of
# 32 (GroupNorm32); V=4 matches the reference MVAttention's hardcoded
# num_frames (ref: core/unet.py:24).
CFG = dict(
    in_channels=9,
    out_channels=14,
    down_channels=(32, 64),
    down_attention=(False, True),
    mid_attention=True,
    up_channels=(64, 32),
    up_attention=(True, False),
    layers_per_block=2,
)
V, H, W = 4, 16, 16


def main():
    torch.manual_seed(0)
    net = UNet(**CFG).eval()

    x = torch.randn(V, CFG["in_channels"], H, W, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        y = net(x)

    out = {
        "input": x.numpy().astype(np.float32),
        "output": y.numpy().astype(np.float32),
    }
    # Prefix "unet." to match the LGM checkpoint namespace the converter
    # expects (ref: core/models.py state_dict layout).
    for k, v in net.state_dict().items():
        out["sd/unet." + k] = v.numpy().astype(np.float32)

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "unet_tiny.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    n_params = sum(v.size for k, v in out.items() if k.startswith("sd/"))
    print(f"wrote {os.path.abspath(dst)}: {n_params} params, "
          f"output shape {y.shape}")


if __name__ == "__main__":
    main()

"""Generate the LGM forward_gaussians golden fixture
(tests/golden/lgm_tiny.npz).

Runs the REFERENCE torch LGM's `forward_gaussians` (ref:
core/models.py:88-117 — U-Net + final 1x1 conv + the
[B,4,14,s,s] -> [B, 4*s^2, 14] permute/reshape + per-attribute
activations) on CPU at a tiny config, recording state dict, input, and
output. tests/test_golden_unet.py::test_lgm_forward_gaussians_matches
then converts the state dict and asserts our Flax LGM reproduces the
output — covering, beyond the U-Net golden, the final-conv mapping, the
Gaussian ORDERING of the reshape (a scrambled order would render
garbage from converted checkpoints), and the activation chain.

CUDA-bound reference modules are stubbed at import: core.gs pins
tensors to device="cuda" in GaussianRenderer.__init__ and imports the
CUDA rasterizer; kiui/tyro are not installed here. None of them
participate in forward_gaussians.

Usage: LGM_REFERENCE=/root/reference python scripts/gen_golden_lgm.py
"""

import os
import sys
import types

os.environ["XFORMERS_DISABLED"] = "1"

ref = os.environ.get("LGM_REFERENCE", "/root/reference")
sys.path.insert(0, ref)

# --- stubs (see module docstring) --------------------------------------
gs_stub = types.ModuleType("core.gs")
gs_stub.GaussianRenderer = lambda opt: None
sys.modules["core.gs"] = gs_stub

kiui_stub = types.ModuleType("kiui")
lpips_stub = types.ModuleType("kiui.lpips")
lpips_stub.LPIPS = None  # never constructed with lambda_lpips = 0
kiui_stub.lpips = lpips_stub
sys.modules["kiui"] = kiui_stub
sys.modules["kiui.lpips"] = lpips_stub

tyro_stub = types.ModuleType("tyro")
tyro_stub.extras = types.SimpleNamespace(
    subcommand_type_from_defaults=lambda *a, **k: None
)
sys.modules["tyro"] = tyro_stub

import numpy as np  # noqa: E402
import torch  # noqa: E402

from core.models import LGM  # noqa: E402  (reference module)
from core.options import Options  # noqa: E402

CFG = dict(
    input_size=16,
    down_channels=(32, 64),
    down_attention=(False, True),
    mid_attention=True,
    up_channels=(64, 32),
    up_attention=(True, False),
    splat_size=16,
    lambda_lpips=0.0,  # skip LPIPS construction (ref: core/models.py:46-49)
)
B, V, H, W = 1, 4, 16, 16  # V=4: hardcoded in the reference reshape


def main():
    torch.manual_seed(2)
    opt = Options(**CFG)
    model = LGM(opt).eval()

    x = torch.randn(B, V, 9, H, W,
                    generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        gaussians = model.forward_gaussians(x)

    out = {
        "input": x.numpy().astype(np.float32),
        "output": gaussians.numpy().astype(np.float32),
    }
    for k, v in model.state_dict().items():
        out["sd/" + k] = v.numpy().astype(np.float32)

    dst = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "lgm_tiny.npz")
    np.savez_compressed(dst, **out)
    print(f"wrote {os.path.abspath(dst)}: output {tuple(gaussians.shape)}")


if __name__ == "__main__":
    main()

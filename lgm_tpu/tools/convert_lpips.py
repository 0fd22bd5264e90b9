"""Convert torch LPIPS(VGG-16) weights to the lgm_tpu Flax LPIPS tree.

The reference scores training renders with kiui.lpips' VGG LPIPS net
(ref: core/models.py:46-49,156-163). That metric is two torch state
dicts glued together:

  1. the torchvision ``vgg16`` backbone (``features.{i}.weight/bias``,
     convs at indices 0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28), and
  2. the LPIPS linear heads (``lin{k}.model.1.weight``, shape
     [1, C_k, 1, 1], non-negative).

This converter maps either (or both, merged) onto the flax parameter
names used by ``lgm_tpu.models.lpips.LPIPS``:

  features.{idx}.weight  -> vgg/conv{si}_{ci}/kernel   (OIHW -> HWIO)
  features.{idx}.bias    -> vgg/conv{si}_{ci}/bias
  lin{k}.model.1.weight  -> lin{k}                     ([1,C,1,1] -> [C])

and writes a flat ``.npz`` consumed by
``lgm_tpu.models.lpips.load_lpips_params``. No torchvision/network access
is needed at load time; conversion only needs the .pth/.safetensors files.

Usage:
  python -m lgm_tpu.tools.convert_lpips vgg16.pth lpips_vgg.pth out.npz
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torchvision vgg16 `features` conv indices per LPIPS stage.
_VGG16_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_lpips_state(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map torch LPIPS/VGG16 names onto flax paths ('/'-joined)."""
    out: Dict[str, np.ndarray] = {}
    # Tolerate common prefixes: '', 'net.', 'net.slice1...' is NOT handled
    # (the lpips pip package re-slices the backbone; use torchvision names).
    def get(name):
        for prefix in ("", "net.", "vgg.", "module."):
            if prefix + name in sd:
                return sd[prefix + name]
        return None

    for si, idxs in enumerate(_VGG16_CONV_IDX):
        for ci, idx in enumerate(idxs):
            w = get(f"features.{idx}.weight")
            b = get(f"features.{idx}.bias")
            if w is not None:
                # OIHW -> HWIO
                out[f"vgg/conv{si}_{ci}/kernel"] = np.transpose(
                    np.asarray(w, np.float32), (2, 3, 1, 0)
                )
            if b is not None:
                out[f"vgg/conv{si}_{ci}/bias"] = np.asarray(b, np.float32)

    for k in range(5):
        w = get(f"lin{k}.model.1.weight")
        if w is None:
            w = get(f"lins.{k}.model.1.weight")
        if w is not None:
            out[f"lin{k}"] = np.asarray(w, np.float32).reshape(-1)
    return out


def convert(vgg_path: str, lpips_path: str, out_path: str) -> int:
    merged: Dict[str, np.ndarray] = {}
    for p in (vgg_path, lpips_path):
        if p:
            merged.update(convert_lpips_state(_load_state_dict(p)))
    np.savez(out_path, **merged)
    return len(merged)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("vgg", help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("lpips", help="LPIPS lin-head state dict (.pth), "
                    "or '' to skip")
    ap.add_argument("out", help="output .npz")
    args = ap.parse_args(argv)
    n = convert(args.vgg, args.lpips, args.out)
    print(f"wrote {n} arrays -> {args.out}")


if __name__ == "__main__":
    main()

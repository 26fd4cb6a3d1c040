#!/usr/bin/env python
"""Export LPIPS-VGG weights to the .npz format ops/lpips.py loads.

This environment has no network egress and ships no pretrained VGG weights
(verified: no torchvision checkpoints, no torch-hub / keras caches), so the
lpips column in metrics.csv reads -1 ("unavailable"). Run THIS tool once on
any machine WITH egress, copy the resulting lpips_vgg.npz next to your run,
and pass `--lpips-weights lpips_vgg.npz`:

    pip install lpips torch          # one-time, on the egress machine
    python tools/export_lpips_weights.py -o lpips_vgg.npz

The reference loads the same network as TorchScript
(/root/reference/src/training/metrics/metrics.cpp:125-128,
weights/lpips_vgg.pt); this exports the identical parameters (VGG16 conv
stack + the 5 learned linear heads) as plain numpy arrays.
"""

from __future__ import annotations

import argparse
import sys


def export_from_lpips_package(out_path: str) -> None:
    """Preferred route: the `lpips` pip package (exact LPIPS v0.1 weights)."""
    import lpips  # type: ignore
    import numpy as np

    net = lpips.LPIPS(net="vgg")
    state = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    needed = [k for k in state if k.startswith(("net.slice", "lin"))]
    np.savez(out_path, **{k: state[k] for k in needed})
    print(f"wrote {out_path} ({len(needed)} arrays) from lpips.LPIPS(net='vgg')")


def export_from_torchvision(out_path: str) -> None:
    """Fallback: torchvision VGG16 + the official lpips lin-head checkpoint
    fetched from the richzhang/PerceptualSimilarity repository."""
    import io
    import urllib.request

    import numpy as np
    import torch
    from torchvision.models import vgg16

    vgg = vgg16(weights="IMAGENET1K_V1").features.eval()
    # map torchvision features indices -> ops/lpips.py slice naming
    slices = [(1, [0, 2]), (2, [5, 7]), (3, [10, 12, 14]),
              (4, [17, 19, 21]), (5, [24, 26, 28])]
    out: dict[str, np.ndarray] = {}
    for si, idxs in slices:
        for idx in idxs:
            conv = vgg[idx]
            out[f"net.slice{si}.{idx}.weight"] = conv.weight.detach().numpy()
            out[f"net.slice{si}.{idx}.bias"] = conv.bias.detach().numpy()
    url = ("https://github.com/richzhang/PerceptualSimilarity/raw/master/"
           "lpips/weights/v0.1/vgg.pth")
    with urllib.request.urlopen(url) as r:
        lin_state = torch.load(io.BytesIO(r.read()), map_location="cpu")
    for i in range(5):
        out[f"lin{i}.model.1.weight"] = lin_state[f"lin{i}.model.1.weight"].numpy()
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays) from torchvision VGG16 + "
          f"PerceptualSimilarity lin heads")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = ap.parse_args()
    try:
        export_from_lpips_package(args.output)
        return 0
    except ImportError:
        print("lpips package not installed; trying torchvision route...",
              file=sys.stderr)
    try:
        export_from_torchvision(args.output)
        return 0
    except Exception as e:
        print(f"error: both routes failed ({e}).\n"
              f"Install one of:  pip install lpips   |   pip install torchvision",
              file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())

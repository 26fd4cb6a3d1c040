"""LPIPS (VGG16 variant) in pure JAX.

Reference: src/training/metrics/metrics.hpp:54 loads a TorchScript VGG LPIPS
(`weights/lpips_vgg.pt`). Here the same network is expressed in JAX; weights
are loaded from an .npz. To produce the npz from the standard `lpips` pip
package (offline, one-time):

    import lpips, numpy as np, torch
    net = lpips.LPIPS(net='vgg')
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez('lpips_vgg.npz', **state)

Keys used: net.slice{1..5}.<idx>.weight/bias (VGG convs) and
lin{0..4}.model.1.weight (linear heads). Normalization constants match
lpips.LPIPS (shift/scale ImageNet stats).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# VGG16 conv layout: (out_channels, conv indices within torchvision features)
_SLICES = [
    (64, [0, 2]),  # relu1_2
    (128, [5, 7]),  # relu2_2
    (256, [10, 12, 14]),  # relu3_3
    (512, [17, 19, 21]),  # relu4_3
    (512, [24, 26, 28]),  # relu5_3
]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, convs: dict[int, tuple[np.ndarray, np.ndarray]], lins: list[np.ndarray]):
        self.convs = {k: (jnp.asarray(w), jnp.asarray(b)) for k, (w, b) in convs.items()}
        self.lins = [jnp.asarray(w) for w in lins]

    @staticmethod
    def from_npz(path: str) -> "LPIPS":
        data = np.load(path)
        convs = {}
        for si, (_, idxs) in enumerate(_SLICES):
            for idx in idxs:
                w = data[f"net.slice{si+1}.{idx}.weight"]
                b = data[f"net.slice{si+1}.{idx}.bias"]
                convs[idx] = (w, b)
        lins = [data[f"lin{i}.model.1.weight"][:, :, 0, 0] for i in range(5)]
        return LPIPS(convs, lins)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: [1, 3, H, W] normalized. Returns per-slice activations."""
        feats = []
        h = x
        for si, (_, idxs) in enumerate(_SLICES):
            if si > 0:
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
            for idx in idxs:
                w, b = self.convs[idx]
                h = lax.conv_general_dilated(h, w, (1, 1), "SAME", precision=lax.Precision.HIGHEST)
                h = h + b[None, :, None, None]
                h = jnp.maximum(h, 0.0)
            feats.append(h)
        return feats

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """pred/target [H, W, 3] in [0,1]; returns the LPIPS distance."""

        def prep(img):
            x = img * 2.0 - 1.0  # lpips scaling_layer input range
            x = (x - jnp.asarray(_SHIFT)[None, None, :]) / jnp.asarray(_SCALE)[None, None, :]
            return x.transpose(2, 0, 1)[None]

        f1 = self._features(prep(pred))
        f2 = self._features(prep(target))
        total = 0.0
        for a, b, lin in zip(f1, f2, self.lins):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
            d = (a - b) ** 2  # [1, C, H, W]
            # 1x1 conv with lin weights, then spatial mean
            w = lin[:, :, None, None]  # [1, C, 1, 1]
            d = jnp.sum(d * w[0][None], axis=1, keepdims=True)
            total = total + jnp.mean(d)
        return total

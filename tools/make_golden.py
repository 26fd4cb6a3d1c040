"""Freeze a trained checkpoint into the golden-statistics test fixture.

The reference validates kernels against real MipNeRF360-garden tensors
(tests/test_garden_data.cpp + tests/data/test_garden_data.pt, not shipped in
its tree either). This produces the equivalent: a compact .npz of
real-TRAINED gaussian statistics (heavy-tailed scales, bimodal opacities,
anisotropic rotations, deep tiles) from the selfcheck run's final PLY,
stored f16 to keep the repo small. tests/test_golden_data.py consumes it.

Usage: python tools/make_golden.py [trained.ply] [out.npz]
Defaults: /tmp/lfs_selfcheck/out/splat_2000.ply -> tests/data/golden_splats.npz
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lfs_selfcheck/out/splat_2000.ply")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else
               Path(__file__).resolve().parents[1] / "tests" / "data" / "golden_splats.npz")
    from lichtfeld_studio_tpu.io.ply import read_ply

    pc = read_ply(src)
    dst.parent.mkdir(parents=True, exist_ok=True)
    # f16 halves the footprint; tests compare backends against each other on
    # the SAME (dequantized) inputs, so quantization does not affect parity
    np.savez_compressed(
        dst,
        means=pc.means.astype(np.float16),
        sh0=pc.sh0.astype(np.float16),
        shN=pc.shN.astype(np.float16),
        scaling=pc.scaling.astype(np.float16),
        rotation=pc.rotation.astype(np.float16),
        opacity=pc.opacity.astype(np.float16),
    )
    print(f"golden fixture: {pc.size} gaussians -> {dst} "
          f"({dst.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()

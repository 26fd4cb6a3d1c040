"""Collect per-scene metrics.csv into the benchmark summary table
(reference eval/benchmark_mipnerf360.sh:60-120 parsing)."""
import csv
import sys
from pathlib import Path

out = Path(sys.argv[1])
rows = []
for scene_dir in sorted(p for p in out.iterdir() if p.is_dir()):
    m = scene_dir / "metrics.csv"
    if not m.exists():
        continue
    last = list(csv.DictReader(open(m)))[-1]
    rows.append((scene_dir.name, float(last["psnr"]), float(last["ssim"]),
                 float(last["lpips"]), int(last["num_gaussians"])))
if rows:
    print(f"{'scene':<10} {'PSNR':>7} {'SSIM':>7} {'LPIPS':>7} {'#gauss':>9}")
    for name, p, s, l, n in rows:
        print(f"{name:<10} {p:>7.3f} {s:>7.4f} {l:>7.4f} {n:>9}")
    n = len(rows)
    print(f"{'mean':<10} {sum(r[1] for r in rows)/n:>7.3f} "
          f"{sum(r[2] for r in rows)/n:>7.4f} {sum(r[3] for r in rows)/n:>7.4f}")

"""LichtFeld-Studio-TPU: a TPU-native 3D Gaussian Splatting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LichtFeld Studio
(reference: MrNeRF/LichtFeld-Studio, C++/CUDA/LibTorch): full 3DGS training
(ADC + MCMC densification), tile-based differentiable rasterization, COLMAP /
Blender / PLY / SOG data IO, evaluation (PSNR/SSIM/LPIPS), and headless
rendering — built TPU-first around static shapes, functional pytrees, a
sort+segmented-scan rasterizer, and Pallas tile kernels.
"""

__version__ = "0.1.0"

from lichtfeld_studio_tpu.config.parameters import (  # noqa: F401
    DatasetConfig,
    OptimizationParameters,
    TrainingParameters,
)
from lichtfeld_studio_tpu.core.splat_data import SplatData  # noqa: F401
from lichtfeld_studio_tpu.core.camera import Camera  # noqa: F401

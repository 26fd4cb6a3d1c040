from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat, quat_scale_to_cov3d  # noqa: F401
from lichtfeld_studio_tpu.ops.sh import sh_to_color  # noqa: F401
from lichtfeld_studio_tpu.ops.projection import project_gaussians, ProjectedSplats  # noqa: F401

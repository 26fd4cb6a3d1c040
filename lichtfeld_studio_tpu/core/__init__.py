from lichtfeld_studio_tpu.core.splat_data import SplatData  # noqa: F401
from lichtfeld_studio_tpu.core.camera import Camera  # noqa: F401
from lichtfeld_studio_tpu.core.point_cloud import PointCloud  # noqa: F401

from lichtfeld_studio_tpu.parallel.data_parallel import (  # noqa: F401
    make_camera_batch,
    make_dp_train_step,
)

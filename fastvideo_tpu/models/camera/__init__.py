from fastvideo_tpu.models.camera.trajectory import (  # noqa: F401
    create_camera_trajectory)

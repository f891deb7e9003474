from wisp_tpu.ops.pointcloud.processing import (create_pointcloud_from_images,
                                                normalize_pointcloud)

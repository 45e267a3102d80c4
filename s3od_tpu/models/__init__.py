from s3od_tpu.models.segmentation import (
    init_segmentation_params,
    segmentation_forward,
)

__all__ = ["init_segmentation_params", "segmentation_forward"]

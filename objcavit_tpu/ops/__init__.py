from objcavit_tpu.ops.resize import resize_bilinear
from objcavit_tpu.ops.grid_sample import grid_sample_bilinear
from objcavit_tpu.ops.roi_align import ps_roi_align_1x1
from objcavit_tpu.ops.chamfer import masked_chamfer_1d
from objcavit_tpu.ops.bins import bins_to_depth

__all__ = [
    "resize_bilinear",
    "grid_sample_bilinear",
    "ps_roi_align_1x1",
    "masked_chamfer_1d",
    "bins_to_depth",
]

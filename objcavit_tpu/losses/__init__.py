from objcavit_tpu.losses.losses import (
    LossWrapper,
    bins_chamfer_loss,
    mse_loss,
    silog_loss,
)

__all__ = ["LossWrapper", "silog_loss", "bins_chamfer_loss", "mse_loss"]

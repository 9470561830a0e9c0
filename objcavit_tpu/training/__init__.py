from objcavit_tpu.training.optim import build_optimizer
from objcavit_tpu.training.state import TrainState

__all__ = ["build_optimizer", "TrainState"]

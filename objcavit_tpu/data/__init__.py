from objcavit_tpu.data.dataset import DepthDataset, make_dataset
from objcavit_tpu.data.loader import DeviceLoader

__all__ = ["DepthDataset", "make_dataset", "DeviceLoader"]

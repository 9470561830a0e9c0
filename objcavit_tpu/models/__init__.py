from objcavit_tpu.models.adabins import AdaBins
from objcavit_tpu.models.graphbins import GraphBins

__all__ = ["AdaBins", "GraphBins"]

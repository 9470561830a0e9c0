from objcavit_tpu.metrics.metrics import (
    METRIC_NAMES,
    MetricsPreprocessConfig,
    metrics_compute,
    metrics_init,
    metrics_preprocess,
    metrics_reduce,
    metrics_sync,
    metrics_update,
)

__all__ = [
    "METRIC_NAMES",
    "MetricsPreprocessConfig",
    "metrics_init",
    "metrics_update",
    "metrics_compute",
    "metrics_reduce",
    "metrics_sync",
    "metrics_preprocess",
]

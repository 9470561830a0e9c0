"""objcavit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) monocular-depth framework.

Re-implements, TPU-first, the full capability surface of the ObjCAViT reference
(arXiv:2211.17232): AdaBins and ObjCAViT/GraphBins depth models, the frozen
YOLOv7-seg detector and CLIP language branch, the NYU/KITTI data pipelines,
losses, metrics, training/eval/predict loops, and config/CLI compatibility.

Design stance (vs. the PyTorch reference at /root/reference):
  * pure-functional models (flax.linen) — `apply(params, batch) -> pytree`
  * one jit-compiled train step (augment -> forward -> loss -> grad -> update)
  * fixed shapes everywhere: detections are padded (B, N_MAX) + validity mask
  * NHWC layout (TPU-native conv layout); bfloat16 compute where safe
  * data parallel via jax.sharding.Mesh + pjit; metric states reduced by psum
  * Pallas kernels for the hot attention blocks; XLA for convs
"""

__version__ = "0.1.0"

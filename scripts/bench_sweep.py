#!/usr/bin/env python
"""Batch-size sweep for the flagship BN-folded bf16 forward (throughput is
img/s/chip — any batch size is fair for the serving metric).

Usage: python scripts/bench_sweep.py [batches...]   (default: 8 16 24 32)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int):
    import jax.numpy as jnp

    from objcavit_tpu.utils.benchkit import best_of, build_flagship

    fwd, args = build_flagship(batch)
    holder = {}

    def run():
        holder["o"] = fwd(*args)
        return holder["o"]

    def sync(_=None):
        float(jnp.sum(holder["o"]["depth_pred"]))

    return batch / best_of(run, sync)


def main():
    from objcavit_tpu.utils.jit_cache import enable

    enable()
    batches = [int(x) for x in sys.argv[1:]] or [8, 16, 24, 32]
    for b in batches:
        try:
            print(f"batch {b:3d}: {measure(b):8.1f} img/s", flush=True)
        except Exception as e:
            print(f"batch {b:3d}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()

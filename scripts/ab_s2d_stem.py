#!/usr/bin/env python
"""A/B the space-to-depth stem rewrite on chip (bs=96, 480x640).

Times the encoder stem ConvBnAct with s2d=False vs s2d=True (identical
params), plus the full B5 encoder both ways. Validates the
SpaceToDepthConv win measured-not-assumed (models/common.py).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models.common import ConvBnAct
    from objcavit_tpu.models.efficientnet import EfficientNetEncoder
    from objcavit_tpu.utils.benchkit import best_of

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 480, 640, 3)), jnp.bfloat16
    )

    def timed(label, mod, variables, *args):
        c = jax.jit(lambda v, x: mod.apply(v, x, *args)).lower(variables, img).compile()
        holder = {}

        def run():
            holder["y"] = c(variables, img)
            return holder["y"]

        out_leaf = lambda: jax.tree_util.tree_leaves(holder["y"])[-1]
        t = best_of(run, lambda _=None: float(jnp.sum(out_leaf().astype(jnp.float32))), n_iter=8)
        print(json.dumps({"prog": label, "ms": round(t * 1000, 2)}), flush=True)

    stem_d = ConvBnAct(48, (3, 3), (2, 2), pad_style="tf", fold_bn=True,
                       s2d=False, dtype=jnp.bfloat16)
    v = stem_d.init(jax.random.PRNGKey(0), img, False)
    timed("stem dense", stem_d, v, False)
    stem_s = ConvBnAct(48, (3, 3), (2, 2), pad_style="tf", fold_bn=True,
                       s2d=True, dtype=jnp.bfloat16)
    timed("stem s2d", stem_s, v, False)

    enc = EfficientNetEncoder("efficientnet-b5", fold_bn=True, dtype=jnp.bfloat16)
    ve = enc.init(jax.random.PRNGKey(0), img, False)
    timed("encoder b5 (s2d stem)", enc, ve, False)


if __name__ == "__main__":
    main()

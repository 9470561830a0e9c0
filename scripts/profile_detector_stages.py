#!/usr/bin/env python
"""Per-stage attribution of the YOLOv7-seg backbone+neck forward on TPU.

Times CUMULATIVE PREFIXES (stem convs, ELAN/MP stages, neck) at bs=96
480x640 bf16 fold_bn, so stage cost = difference (dispatch overhead and
fusion context cancel). Companion to profile_encoder_stages.py: the
detector contributes ~150 ms of the ~464 ms fused serving batch at ~20%
MFU; this locates it.

Usage: python scripts/profile_detector_stages.py [batch=96]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from objcavit_tpu.models.yolov7 import (
        ELAN,
        ELANW,
        Conv,
        MPDown,
        RepConv,
        SPPCSPC,
    )
    from objcavit_tpu.utils.benchkit import (
        V5E_BF16_PEAK_TFLOPS,
        best_of,
        flops_of_compiled,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    h, w = 480, 640
    dt = jnp.bfloat16

    # (label, builder) applied sequentially; each returns the new x and may
    # stash taps in `aux`
    def stem01(x, aux, m):
        x = m(Conv(32, 3, dtype=dt, fold_bn=True, name="s0"), x)
        return m(Conv(64, 3, 2, dtype=dt, fold_bn=True, name="s1"), x)

    def stem23(x, aux, m):
        x = m(Conv(64, 3, dtype=dt, fold_bn=True, name="s2"), x)
        return m(Conv(128, 3, 2, dtype=dt, fold_bn=True, name="s3"), x)

    def elan1(x, aux, m):
        aux["p2"] = m(ELAN(64, 256, dtype=dt, fold_bn=True, name="elan1"), x)
        return aux["p2"]

    def mp1elan2(x, aux, m):
        x = m(MPDown(128, dtype=dt, fold_bn=True, name="mp1"), x)
        aux["p3"] = m(ELAN(128, 512, dtype=dt, fold_bn=True, name="elan2"), x)
        return aux["p3"]

    def mp2elan3(x, aux, m):
        x = m(MPDown(256, dtype=dt, fold_bn=True, name="mp2"), x)
        aux["p4"] = m(ELAN(256, 1024, dtype=dt, fold_bn=True, name="elan3"), x)
        return aux["p4"]

    def mp3elan4(x, aux, m):
        x = m(MPDown(512, dtype=dt, fold_bn=True, name="mp3"), x)
        return m(ELAN(256, 1024, dtype=dt, fold_bn=True, name="elan4"), x)

    def sppcspc(x, aux, m):
        aux["t5"] = m(SPPCSPC(512, dtype=dt, fold_bn=True, name="sppcspc"), x)
        return aux["t5"]

    def neck_up(x, aux, m):
        u4 = m(Conv(256, 1, dtype=dt, fold_bn=True, name="up4_conv"), x)
        n, hh, ww, c = u4.shape
        u4 = jax.image.resize(u4, (n, hh * 2, ww * 2, c), method="nearest")
        l4 = m(Conv(256, 1, dtype=dt, fold_bn=True, name="lat4"), aux["p4"])
        t4 = m(ELANW(256, 256, dtype=dt, fold_bn=True, name="elanw4"),
               jnp.concatenate([l4, u4], axis=-1))
        aux["t4"] = t4
        u3 = m(Conv(128, 1, dtype=dt, fold_bn=True, name="up3_conv"), t4)
        n, hh, ww, c = u3.shape
        u3 = jax.image.resize(u3, (n, hh * 2, ww * 2, c), method="nearest")
        l3 = m(Conv(128, 1, dtype=dt, fold_bn=True, name="lat3"), aux["p3"])
        aux["t3"] = m(ELANW(128, 128, dtype=dt, fold_bn=True, name="elanw3"),
                      jnp.concatenate([l3, u3], axis=-1))
        return aux["t3"]

    def neck_down(x, aux, m):
        d4 = m(MPDown(128, dtype=dt, fold_bn=True, name="down4"), x)
        t4b = m(ELANW(256, 256, dtype=dt, fold_bn=True, name="elanw4b"),
                jnp.concatenate([d4, aux["t4"]], axis=-1))
        aux["t4b"] = t4b
        d5 = m(MPDown(256, dtype=dt, fold_bn=True, name="down5"), t4b)
        t5b = m(ELANW(512, 512, dtype=dt, fold_bn=True, name="elanw5b"),
                jnp.concatenate([d5, aux["t5"]], axis=-1))
        aux["t5b"] = t5b
        return t5b

    def reps(x, aux, m):
        o3 = m(RepConv(256, dtype=dt, fold_bn=True, name="rep3"), aux["t3"])
        o4 = m(RepConv(512, dtype=dt, fold_bn=True, name="rep4"), aux["t4b"])
        o5 = m(RepConv(1024, dtype=dt, fold_bn=True, name="rep5"), x)
        return jnp.concatenate(
            [o3.reshape(b, -1)[:, :64], o4.reshape(b, -1)[:, :64],
             o5.reshape(b, -1)[:, :64]], axis=-1)

    steps = [
        ("s0+s1(/2)", stem01), ("s2+s3(/4)", stem23), ("elan1", elan1),
        ("mp1+elan2(/8)", mp1elan2), ("mp2+elan3(/16)", mp2elan3),
        ("mp3+elan4(/32)", mp3elan4), ("sppcspc", sppcspc),
        ("neck_up(PAN)", neck_up), ("neck_down", neck_down), ("repconvs", reps),
    ]

    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, 3)), jnp.bfloat16
    )

    class Prefix(nn.Module):
        upto: int

        @nn.compact
        def __call__(self, x):
            aux = {}

            def m(mod, xx):
                return mod(xx, False)

            for i, (_, fstep) in enumerate(steps):
                x = fstep(x, aux, m)
                if self.upto == i:
                    return x
            return x

    prev_ms, prev_fl = 0.0, 0.0
    for upto, (label, _) in enumerate(steps):
        mod = Prefix(upto=upto)
        variables = mod.init(rng, img)
        c = jax.jit(lambda v, x: mod.apply(v, x)).lower(variables, img).compile()
        holder = {}

        def run():
            holder["y"] = c(variables, img)
            return holder["y"]

        t = best_of(run, lambda _=None: float(jnp.sum(holder["y"].astype(jnp.float32))),
                    n_iter=4)
        fl = flops_of_compiled(c)
        ms = t * 1000
        d_ms, d_fl = ms - prev_ms, fl - prev_fl
        print(json.dumps({
            "prefix": label,
            "cum_ms": round(ms, 2),
            "stage_ms": round(d_ms, 2),
            "stage_gflops_img": round(d_fl / b / 1e9, 2),
            "stage_mfu_pct": round(d_fl / (d_ms / 1e3) / 1e12 / V5E_BF16_PEAK_TFLOPS * 100, 1) if d_ms > 0.05 else None,
            "out_shape": list(np.shape(holder["y"])),
        }), flush=True)
        prev_ms, prev_fl = ms, fl


if __name__ == "__main__":
    main()

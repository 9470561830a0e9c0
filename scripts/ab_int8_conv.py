#!/usr/bin/env python
"""A/B: bf16 conv+SiLU vs dynamic-per-tensor int8 quant -> int8 conv -> dequant.

Measures whether an int8 detector path would pay on this chip. Raw int8
conv peaks at 199.8 TOPS (1.55x bf16, scripts/speed_of_light.py probes),
but the full chain (quantize pass + conv + dequant) measures 0.85x at the
/4 detector shapes (bandwidth-bound: the quantize pass adds a full read)
and only 1.14-1.24x at /8 and deeper. Weighted by where detector time sits
(the early high-res stages), the net fused-serving gain is ~1-2%% — below
the numerics cost of quantising the frozen detector. Documented negative;
the serving default stays bf16 (docs/PERF.md).

Usage: python scripts/ab_int8_conv.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from objcavit_tpu.utils.benchkit import best_of

rng = np.random.default_rng(0)
hold = {}
# (label, B, H, W, Cin, Cout, stride) — yolov7 detector-ish shapes @480x640
cases = [("det /4 128ch", 128, 120, 160, 128, 128, 1),
         ("det /8 256ch", 128, 60, 80, 256, 256, 1),
         ("det /16 512ch", 128, 30, 40, 512, 512, 1)]

def bf16_conv(x, k):
    y = jax.lax.conv_general_dilated(x, k, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    return jax.nn.silu(y)

def int8_chain(x, kq, kscale):
    # dynamic per-tensor activation quant -> int8 conv -> dequant + silu
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
    s = amax / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(xq, kq, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * (s * kscale)[None,None,None,:]
    return jax.nn.silu(yf).astype(x.dtype)

for label, b, h, w, ci, co, st in cases:
    x = jnp.asarray(rng.standard_normal((b,h,w,ci)), jnp.bfloat16)
    k = jnp.asarray(0.03*rng.standard_normal((3,3,ci,co)), jnp.bfloat16)
    kf = np.asarray(k, np.float32)
    ks = np.abs(kf).max(axis=(0,1,2)) / 127.0
    kq = jnp.asarray(np.clip(np.round(kf/ks[None,None,None,:]),-127,127), jnp.int8)
    ksj = jnp.asarray(ks, jnp.float32)
    ca = jax.jit(bf16_conv).lower(x,k).compile()
    cb = jax.jit(int8_chain).lower(x,kq,ksj).compile()
    ya = np.asarray(ca(x,k), np.float32); yb = np.asarray(cb(x,kq,ksj), np.float32)
    err = float(np.abs(ya-yb).max()/(np.abs(ya).max()+1e-9))
    out = {"case": label, "rel_err": round(err,4)}
    for lab, c, args in (("bf16", ca, (x,k)), ("int8", cb, (x,kq,ksj))):
        def run(c=c,args=args):
            hold["o"]=c(*args); return hold["o"]
        def sync(_=None):
            float(jnp.sum(hold["o"].astype(jnp.float32)))
        out[lab+"_ms"]=round(best_of(run,sync,n_iter=10)*1000,2)
    out["speedup"]=round(out["bf16_ms"]/out["int8_ms"],2)
    print(out, flush=True)

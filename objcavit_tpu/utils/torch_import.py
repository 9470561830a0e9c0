"""PyTorch-checkpoint import: Lightning .ckpt state_dict -> flax variables.

Maps the reference's torch module tree onto this framework's parameter tree
so released checkpoints evaluate here (the AbsRel-parity requirement,
BASELINE.md). Sources of truth for key layouts:
  * GraphBinsLM state_dict prefix 'model.' (modules/GraphBinsLM.py:79-85)
  * DenseFeatureExtractor: encoder.original_model (gen-efficientnet naming:
    conv_stem/bn1/blocks.i.j.{conv_pw,bn1,conv_dw,bn2,se,conv_pwl,bn3}/
    conv_head), decoder conv2/up1..4(_net.0/1/3/4)/conv3
  * miniViT / ObjCAViT transformer stacks: torch nn.TransformerEncoder
    layers.{i}.{self_attn,linear1,linear2,norm1,norm2}, nn.MultiheadAttention
    {in_proj_weight,in_proj_bias,out_proj.*}

Weight layout conversions:
  * Linear: torch (out, in) -> flax kernel (in, out)
  * Conv2d: torch OIHW -> flax HWIO; depthwise (C,1,kh,kw) -> (kh,kw,1,C)
  * BatchNorm: weight/bias -> scale/bias; running stats -> batch_stats
  * MultiheadAttention: in_proj_weight (3E,E) -> in_proj_kernel (E,3E)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise (C, 1, kh, kw) -> flax HWIO (kh, kw, 1, C)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


class TreeBuilder:
    """Accumulates (path, array) pairs into nested param/batch_stats dicts."""

    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def put(self, tree: Dict, path: str, value: np.ndarray):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def param(self, path: str, value: np.ndarray):
        self.put(self.params, path, value)

    def stat(self, path: str, value: np.ndarray):
        self.put(self.batch_stats, path, value)

    def linear(self, sd: dict, tkey: str, fpath: str, bias: bool = True):
        self.param(f"{fpath}/kernel", t_linear(sd[f"{tkey}.weight"]))
        if bias:
            self.param(f"{fpath}/bias", sd[f"{tkey}.bias"])

    def conv(self, sd: dict, tkey: str, fpath: str, bias: bool = True,
             depthwise: bool = False):
        w = sd[f"{tkey}.weight"]
        self.param(
            f"{fpath}/kernel", t_dwconv(w) if depthwise else t_conv(w)
        )
        if bias:
            self.param(f"{fpath}/bias", sd[f"{tkey}.bias"])

    def bn(self, sd: dict, tkey: str, fpath: str):
        self.param(f"{fpath}/bn/scale", sd[f"{tkey}.weight"])
        self.param(f"{fpath}/bn/bias", sd[f"{tkey}.bias"])
        self.stat(f"{fpath}/bn/mean", sd[f"{tkey}.running_mean"])
        self.stat(f"{fpath}/bn/var", sd[f"{tkey}.running_var"])

    def mha(self, sd: dict, tkey: str, fpath: str):
        self.param(f"{fpath}/in_proj_kernel", t_linear(sd[f"{tkey}.in_proj_weight"]))
        self.param(f"{fpath}/in_proj_bias", sd[f"{tkey}.in_proj_bias"])
        self.param(f"{fpath}/out_kernel", t_linear(sd[f"{tkey}.out_proj.weight"]))
        self.param(f"{fpath}/out_bias", sd[f"{tkey}.out_proj.bias"])

    def encoder_layer(self, sd: dict, tkey: str, fpath: str):
        """torch nn.TransformerEncoderLayer -> models.layers naming."""
        self.mha(sd, f"{tkey}.self_attn", f"{fpath}/self_attn")
        self.linear(sd, f"{tkey}.linear1", f"{fpath}/linear1")
        self.linear(sd, f"{tkey}.linear2", f"{fpath}/linear2")
        for norm in ("norm1", "norm2"):
            self.param(f"{fpath}/{norm}/scale", sd[f"{tkey}.{norm}.weight"])
            self.param(f"{fpath}/{norm}/bias", sd[f"{tkey}.{norm}.bias"])

    def transformer(self, sd: dict, tkey: str, fpath: str, layers: int = 4):
        for i in range(layers):
            self.encoder_layer(sd, f"{tkey}.layers.{i}", f"{fpath}/layer{i}")


def _convert_efficientnet(tb: TreeBuilder, sd: dict, prefix: str, fpath: str,
                          encoder_name: str):
    """gen-efficientnet tf_efficientnet_b{1,5}_ap -> EfficientNetEncoder."""
    from objcavit_tpu.models.efficientnet import ENCODER_SPECS

    spec = ENCODER_SPECS[encoder_name]
    tb.conv(sd, f"{prefix}.conv_stem", f"{fpath}/stem/conv", bias=False)
    tb.bn(sd, f"{prefix}.bn1", f"{fpath}/stem/bn")
    for si, (btype, _out, depth, _k, _s, expand) in enumerate(spec.stages):
        for bi in range(depth):
            t = f"{prefix}.blocks.{si}.{bi}"
            f = f"{fpath}/stage{si}_block{bi}"
            if btype == "ds":
                tb.conv(sd, f"{t}.conv_dw", f"{f}/dw_conv", bias=False,
                        depthwise=True)
                tb.bn(sd, f"{t}.bn1", f"{f}/dw_bn")
                tb.conv(sd, f"{t}.se.conv_reduce", f"{f}/se/reduce")
                tb.conv(sd, f"{t}.se.conv_expand", f"{f}/se/expand")
                tb.conv(sd, f"{t}.conv_pw", f"{f}/project/conv", bias=False)
                tb.bn(sd, f"{t}.bn2", f"{f}/project/bn")
            else:  # mb (InvertedResidual)
                tb.conv(sd, f"{t}.conv_pw", f"{f}/expand/conv", bias=False)
                tb.bn(sd, f"{t}.bn1", f"{f}/expand/bn")
                tb.conv(sd, f"{t}.conv_dw", f"{f}/dw_conv", bias=False,
                        depthwise=True)
                tb.bn(sd, f"{t}.bn2", f"{f}/dw_bn")
                tb.conv(sd, f"{t}.se.conv_reduce", f"{f}/se/reduce")
                tb.conv(sd, f"{t}.se.conv_expand", f"{f}/se/expand")
                tb.conv(sd, f"{t}.conv_pwl", f"{f}/project/conv", bias=False)
                tb.bn(sd, f"{t}.bn3", f"{f}/project/bn")
    tb.conv(sd, f"{prefix}.conv_head", f"{fpath}/conv_head", bias=False)


def _convert_decoder(tb: TreeBuilder, sd: dict, prefix: str, fpath: str,
                     do_final_upscale: bool):
    # conv2: our ring-trick keeps a separate bias param (decoder.py)
    tb.param(f"{fpath}/conv2/kernel", t_conv(sd[f"{prefix}.conv2.weight"]))
    tb.param(f"{fpath}/conv2_bias", sd[f"{prefix}.conv2.bias"])
    ups = ["up1", "up2", "up3", "up4"] + (
        ["final_upscale"] if do_final_upscale else []
    )
    for up in ups:
        t = f"{prefix}.{up}._net"
        tb.conv(sd, f"{t}.0", f"{fpath}/{up}/conv0")
        tb.bn(sd, f"{t}.1", f"{fpath}/{up}/bn0")
        tb.conv(sd, f"{t}.3", f"{fpath}/{up}/conv1")
        tb.bn(sd, f"{t}.4", f"{fpath}/{up}/bn1")
    tb.conv(sd, f"{prefix}.conv3", f"{fpath}/conv3")


def _convert_minivit(tb: TreeBuilder, sd: dict, prefix: str, fpath: str):
    pt = f"{prefix}.patch_transformer"
    fp = f"{fpath}/patch_transformer"
    tb.conv(sd, f"{pt}.embedding_convPxP", f"{fp}/embedding_conv")
    tb.param(f"{fp}/positional_encodings", sd[f"{pt}.positional_encodings"])
    tb.transformer(sd, f"{pt}.transformer_encoder", f"{fp}/transformer")
    tb.conv(sd, f"{prefix}.conv3x3", f"{fpath}/conv3x3")
    for i, idx in enumerate((0, 2, 4)):
        tb.linear(sd, f"{prefix}.regressor.{idx}", f"{fpath}/regressor/fc{i}")


def _convert_saca(tb: TreeBuilder, sd: dict, prefix: str, fpath: str,
                  no_obj_sa: bool):
    tb.transformer(sd, f"{prefix}.image_transformer_encoder",
                   f"{fpath}/image_transformer")
    if not no_obj_sa:
        tb.transformer(sd, f"{prefix}.obj_transformer_encoder",
                       f"{fpath}/obj_transformer")
    tb.mha(sd, f"{prefix}.cross_attn_obj_im", f"{fpath}/cross_attn_obj_im")
    tb.mha(sd, f"{prefix}.cross_attn_im_obj", f"{fpath}/cross_attn_im_obj")


def _convert_objcavit(tb: TreeBuilder, sd: dict, prefix: str, fpath: str,
                      pos_strategy: str, no_obj_sa: bool, use_2_saca: bool):
    if pos_strategy in ("grid_random", "grid_random_roi_align"):
        tb.param(
            f"{fpath}/positional_encoder/positional_encodings",
            sd[f"{prefix}.positional_encoder.positional_encodings"],
        )
    else:  # learned / learned_bbox_wh: Sequential Linear at 0,2,4,6,8
        for i, idx in enumerate((0, 2, 4, 6, 8)):
            tb.linear(sd, f"{prefix}.positional_encoder.{idx}",
                      f"{fpath}/positional_encoder/fc{i}")
    tb.conv(sd, f"{prefix}.image_embedding_convPxP",
            f"{fpath}/image_embedding_conv")
    tb.linear(sd, f"{prefix}.obj_embedding_layer", f"{fpath}/obj_embedding_layer")
    _convert_saca(tb, sd, f"{prefix}.saca_1", f"{fpath}/saca_1", no_obj_sa)
    if use_2_saca:
        _convert_saca(tb, sd, f"{prefix}.saca_2", f"{fpath}/saca_2", no_obj_sa)
    tb.conv(sd, f"{prefix}.conv3x3", f"{fpath}/conv3x3")
    for i, idx in enumerate((0, 2, 4)):
        tb.linear(sd, f"{prefix}.regressor.{idx}", f"{fpath}/regressor/fc{i}")


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    model_name: str,
    encoder_name: str,
    pos_strategy: str = "learned",
    no_obj_sa: bool = False,
    use_2_saca: bool = False,
    do_final_upscale: bool = False,
) -> dict:
    """Reference Lightning state_dict -> {'params', 'batch_stats'} trees.

    state_dict keys carry the LightningModule 'model.' prefix
    (GraphBinsLM.py:79-85). Frozen detector/CLIP weights (model.detector.*,
    model.language_model.*) are skipped here — they convert separately.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    tb = TreeBuilder()
    dfe_t = "model.dense_feature_extractor"
    dfe_f = "dense_feature_extractor"
    _convert_efficientnet(
        tb, sd, f"{dfe_t}.encoder.original_model", f"{dfe_f}/encoder", encoder_name
    )
    _convert_decoder(tb, sd, f"{dfe_t}.decoder", f"{dfe_f}/decoder",
                     do_final_upscale)
    if model_name == "adabins":
        _convert_minivit(tb, sd, "model.adaptive_bins_layer",
                         "adaptive_bins_layer")
    else:
        _convert_objcavit(tb, sd, "model.objcavit", "objcavit", pos_strategy,
                          no_obj_sa, use_2_saca)
    tb.conv(sd, "model.conv_out.0", "conv_out")
    return {"params": tb.params, "batch_stats": tb.batch_stats}


def load_torch_checkpoint(path: str, args: Any = None) -> dict:
    """Load a reference Lightning .ckpt and convert to flax variables.

    Needs `args` (the config tree) to know the model family/options.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if args is None:
        raise ValueError("load_torch_checkpoint requires the config tree")
    mcfg = args[args.model.name]
    ocfg = mcfg.get("objcavit") or {}
    return convert_state_dict(
        sd,
        model_name=args.model.name,
        encoder_name=mcfg.encoder_name,
        pos_strategy=(ocfg.get("positional_embedding_strategy") or "learned"),
        no_obj_sa=bool(ocfg.get("no_obj_sa")),
        use_2_saca=bool(ocfg.get("use_2_saca")),
        do_final_upscale=bool(mcfg.get("do_final_upscale")),
    )


def load_yolov7_weights(checkpoint: str, model) -> dict:
    raise NotImplementedError(
        "YOLOv7 weight import requires the LVIS checkpoint file (not present "
        "in this image); the architecture and converter primitives are ready "
        "— wire the sequential-index mapping against the real file."
    )

"""PyTorch-checkpoint import: Lightning .ckpt state_dict -> flax variables.

Maps the reference's torch module tree onto this framework's parameter tree
so released checkpoints evaluate here (the AbsRel-parity requirement,
BASELINE.md). Sources of truth for key layouts:
  * GraphBinsLM state_dict prefix 'model.' (modules/GraphBinsLM.py:79-85)
  * DenseFeatureExtractor: encoder.original_model (gen-efficientnet naming:
    conv_stem/bn1/blocks.i.j.{conv_pw,bn1,conv_dw,bn2,se,conv_pwl,bn3}/
    conv_head for the b-series; torchvision features.{i} naming for
    efficientnet_v2_{s,m} — see _convert_efficientnet_v2), decoder
    conv2/up1..4(_net.0/1/3/4)/conv3
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


def _convert_efficientnet_v2(tb: TreeBuilder, sd: dict, prefix: str,
                             fpath: str, encoder_name: str):
    """torchvision ``efficientnet_v2_{s,m}`` -> EfficientNetEncoder.

    State-dict layout (torchvision models/efficientnet.py; the reference
    loads these via torchvision and strips only avgpool/classifier,
    DenseFeatureExtractor.py:159-168):
      features.0.{0,1}                      stem Conv2dNormActivation
      features.{s+1}.{b}.block.{i}...       stage s block b:
        FusedMBConv expand!=1: block.0 = 3x3 expand CNA, block.1 = 1x1
          project Conv+BN (no act); expand==1: block.0 alone (with act)
        MBConv: block.0 = 1x1 expand CNA, block.1 = dw CNA,
          block.2 = SqueezeExcitation (fc1/fc2 convs), block.3 = project
      features.{n_stages+1}.{0,1}           head CNA (BN+SiLU kept — see
                                            EncoderSpec.head_bn_act)
    Conv2dNormActivation children: .0 conv (no bias), .1 BN.
    """
    from objcavit_tpu.models.efficientnet import ENCODER_SPECS

    spec = ENCODER_SPECS[encoder_name]
    feats = f"{prefix}.features"
    tb.conv(sd, f"{feats}.0.0", f"{fpath}/stem/conv", bias=False)
    tb.bn(sd, f"{feats}.0.1", f"{fpath}/stem/bn")
    for si, (btype, _out, depth, _k, _s, expand) in enumerate(spec.stages):
        for bi in range(depth):
            t = f"{feats}.{si + 1}.{bi}.block"
            f = f"{fpath}/stage{si}_block{bi}"
            if btype == "fused":
                if expand != 1:
                    tb.conv(sd, f"{t}.0.0", f"{f}/expand/conv", bias=False)
                    tb.bn(sd, f"{t}.0.1", f"{f}/expand/bn")
                    tb.conv(sd, f"{t}.1.0", f"{f}/project/conv", bias=False)
                    tb.bn(sd, f"{t}.1.1", f"{f}/project/bn")
                else:
                    tb.conv(sd, f"{t}.0.0", f"{f}/project/conv", bias=False)
                    tb.bn(sd, f"{t}.0.1", f"{f}/project/bn")
            else:  # mb
                tb.conv(sd, f"{t}.0.0", f"{f}/expand/conv", bias=False)
                tb.bn(sd, f"{t}.0.1", f"{f}/expand/bn")
                tb.conv(sd, f"{t}.1.0", f"{f}/dw_conv", bias=False,
                        depthwise=True)
                tb.bn(sd, f"{t}.1.1", f"{f}/dw_bn")
                tb.conv(sd, f"{t}.2.fc1", f"{f}/se/reduce")
                tb.conv(sd, f"{t}.2.fc2", f"{f}/se/expand")
                tb.conv(sd, f"{t}.3.0", f"{f}/project/conv", bias=False)
                tb.bn(sd, f"{t}.3.1", f"{f}/project/bn")
    n_stages = len(spec.stages)
    tb.conv(sd, f"{feats}.{n_stages + 1}.0", f"{fpath}/conv_head/conv",
            bias=False)
    tb.bn(sd, f"{feats}.{n_stages + 1}.1", f"{fpath}/conv_head/bn")


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
    conv_enc = (
        _convert_efficientnet_v2
        if encoder_name.startswith("efficientnet-v2")
        else _convert_efficientnet
    )
    conv_enc(
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


# ----------------------------------------------------------------------- CLIP
#
# OpenAI CLIP text tower (modules/CLIPWrapper.py:18-24 loads ViT-B/32 and
# calls encode_text). State-dict keys: token_embedding.weight,
# positional_embedding, text_projection, ln_final.{weight,bias},
# transformer.resblocks.{i}.{attn.in_proj_weight,attn.in_proj_bias,
# attn.out_proj.*,ln_1.*,ln_2.*,mlp.c_fc.*,mlp.c_proj.*}. Visual-tower keys
# (visual.*) and logit_scale are ignored — the reference only uses encode_text.


def convert_clip_text_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """OpenAI CLIP state_dict -> models.clip_text.CLIPTextEncoder params."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()
          if not k.startswith("visual.")}
    tb = TreeBuilder()
    tb.param("token_embedding/embedding", sd["token_embedding.weight"])
    tb.param("positional_embedding", sd["positional_embedding"])
    tb.param("text_projection", sd["text_projection"])  # used as x @ P: no T
    tb.param("ln_final/scale", sd["ln_final.weight"])
    tb.param("ln_final/bias", sd["ln_final.bias"])
    n_layers = 0
    while f"transformer.resblocks.{n_layers}.ln_1.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        t = f"transformer.resblocks.{i}"
        f = f"block{i}"
        tb.param(f"{f}/attn/in_proj/kernel", t_linear(sd[f"{t}.attn.in_proj_weight"]))
        tb.param(f"{f}/attn/in_proj/bias", sd[f"{t}.attn.in_proj_bias"])
        tb.linear(sd, f"{t}.attn.out_proj", f"{f}/attn/out_proj")
        tb.linear(sd, f"{t}.mlp.c_fc", f"{f}/mlp_fc")
        tb.linear(sd, f"{t}.mlp.c_proj", f"{f}/mlp_proj")
        for ln in ("ln_1", "ln_2"):
            tb.param(f"{f}/{ln}/scale", sd[f"{t}.{ln}.weight"])
            tb.param(f"{f}/{ln}/bias", sd[f"{t}.{ln}.bias"])
    return {"params": tb.params, "info": {"layers": n_layers}}


def load_clip_text_weights(path: str) -> dict:
    """Load an OpenAI CLIP release .pt (TorchScript archive or plain
    state_dict) and convert the text tower to flax variables."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = {k: v for k, v in model.state_dict().items()}
    except RuntimeError:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    out = convert_clip_text_state_dict(sd)
    return {"params": out["params"]}


# --------------------------------------------------------------------- YOLOv7
#
# yolov7-seg (u7 branch) stores the model as one nn.Sequential; state-dict
# keys are "model.{i}.<child>" where i is the yaml layer index
# (seg/models/yolo.py parse_model). The reference consumes it through
# DetectMultiBackend (modules/Yolov7Wrapper.py:37). Tables below map each
# sequential index onto this framework's named flax modules (models/yolov7.py).
#
# Block key layouts (u7 seg/models/common.py):
#   Conv:    {i}.conv.weight (no bias) + {i}.bn.{weight,bias,running_*}
#   RepConv: {i}.rbr_dense.0/.1, {i}.rbr_1x1.0/.1 (+ rbr_identity when in==out)
#   SPPCSPC: {i}.cv1..cv7 each a Conv
#   ISegment ({i}=last): m.{k} 1x1 conv w/ bias, ia.{k}.implicit (add, pre),
#            im.{k}.implicit (mul, post), proto.cv1..cv3 Convs; plain Segment
#            has no ia/im. Implicits fuse exactly into the 1x1 conv.

# backbone/neck plain Conv layers: yaml index -> flax path inside body/
_YOLO_CONV_IDX = {
    0: "s0", 1: "s1", 2: "s2", 3: "s3",
    52: "up4_conv", 54: "lat4", 64: "up3_conv", 66: "lat3",
}
# ELAN / ELAN-W blocks: (cv1, cv2, cv3, cv4, cv5, cv6, cv7) yaml indices.
# concat order [-1,-3,-5,-6] (backbone) / [-1..-6] (head) is matched by the
# module's own concat ordering (models/yolov7.py ELAN/ELANW).
_YOLO_ELAN_IDX = {
    "elan1": (4, 5, 6, 7, 8, 9, 11),
    "elan2": (17, 18, 19, 20, 21, 22, 24),
    "elan3": (30, 31, 32, 33, 34, 35, 37),
    "elan4": (43, 44, 45, 46, 47, 48, 50),
    "elanw4": (56, 57, 58, 59, 60, 61, 63),
    "elanw3": (68, 69, 70, 71, 72, 73, 75),
    "elanw4b": (81, 82, 83, 84, 85, 86, 88),
    "elanw5b": (94, 95, 96, 97, 98, 99, 101),
}
# MP downsample blocks: (cv1 [after maxpool], cv2, cv3 [stride 2]) indices
_YOLO_MP_IDX = {
    "mp1": (13, 14, 15), "mp2": (26, 27, 28), "mp3": (39, 40, 41),
    "down4": (77, 78, 79), "down5": (90, 91, 92),
}
_YOLO_SPPCSPC_IDX = 51
_YOLO_REP_IDX = {"rep3": 102, "rep4": 103, "rep5": 104}
_YOLO_HEAD_IDX = 105


def _yolo_conv(tb: TreeBuilder, sd: dict, tkey: str, fpath: str):
    """u7 Conv (conv+bn+silu) -> flax Conv module at fpath."""
    tb.conv(sd, f"{tkey}.conv", f"{fpath}/conv", bias=False)
    tb.bn(sd, f"{tkey}.bn", fpath)


def _yolo_repconv(tb: TreeBuilder, sd: dict, tkey: str, fpath: str):
    tb.conv(sd, f"{tkey}.rbr_dense.0", f"{fpath}/rbr_dense_conv", bias=False)
    tb.param(f"{fpath}/rbr_dense_bn/scale", sd[f"{tkey}.rbr_dense.1.weight"])
    tb.param(f"{fpath}/rbr_dense_bn/bias", sd[f"{tkey}.rbr_dense.1.bias"])
    tb.stat(f"{fpath}/rbr_dense_bn/mean", sd[f"{tkey}.rbr_dense.1.running_mean"])
    tb.stat(f"{fpath}/rbr_dense_bn/var", sd[f"{tkey}.rbr_dense.1.running_var"])
    tb.conv(sd, f"{tkey}.rbr_1x1.0", f"{fpath}/rbr_1x1_conv", bias=False)
    tb.param(f"{fpath}/rbr_1x1_bn/scale", sd[f"{tkey}.rbr_1x1.1.weight"])
    tb.param(f"{fpath}/rbr_1x1_bn/bias", sd[f"{tkey}.rbr_1x1.1.bias"])
    tb.stat(f"{fpath}/rbr_1x1_bn/mean", sd[f"{tkey}.rbr_1x1.1.running_mean"])
    tb.stat(f"{fpath}/rbr_1x1_bn/var", sd[f"{tkey}.rbr_1x1.1.running_var"])
    if f"{tkey}.rbr_identity.weight" in sd:  # only when in_ch == out_ch
        tb.param(f"{fpath}/rbr_identity_bn/scale", sd[f"{tkey}.rbr_identity.weight"])
        tb.param(f"{fpath}/rbr_identity_bn/bias", sd[f"{tkey}.rbr_identity.bias"])
        tb.stat(f"{fpath}/rbr_identity_bn/mean",
                sd[f"{tkey}.rbr_identity.running_mean"])
        tb.stat(f"{fpath}/rbr_identity_bn/var",
                sd[f"{tkey}.rbr_identity.running_var"])


def _fuse_implicit_detect(sd: dict, head: str, k: int):
    """ISegment's ImplicitA (pre-add) / ImplicitM (post-mul) fused into the
    1x1 detect conv — exact for a 1x1 conv:
      y = im * (W (x + ia) + b) = (im*W) x + im*(b + W@ia)."""
    w = sd[f"{head}.m.{k}.weight"]  # (O, I, 1, 1)
    b = sd[f"{head}.m.{k}.bias"]  # (O,)
    ia_key, im_key = f"{head}.ia.{k}.implicit", f"{head}.im.{k}.implicit"
    if ia_key in sd:
        ia = sd[ia_key].reshape(-1)  # (I,)
        b = b + w.reshape(w.shape[0], -1) @ ia
    if im_key in sd:
        im = sd[im_key].reshape(-1)  # (O,)
        w = w * im[:, None, None, None]
        b = b * im
    return w, b


def convert_yolov7_state_dict(state_dict: Dict[str, np.ndarray]) -> dict:
    """yolov7-seg (u7) sequential state_dict -> flax variables + info.

    Returns {'params', 'batch_stats', 'info': {'anchors_px', 'nc', 'nm'}}.
    anchors_px is None when the ckpt carries no anchor buffer (synthetic sd).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    tb = TreeBuilder()
    body = "body"
    for idx, name in _YOLO_CONV_IDX.items():
        _yolo_conv(tb, sd, f"model.{idx}", f"{body}/{name}")
    for name, idxs in _YOLO_ELAN_IDX.items():
        for cv, idx in zip(("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"), idxs):
            _yolo_conv(tb, sd, f"model.{idx}", f"{body}/{name}/{cv}")
    for name, idxs in _YOLO_MP_IDX.items():
        for cv, idx in zip(("cv1", "cv2", "cv3"), idxs):
            _yolo_conv(tb, sd, f"model.{idx}", f"{body}/{name}/{cv}")
    for cv in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
        _yolo_conv(tb, sd, f"model.{_YOLO_SPPCSPC_IDX}.{cv}",
                   f"{body}/sppcspc/{cv}")
    for name, idx in _YOLO_REP_IDX.items():
        _yolo_repconv(tb, sd, f"model.{idx}", f"{body}/{name}")

    head = f"model.{_YOLO_HEAD_IDX}"
    for cv in ("cv1", "cv2", "cv3"):
        _yolo_conv(tb, sd, f"{head}.proto.{cv}", f"proto/{cv}")
    na = 0
    while f"{head}.m.{na}.weight" in sd:
        na += 1
    assert na == 3, f"expected 3 detect convs, found {na}"
    for k in range(3):
        w, b = _fuse_implicit_detect(sd, head, k)
        tb.param(f"detect{k}/kernel", t_conv(w))
        tb.param(f"detect{k}/bias", b)

    no3 = sd[f"{head}.m.0.weight"].shape[0]
    nm = sd[f"{head}.proto.cv3.conv.weight"].shape[0]
    nc = no3 // 3 - 5 - nm
    anchors_px = None
    if f"{head}.anchors" in sd:  # buffer is anchors / stride (u7 Detect)
        strides = np.asarray([8.0, 16.0, 32.0])
        anchors_px = sd[f"{head}.anchors"] * strides[:, None, None]
    return {
        "params": tb.params,
        "batch_stats": tb.batch_stats,
        "info": {"anchors_px": anchors_px, "nc": int(nc), "nm": int(nm)},
    }


def load_yolov7_weights(checkpoint: str, model) -> dict:
    """Load the LVIS yolov7-seg .pt (Yolov7Wrapper.py:37) -> flax variables.

    The .pt stores {'model': DetectionModel} (u7 train.py save format); fall
    back to a raw state_dict payload. `model` (Yolov7Seg) pins the expected
    class count.
    """
    import torch

    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    # attempt_load priority: EMA weights first when present (u7 experimental.py
    # loads ckpt['ema' if ckpt.get('ema') else 'model'])
    if isinstance(ckpt, dict):
        payload = ckpt.get("ema") or ckpt.get("model", ckpt)
    else:
        payload = ckpt
    if hasattr(payload, "state_dict"):
        sd = {k: v.float().numpy() for k, v in payload.state_dict().items()}
    else:
        sd = {k: np.asarray(v, np.float32) for k, v in payload.items()
              if hasattr(v, "__array__") or hasattr(v, "numpy")}
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    out = convert_yolov7_state_dict(sd)
    info = out["info"]
    if model is not None and info["nc"] != model.num_classes:
        raise ValueError(
            f"checkpoint has nc={info['nc']}, model expects {model.num_classes}"
        )
    return {"params": out["params"], "batch_stats": out["batch_stats"]}

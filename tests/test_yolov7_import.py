"""YOLOv7-seg weight import: full-model parity against a torch oracle.

The reference loads `yolov7_chkpts/yolov7-seg-lvis-e234.pt` through the u7
yolov7 submodule (modules/Yolov7Wrapper.py:37). That submodule is empty in the
snapshot and the checkpoint asset is not in this image, so the oracle here is
a from-scratch torch implementation of the published yolov7-seg architecture
(u7 branch seg/models/segment/yolov7-seg.yaml, transcribed as the SPEC table
below) with the exact u7 state-dict naming (`model.{i}.<child>`): random
weights, eval mode, forward-compared layer-for-layer against the flax model
after conversion. This pins:

  * the sequential-index -> named-module mapping in
    utils/torch_import.convert_yolov7_state_dict
  * the flax architecture's wiring (concat orders, channel widths, proto tap)
  * ImplicitA/ImplicitM fusion into the detect 1x1 convs

so the real checkpoint loads correctly the moment the asset appears.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from objcavit_tpu.utils.torch_import import convert_yolov7_state_dict  # noqa: E402

NC, NM, NA, NPR = 2, 4, 3, 256

# yolov7-seg.yaml (u7 branch), transcribed: (from, type, (c2, k, s)).
# Layer index == list position; 'from' is relative (negative) or absolute.

pytestmark = pytest.mark.slow  # full-model jit compile

SPEC = [
    (-1, "Conv", (32, 3, 1)),            # 0
    (-1, "Conv", (64, 3, 2)),            # 1  P1/2
    (-1, "Conv", (64, 3, 1)),            # 2
    (-1, "Conv", (128, 3, 2)),           # 3  P2/4
    (-1, "Conv", (64, 1, 1)),            # 4
    (-2, "Conv", (64, 1, 1)),            # 5
    (-1, "Conv", (64, 3, 1)),            # 6
    (-1, "Conv", (64, 3, 1)),            # 7
    (-1, "Conv", (64, 3, 1)),            # 8
    (-1, "Conv", (64, 3, 1)),            # 9
    ((-1, -3, -5, -6), "Concat", ()),    # 10
    (-1, "Conv", (256, 1, 1)),           # 11
    (-1, "MP", ()),                      # 12
    (-1, "Conv", (128, 1, 1)),           # 13
    (-3, "Conv", (128, 1, 1)),           # 14
    (-1, "Conv", (128, 3, 2)),           # 15
    ((-1, -3), "Concat", ()),            # 16 P3/8
    (-1, "Conv", (128, 1, 1)),           # 17
    (-2, "Conv", (128, 1, 1)),           # 18
    (-1, "Conv", (128, 3, 1)),           # 19
    (-1, "Conv", (128, 3, 1)),           # 20
    (-1, "Conv", (128, 3, 1)),           # 21
    (-1, "Conv", (128, 3, 1)),           # 22
    ((-1, -3, -5, -6), "Concat", ()),    # 23
    (-1, "Conv", (512, 1, 1)),           # 24
    (-1, "MP", ()),                      # 25
    (-1, "Conv", (256, 1, 1)),           # 26
    (-3, "Conv", (256, 1, 1)),           # 27
    (-1, "Conv", (256, 3, 2)),           # 28
    ((-1, -3), "Concat", ()),            # 29 P4/16
    (-1, "Conv", (256, 1, 1)),           # 30
    (-2, "Conv", (256, 1, 1)),           # 31
    (-1, "Conv", (256, 3, 1)),           # 32
    (-1, "Conv", (256, 3, 1)),           # 33
    (-1, "Conv", (256, 3, 1)),           # 34
    (-1, "Conv", (256, 3, 1)),           # 35
    ((-1, -3, -5, -6), "Concat", ()),    # 36
    (-1, "Conv", (1024, 1, 1)),          # 37
    (-1, "MP", ()),                      # 38
    (-1, "Conv", (512, 1, 1)),           # 39
    (-3, "Conv", (512, 1, 1)),           # 40
    (-1, "Conv", (512, 3, 2)),           # 41
    ((-1, -3), "Concat", ()),            # 42 P5/32
    (-1, "Conv", (256, 1, 1)),           # 43
    (-2, "Conv", (256, 1, 1)),           # 44
    (-1, "Conv", (256, 3, 1)),           # 45
    (-1, "Conv", (256, 3, 1)),           # 46
    (-1, "Conv", (256, 3, 1)),           # 47
    (-1, "Conv", (256, 3, 1)),           # 48
    ((-1, -3, -5, -6), "Concat", ()),    # 49
    (-1, "Conv", (1024, 1, 1)),          # 50
    # head
    (-1, "SPPCSPC", (512,)),             # 51
    (-1, "Conv", (256, 1, 1)),           # 52
    (-1, "Up", ()),                      # 53
    (37, "Conv", (256, 1, 1)),           # 54
    ((-1, -2), "Concat", ()),            # 55
    (-1, "Conv", (256, 1, 1)),           # 56
    (-2, "Conv", (256, 1, 1)),           # 57
    (-1, "Conv", (128, 3, 1)),           # 58
    (-1, "Conv", (128, 3, 1)),           # 59
    (-1, "Conv", (128, 3, 1)),           # 60
    (-1, "Conv", (128, 3, 1)),           # 61
    ((-1, -2, -3, -4, -5, -6), "Concat", ()),  # 62
    (-1, "Conv", (256, 1, 1)),           # 63
    (-1, "Conv", (128, 1, 1)),           # 64
    (-1, "Up", ()),                      # 65
    (24, "Conv", (128, 1, 1)),           # 66
    ((-1, -2), "Concat", ()),            # 67
    (-1, "Conv", (128, 1, 1)),           # 68
    (-2, "Conv", (128, 1, 1)),           # 69
    (-1, "Conv", (64, 3, 1)),            # 70
    (-1, "Conv", (64, 3, 1)),            # 71
    (-1, "Conv", (64, 3, 1)),            # 72
    (-1, "Conv", (64, 3, 1)),            # 73
    ((-1, -2, -3, -4, -5, -6), "Concat", ()),  # 74
    (-1, "Conv", (128, 1, 1)),           # 75
    (-1, "MP", ()),                      # 76
    (-1, "Conv", (128, 1, 1)),           # 77
    (-3, "Conv", (128, 1, 1)),           # 78
    (-1, "Conv", (128, 3, 2)),           # 79
    ((-1, -3, 63), "Concat", ()),        # 80
    (-1, "Conv", (256, 1, 1)),           # 81
    (-2, "Conv", (256, 1, 1)),           # 82
    (-1, "Conv", (128, 3, 1)),           # 83
    (-1, "Conv", (128, 3, 1)),           # 84
    (-1, "Conv", (128, 3, 1)),           # 85
    (-1, "Conv", (128, 3, 1)),           # 86
    ((-1, -2, -3, -4, -5, -6), "Concat", ()),  # 87
    (-1, "Conv", (256, 1, 1)),           # 88
    (-1, "MP", ()),                      # 89
    (-1, "Conv", (256, 1, 1)),           # 90
    (-3, "Conv", (256, 1, 1)),           # 91
    (-1, "Conv", (256, 3, 2)),           # 92
    ((-1, -3, 51), "Concat", ()),        # 93
    (-1, "Conv", (512, 1, 1)),           # 94
    (-2, "Conv", (512, 1, 1)),           # 95
    (-1, "Conv", (256, 3, 1)),           # 96
    (-1, "Conv", (256, 3, 1)),           # 97
    (-1, "Conv", (256, 3, 1)),           # 98
    (-1, "Conv", (256, 3, 1)),           # 99
    ((-1, -2, -3, -4, -5, -6), "Concat", ()),  # 100
    (-1, "Conv", (512, 1, 1)),           # 101
    (75, "RepConv", (256, 3, 1)),        # 102
    (88, "RepConv", (512, 3, 1)),        # 103
    (101, "RepConv", (1024, 3, 1)),      # 104
    ((102, 103, 104), "ISegment", ()),   # 105
]


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TRepConv(nn.Module):
    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        if c1 == c2 and s == 1:
            self.rbr_identity = nn.BatchNorm2d(c1, eps=1e-3)
        self.rbr_dense = nn.Sequential(
            nn.Conv2d(c1, c2, k, s, k // 2, bias=False),
            nn.BatchNorm2d(c2, eps=1e-3),
        )
        self.rbr_1x1 = nn.Sequential(
            nn.Conv2d(c1, c2, 1, s, 0, bias=False), nn.BatchNorm2d(c2, eps=1e-3)
        )
        self.act = nn.SiLU()

    def forward(self, x):
        out = self.rbr_dense(x) + self.rbr_1x1(x)
        if hasattr(self, "rbr_identity"):
            out = out + self.rbr_identity(x)
        return self.act(out)


class TSPPCSPC(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c2  # e=0.5: hidden = 2 * c2 * 0.5
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(c_, c_, 3, 1)
        self.cv4 = TConv(c_, c_, 1, 1)
        self.m = nn.ModuleList(
            nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)
            for k in (5, 9, 13)
        )
        self.cv5 = TConv(4 * c_, c_, 1, 1)
        self.cv6 = TConv(c_, c_, 3, 1)
        self.cv7 = TConv(2 * c_, c2, 1, 1)

    def forward(self, x):
        x1 = self.cv4(self.cv3(self.cv1(x)))
        y1 = self.cv6(self.cv5(torch.cat([x1] + [m(x1) for m in self.m], 1)))
        return self.cv7(torch.cat((y1, self.cv2(x)), 1))


class TProto(nn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = nn.Upsample(scale_factor=2, mode="nearest")
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TImplicitA(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.implicit = nn.Parameter(torch.randn(1, c, 1, 1) * 0.02)

    def forward(self, x):
        return x + self.implicit


class TImplicitM(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.implicit = nn.Parameter(1.0 + torch.randn(1, c, 1, 1) * 0.02)

    def forward(self, x):
        return x * self.implicit


class TISegment(nn.Module):
    """u7 ISegment: implicit layers around 1x1 detect convs + Proto."""

    def __init__(self, nc, nm, npr, ch):
        super().__init__()
        self.no = 5 + nc + nm
        self.m = nn.ModuleList(nn.Conv2d(c, self.no * NA, 1) for c in ch)
        self.ia = nn.ModuleList(TImplicitA(c) for c in ch)
        self.im = nn.ModuleList(TImplicitM(self.no * NA) for c in ch)
        self.proto = TProto(ch[0], npr, nm)
        # anchors buffer is stored in stride units (u7 Detect)
        anchors = torch.tensor(
            [
                [[12, 16], [19, 36], [40, 28]],
                [[36, 75], [76, 55], [72, 146]],
                [[142, 110], [192, 243], [459, 401]],
            ],
            dtype=torch.float32,
        ) / torch.tensor([8.0, 16.0, 32.0]).view(3, 1, 1)
        self.register_buffer("anchors", anchors)

    def forward(self, feats):
        proto = self.proto(feats[0])
        outs = [
            self.im[k](self.m[k](self.ia[k](f))) for k, f in enumerate(feats)
        ]
        return outs, proto


class TorchYolo(nn.Module):
    """Generic yaml-spec executor with u7 state-dict naming (model.{i}.*)."""

    def __init__(self):
        super().__init__()
        layers = []
        ch = [3]  # per-layer output channels; ch[i+1] = layer i's output
        for i, (frm, typ, args) in enumerate(SPEC):
            srcs = (frm,) if isinstance(frm, int) else frm
            in_ch = [ch[(s + 1) if s >= 0 else (i + s + 1)] for s in srcs]
            if typ == "Conv":
                c2, k, s = args
                layers.append(TConv(in_ch[0], c2, k, s))
            elif typ == "RepConv":
                c2, k, s = args
                layers.append(TRepConv(in_ch[0], c2, k, s))
            elif typ == "SPPCSPC":
                c2 = args[0]
                layers.append(TSPPCSPC(in_ch[0], c2))
            elif typ == "MP":
                c2 = in_ch[0]
                layers.append(nn.MaxPool2d(2, 2))
            elif typ == "Up":
                c2 = in_ch[0]
                layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
            elif typ == "Concat":
                c2 = sum(in_ch)
                layers.append(nn.Identity())
            elif typ == "ISegment":
                c2 = 0
                layers.append(TISegment(NC, NM, NPR, tuple(in_ch)))
            ch.append(c2)
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        y = []
        out = None
        for i, (frm, typ, _args) in enumerate(SPEC):
            srcs = (frm,) if isinstance(frm, int) else frm
            ins = [y[s] if s >= 0 else (x if i + s < 0 else y[i + s]) for s in srcs]
            if typ == "Concat":
                out = torch.cat(ins, 1)
            elif typ == "ISegment":
                out = self.model[i](ins)
            else:
                out = self.model[i](ins[0])
            y.append(out)
        return out


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(1 + 0.1 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(
                    1 + 0.3 * torch.rand(m.running_var.shape, generator=g)
                )


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = TorchYolo().eval()
    _randomize(model)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, sd


def test_converted_tree_matches_flax_init_structure(oracle):
    import jax

    from objcavit_tpu.models.yolov7 import Yolov7Seg

    _, sd = oracle
    out = convert_yolov7_state_dict(sd)
    fmodel = Yolov7Seg(num_classes=NC, nm=NM)
    shapes = jax.eval_shape(
        fmodel.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), np.float32),
    )

    def paths(tree):
        return {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got_p, want_p = paths(out["params"]), paths(shapes["params"])
    assert got_p == want_p, (
        f"missing={sorted(set(want_p) - set(got_p))[:5]} "
        f"extra={sorted(set(got_p) - set(want_p))[:5]}"
    )
    got_s, want_s = paths(out["batch_stats"]), paths(shapes["batch_stats"])
    assert got_s == want_s
    info = out["info"]
    assert info["nc"] == NC and info["nm"] == NM
    np.testing.assert_allclose(
        info["anchors_px"],
        np.array(
            [
                [[12, 16], [19, 36], [40, 28]],
                [[36, 75], [76, 55], [72, 146]],
                [[142, 110], [192, 243], [459, 401]],
            ],
            np.float32,
        ),
        rtol=1e-6,
    )


def test_full_forward_parity_torch_vs_flax(oracle):
    import jax

    from objcavit_tpu.models.yolov7 import Yolov7Seg

    model, sd = oracle
    out = convert_yolov7_state_dict(sd)
    variables = {"params": out["params"], "batch_stats": out["batch_stats"]}
    fmodel = Yolov7Seg(num_classes=NC, nm=NM)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_outs, t_proto = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    preds, proto = jax.jit(lambda v, im: fmodel.apply(v, im))(variables, x)

    np.testing.assert_allclose(
        np.asarray(proto), t_proto.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=2e-4,
    )
    no = 5 + NC + NM
    for k, (p, t) in enumerate(zip(preds, t_outs)):
        # flax (n, h, w, 3, no); torch (n, 3*no, h, w) with (anchor, out)-major
        tn = t.numpy().reshape(1, 3, no, *t.shape[2:]).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(
            np.asarray(p), tn, rtol=1e-4, atol=2e-4,
            err_msg=f"detect level {k}",
        )


def test_implicit_fusion_exact():
    """ia/im fusion == explicit ia -> conv -> im application (1x1 conv)."""
    from objcavit_tpu.utils.torch_import import _fuse_implicit_detect

    rng = np.random.default_rng(2)
    o, i = 12, 6
    sd = {
        "h.m.0.weight": rng.standard_normal((o, i, 1, 1)).astype(np.float32),
        "h.m.0.bias": rng.standard_normal(o).astype(np.float32),
        "h.ia.0.implicit": (0.02 * rng.standard_normal((1, i, 1, 1))).astype(
            np.float32
        ),
        "h.im.0.implicit": (1 + 0.02 * rng.standard_normal((1, o, 1, 1))).astype(
            np.float32
        ),
    }
    w, b = _fuse_implicit_detect(sd, "h", 0)
    x = rng.standard_normal((1, i, 5, 5)).astype(np.float32)
    with torch.no_grad():
        conv = nn.Conv2d(i, o, 1)
        conv.weight.copy_(torch.from_numpy(sd["h.m.0.weight"]))
        conv.bias.copy_(torch.from_numpy(sd["h.m.0.bias"]))
        want = conv(torch.from_numpy(x) + torch.from_numpy(sd["h.ia.0.implicit"]))
        want = want * torch.from_numpy(sd["h.im.0.implicit"])
        fused = nn.Conv2d(i, o, 1)
        fused.weight.copy_(torch.from_numpy(w))
        fused.bias.copy_(torch.from_numpy(b))
        got = fused(torch.from_numpy(x))
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5, atol=1e-5)


class _Payload:
    """Pickleable stand-in for a saved nn.Module (state_dict() surface)."""

    def __init__(self, d):
        self._d = d

    def state_dict(self):
        return {k: torch.from_numpy(np.asarray(v)) for k, v in self._d.items()}


def test_load_prefers_ema_weights(tmp_path, oracle):
    """u7 attempt_load priority: 'ema' over 'model' when both are present."""
    from objcavit_tpu.utils.torch_import import load_yolov7_weights

    _, sd = oracle

    zeroed = dict(sd)
    zeroed["model.0.conv.weight"] = np.zeros_like(sd["model.0.conv.weight"])
    path = tmp_path / "det.pt"
    torch.save({"model": _Payload(zeroed), "ema": _Payload(sd)}, str(path))

    class FakeModel:
        num_classes = NC

    out = load_yolov7_weights(str(path), FakeModel())
    got = np.asarray(out["params"]["body"]["s0"]["conv"]["kernel"])
    assert np.abs(got).sum() > 0, "loaded the zeroed 'model' weights, not 'ema'"

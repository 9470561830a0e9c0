"""Multi-step training-trajectory oracle (VERDICT r4 next-round #1).

The backward oracle (tests/test_backward_oracle.py) pins ONE step in
eval-mode BN. This test closes the last unpinned training axis: a lockstep
N-step run of the SAME converted init through BOTH stacks — torch autograd +
clip + AdamW + OneCycleLR (reference GraphBinsLM.py:124-146, :455-484) vs
our jit-compiled make_train_step — with BOTH models in train mode so the
BatchNorm batch statistics update every step (torch momentum-0.1 EMA with
the Bessel-corrected running variance, functional.batch_norm semantics).
Augmentation off, dropout rate 0 on both sides (RNG cannot be coupled
across frameworks; everything else about train mode is identical
arithmetic).

Compares: per-step loss, final params, and final BN running stats.

Plus a direct unit oracle for the BN momentum conversion
(models/common.py::_TorchBN vs torch.nn.BatchNorm2d(momentum=0.1)) — the
one line the trajectory depends on that previously had no direct test.

Measured drift (efficientnet-tiny topology, 10 steps, fp32): per-step loss
rel diff stays < 2e-4; final-param per-leaf rel err median ~1e-5 with a
worst leaf ~1e-3 (attention-stack cancellation noise, see the f64 oracle in
test_backward_oracle for why that is accumulation, not semantics); BN
running stats < 1e-4 rel. Wrong momentum / Bessel handling / schedule
arithmetic moves these by orders of magnitude.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from objcavit_tpu.losses import LossWrapper
from objcavit_tpu.models import GraphBins
from objcavit_tpu.models.efficientnet import ENCODER_SPECS
from objcavit_tpu.training.optim import build_optimizer
from objcavit_tpu.training.state import TrainState
from objcavit_tpu.training.steps import make_train_step
from objcavit_tpu.utils.torch_import import convert_state_dict

from tests.test_backward_oracle import _torch_bins_chamfer, _torch_silog
from tests.test_dfe_oracle import TorchEncoder, _randomize
from tests.test_fullmodel_oracle import TorchGraphBins

pytestmark = pytest.mark.slow  # N full fwd+bwd on both stacks

MIN_DEPTH, MAX_DEPTH = 0.001, 10.0
LR, WD, CLIP = 3.57e-4, 0.1, 0.1
TOTAL_STEPS = 100
N_STEPS = 10


def test_bn_momentum_running_stats_oracle():
    """models/common.BatchNorm vs torch.nn.BatchNorm2d(momentum=0.1):
    per-step outputs AND running statistics over several train-mode steps.
    Torch normalises with the biased batch variance but tracks the
    UNBIASED (n/(n-1)) one in running_var — the exact semantics _TorchBN
    implements (flax nn.BatchNorm tracks the biased one)."""
    from objcavit_tpu.models.common import BatchNorm

    rng = np.random.default_rng(0)
    bn = BatchNorm()
    x0 = jnp.asarray(rng.standard_normal((4, 5, 6, 3)).astype(np.float32))
    v = bn.init(jax.random.PRNGKey(0), x0, False)

    tbn = torch.nn.BatchNorm2d(3, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        tbn.weight.copy_(
            torch.from_numpy(np.asarray(v["params"]["bn"]["scale"]))
        )
        tbn.bias.copy_(torch.from_numpy(np.asarray(v["params"]["bn"]["bias"])))

    stats = v["batch_stats"]
    for i in range(5):
        # shifting/scaling per step so the EMA actually moves
        x = rng.standard_normal((4, 5, 6, 3)).astype(np.float32) * (1 + i) \
            + 0.3 * i
        y, mut = bn.apply(
            {"params": v["params"], "batch_stats": stats}, jnp.asarray(x),
            False, mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        with torch.no_grad():
            ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
            rtol=2e-5, atol=1e-5, err_msg=f"train-mode output, step {i}",
        )
    np.testing.assert_allclose(
        np.asarray(stats["bn"]["mean"]), tbn.running_mean.numpy(),
        rtol=1e-6, atol=1e-7, err_msg="running mean",
    )
    np.testing.assert_allclose(
        np.asarray(stats["bn"]["var"]), tbn.running_var.numpy(),
        rtol=1e-6, atol=1e-7, err_msg="running var (unbiased tracking)",
    )

    # eval mode consumes the accumulated stats identically
    ye = bn.apply({"params": v["params"], "batch_stats": stats}, x0, True)
    tbn.eval()
    with torch.no_grad():
        tye = tbn(torch.from_numpy(np.asarray(x0).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ye), tye.numpy().transpose(0, 2, 3, 1),
        rtol=2e-5, atol=1e-6, err_msg="eval-mode output",
    )


def _zero_dropout(module: tnn.Module):
    """RNG cannot be coupled across frameworks: both stacks run the oracle
    with dropout rate 0 (torch default 0.1 in TransformerEncoderLayer)."""
    for m in module.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
        if isinstance(m, tnn.MultiheadAttention):
            m.dropout = 0.0


def _make_batch(rng, b, h, w, n_max):
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.5
    gt = rng.uniform(0.0005, 9.5, (b, 1, h, w)).astype(np.float32)
    counts = [int(rng.integers(1, n_max + 1)) for _ in range(b)]
    feats = [rng.standard_normal((c, 512)).astype(np.float32) for c in counts]
    xywhs = [
        np.stack([rng.uniform(0, w, c), rng.uniform(0, h, c),
                  rng.uniform(10, 120, c), rng.uniform(10, 120, c)],
                 -1).astype(np.float32)
        for c in counts
    ]
    pf = np.zeros((b, n_max, 512), np.float32)
    px = np.full((b, n_max, 4), -1.0, np.float32)
    pv = np.zeros((b, n_max), bool)
    for i, c in enumerate(counts):
        pf[i, :c], px[i, :c], pv[i, :c] = feats[i], xywhs[i], True
    return img, gt, feats, xywhs, pf, px, pv


def test_multistep_training_trajectory_parity():
    torch.manual_seed(11)
    rng = np.random.default_rng(17)
    name = "efficientnet-tiny"
    oracle = TorchGraphBins(ENCODER_SPECS[name], enc_cls=TorchEncoder)
    _randomize(oracle, rng)
    with torch.no_grad():
        for mod in oracle.objcavit.modules():
            if isinstance(mod, (tnn.Linear, tnn.MultiheadAttention)):
                for prm in mod.parameters():
                    if prm.ndim >= 2:
                        tnn.init.xavier_uniform_(prm)
    _zero_dropout(oracle)
    oracle.train()  # BN batch statistics update every step

    b, h, w, n_max = 2, 384, 384, 3

    # ---- converted init (pre-training snapshot) --------------------------
    sd0 = {
        f"model.{k}": v.detach().clone().numpy()
        for k, v in oracle.state_dict().items()
    }
    variables = jax.tree.map(
        jnp.asarray,
        convert_state_dict(sd0, "graphbins", name,
                           pos_strategy="learned_bbox_wh"),
    )

    # grad-None leaves (cross_attn_im_obj: final_obj discarded in the
    # single-SACA config, ObjCAViT.py:366-368): torch AdamW skips them
    # entirely — no weight decay — while optax decays every leaf. They
    # cannot affect outputs; mark via a NaN-payload conversion and exclude.
    skip_sd = {}
    probe_names = set()
    for k, p in oracle.named_parameters():
        skip_sd[f"model.{k}"] = np.full_like(p.detach().numpy(), np.nan)
        probe_names.add(k)
    for k, v in oracle.state_dict().items():
        skip_sd.setdefault(f"model.{k}", np.zeros_like(v.numpy()))

    # ---- torch optimizer: reference param groups + OneCycle --------------
    enc_params = [
        p for n, p in oracle.named_parameters()
        if n.startswith("dense_feature_extractor.encoder")
    ]
    other = [
        p for n, p in oracle.named_parameters()
        if not n.startswith("dense_feature_extractor.encoder")
    ]
    opt = torch.optim.AdamW(
        [{"params": enc_params, "lr": LR / 10}, {"params": other, "lr": LR}],
        lr=LR, weight_decay=WD,
    )
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=TOTAL_STEPS, cycle_momentum=True,
        base_momentum=0.85, max_momentum=0.95, div_factor=25,
        final_div_factor=100,
    )

    # ---- jax: the REAL train step (steps.make_train_step) ----------------
    model = GraphBins(
        encoder_name=name, n_bins=256, min_depth=MIN_DEPTH,
        max_depth=MAX_DEPTH, pos_strategy="learned_bbox_wh",
        dims_train=(h, w), dims_test=(h, w), dropout_rate=0.0,
    )
    tx = build_optimizer(
        lr=LR, weight_decay=WD, total_steps=TOTAL_STEPS,
        gradient_clip_val=CLIP,
    )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    loss_wrapper = LossWrapper(["silog", "bins_chamfer"], [1, 0.1])
    train_step = jax.jit(
        make_train_step(model, tx, loss_wrapper, MIN_DEPTH,
                        augment_on_device=False, is_graphbins=True)
    )

    grad_none_names = None
    loss_rels = []
    step_rng = jax.random.PRNGKey(0)
    for step in range(N_STEPS):
        img, gt, feats, xywhs, pf, px, pv = _make_batch(rng, b, h, w, n_max)

        # torch step (reference arithmetic; Lightning order: clip then step,
        # scheduler AFTER the optimizer)
        opt.zero_grad(set_to_none=True)
        t_gt = torch.from_numpy(gt)
        t_mask = t_gt > MIN_DEPTH
        depth, edges = oracle(
            torch.from_numpy(img),
            [torch.from_numpy(f) for f in feats],
            [torch.from_numpy(x) for x in xywhs],
        )
        t_loss = _torch_silog(depth, t_gt, t_mask) + 0.1 * _torch_bins_chamfer(
            edges, t_gt, t_mask
        )
        t_loss.backward()
        if grad_none_names is None:
            grad_none_names = {
                k for k, p in oracle.named_parameters() if p.grad is None
            }
        torch.nn.utils.clip_grad_norm_(
            [p for p in oracle.parameters() if p.requires_grad], CLIP
        )
        opt.step()
        sched.step()

        # jax step
        batch = {
            "image": jnp.asarray(img.transpose(0, 2, 3, 1)),
            "depth": jnp.asarray(gt.transpose(0, 2, 3, 1)),
        }
        objects = {
            "features": jnp.asarray(pf), "xywh": jnp.asarray(px),
            "valid": jnp.asarray(pv),
        }
        step_rng, r = jax.random.split(step_rng)
        state, j_loss = train_step(state, batch, objects, r)

        rel = abs(float(j_loss) - float(t_loss.detach())) / abs(
            float(t_loss.detach())
        )
        loss_rels.append(rel)
        assert rel < 5e-4, f"step {step}: loss rel diff {rel:.2e}"

    assert int(state.step) == N_STEPS
    # drift curve stays bounded — no compounding divergence
    assert loss_rels[-1] < 5e-4 and float(np.median(loss_rels)) < 2e-4, loss_rels

    # ---- final params ----------------------------------------------------
    sdN = {
        f"model.{k}": v.detach().clone().numpy()
        for k, v in oracle.state_dict().items()
    }
    want = convert_state_dict(sdN, "graphbins", name,
                              pos_strategy="learned_bbox_wh")
    # NaN-marker tree for grad-None leaves only
    skip_sd2 = {
        k: (v if k.removeprefix("model.") in grad_none_names
            else np.zeros_like(v))
        for k, v in skip_sd.items()
    }
    skip = convert_state_dict(skip_sd2, "graphbins", name,
                              pos_strategy="learned_bbox_wh")["params"]

    flat_got = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(want["params"])[0])
    flat_skip = dict(jax.tree_util.tree_flatten_with_path(skip)[0])
    assert set(flat_got) == set(flat_want)
    rels = []
    n_skipped = 0
    for path in sorted(flat_got, key=str):
        if np.isnan(np.asarray(flat_skip[path])).any():
            n_skipped += 1
            continue
        g = np.asarray(flat_got[path], np.float64)
        w_v = np.asarray(flat_want[path], np.float64)
        err = np.linalg.norm(g - w_v)
        ref = np.linalg.norm(w_v)
        rel = err / (ref + 1e-12)
        rels.append(rel)
        assert rel < 5e-3, (
            f"final param {jax.tree_util.keystr(path)}: rel {rel:.2e} "
            f"after {N_STEPS} steps"
        )
    assert n_skipped == 4, n_skipped  # cross_attn_im_obj {in,out} x {W,b}
    assert float(np.median(rels)) < 2e-4, float(np.median(rels))

    # ---- final BN running statistics ------------------------------------
    flat_bs_got = dict(
        jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]
    )
    flat_bs_want = dict(
        jax.tree_util.tree_flatten_with_path(want["batch_stats"])[0]
    )
    assert set(flat_bs_got) == set(flat_bs_want) and flat_bs_got
    for path in sorted(flat_bs_got, key=str):
        g = np.asarray(flat_bs_got[path], np.float64)
        w_v = np.asarray(flat_bs_want[path], np.float64)
        rel = np.linalg.norm(g - w_v) / (np.linalg.norm(w_v) + 1e-12)
        assert rel < 1e-3, (
            f"BN stat {jax.tree_util.keystr(path)}: rel {rel:.2e}"
        )

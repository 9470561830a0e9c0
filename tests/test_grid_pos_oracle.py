"""Torch oracle for the grid_random / grid_random_roi_align positional
embeddings — the reference's most bizarre numerics, until now replicated only
by reading (VERDICT r2, missing #3).

Reference behaviours pinned here (/root/reference/modules/ObjCAViT.py:50-145):
  * "img" centre mode: coords arrive (B, S, 2) but the code indexes
    ``norm_coords[:, 0]`` — normalising only PATCH 0 (by grid height) and
    PATCH 1 (by grid width); every other patch keeps raw pixel coords and
    samples far outside the grid, reading 0 (grid_sample zero padding)
    (:100-103).
  * "obj" centre mode: x is normalised by image HEIGHT and y by image WIDTH
    (:105-107) — the h/w swap.
  * roi_align mode: xywh -> xyxy with aggressive clamp(min=0) (:113-131);
    spatial_scale differs between "img" (1/patch) and "obj"
    (1/(patch*factor)) (:128,:144).
  * table slicing: first ceil(fh/p)*ceil(fw/p) rows of the learnable table,
    reshaped (gh, gw, E) (:79-84).

The torch oracle uses F.grid_sample (centre mode) and the numpy
ps_roi_align kernel oracle from test_ops (roi_align mode).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from objcavit_tpu.models.objcavit import GridRandomPositionalEmbeddings

from tests.test_ops import _np_ps_roi_align_1x1

RNG = np.random.default_rng(5)


def _torch_centre(table, coords, feat_hw, patch, input_coord_space, factor=2.0):
    """Reference GridRandomPositionalEmbeddings forward, mode='centre'."""
    fh, fw = feat_hw
    gh, gw = math.ceil(fh / patch), math.ceil(fw / patch)
    grid = (
        torch.from_numpy(table[: gh * gw])
        .view(gh, gw, -1)
        .permute(2, 0, 1)
        .unsqueeze(0)
    )
    c = torch.from_numpy(coords).clone()
    if input_coord_space == "img":  # (B, S, 2); the [:, 0] indexing quirk
        c[:, 0] = ((c[:, 0] / gh) * 2) - 1
        c[:, 1] = ((c[:, 1] / gw) * 2) - 1
        c = c.unsqueeze(1)  # (B, 1, S, 2)
        g = grid.expand(c.shape[0], -1, -1, -1)
        s = F.grid_sample(input=g, grid=c)  # align_corners default False
        return s.squeeze(2).permute(0, 2, 1).contiguous().numpy()
    # "obj": (N, 2); x by image height, y by image width
    im_h, im_w = fh * factor, fw * factor
    c[:, 0] = ((c[:, 0] / im_h) * 2) - 1
    c[:, 1] = ((c[:, 1] / im_w) * 2) - 1
    c = c.view(1, 1, -1, 2)
    s = F.grid_sample(input=grid, grid=c)
    return s.squeeze(2).squeeze(0).permute(1, 0).contiguous().numpy()


def _torch_roi_align(table, xywh, feat_hw, patch, input_coord_space, factor=2.0):
    """Reference forward, mode='roi_align' (ps_roi_align via the numpy kernel
    oracle; output_size (1,1) makes PS identical to plain averaging)."""
    fh, fw = feat_hw
    gh, gw = math.ceil(fh / patch), math.ceil(fw / patch)
    grid = table[: gh * gw].reshape(gh, gw, -1)
    half = xywh[..., 2:4] / 2
    xyxy = np.concatenate(
        [xywh[..., 0:2] - half, xywh[..., 0:2] + half], axis=-1
    )
    xyxy = np.maximum(xyxy, 0.0)
    scale = 1.0 / patch if input_coord_space == "img" else 1.0 / (patch * factor)
    if xyxy.ndim == 2:  # "obj": single image's boxes
        return _np_ps_roi_align_1x1(grid, xyxy, scale)
    return np.stack([_np_ps_roi_align_1x1(grid, b, scale) for b in xyxy])


def _build(mode, feat_hw, dims=(64, 80)):
    model = GridRandomPositionalEmbeddings(
        embed_dim=16, patch_size=16, mode=mode, dims_train=dims, dims_test=dims
    )
    coords0 = jnp.zeros((1, 3, 4 if mode == "roi_align" else 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), coords0, feat_hw, "obj")
    table = RNG.uniform(0, 1, variables["params"]["positional_encodings"].shape)
    table = table.astype(np.float32)
    variables = {"params": {"positional_encodings": jnp.asarray(table)}}
    return model, variables, table


def _model_patch_coords(gh, gw, patch, b):
    """Exactly the patch-centre coords ObjCAViT builds (ObjCAViT.py:335-349):
    (x, y) centre per patch plus (patch, patch) sizes."""
    ww = np.arange(gw, dtype=np.float32) * patch + patch // 2
    hh = np.arange(gh, dtype=np.float32) * patch + patch // 2
    cw = np.broadcast_to(ww[None, :], (gh, gw)).reshape(-1)
    ch = np.broadcast_to(hh[:, None], (gh, gw)).reshape(-1)
    s = gh * gw
    pc = np.stack([cw, ch, np.full(s, float(patch)), np.full(s, float(patch))], -1)
    return np.broadcast_to(pc[None], (b, s, 4)).astype(np.float32)


def test_grid_random_img_quirk_matches_torch():
    """'img' centre mode with the model's real patch coords at FLAGSHIP scale
    (train 416x544 -> features 208x272 -> grid 13x17): only patches 0/1 get
    normalised (and land in range); the rest sample zeros."""
    fh, fw = 208, 272
    model, variables, table = _build("centre", (fh, fw), dims=(416, 544))
    coords = _model_patch_coords(13, 17, 16, b=2)[..., 0:2]
    want = _torch_centre(table, coords, (fh, fw), 16, "img")
    got = np.asarray(model.apply(variables, jnp.asarray(coords), (fh, fw), "img"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # the quirk really bites: patches >= 2 read zero, patches 0/1 don't
    assert np.abs(got[:, 2:]).max() == 0.0
    assert np.abs(got[:, :2]).max() > 0.0


def test_grid_random_obj_hw_swap_matches_torch():
    """'obj' centre mode: x normalised by image HEIGHT, y by WIDTH."""
    fh, fw = 32, 48
    model, variables, table = _build("centre", (fh, fw))
    # object centres across the full-res (64, 96) image, some out of range
    n = 7
    coords = np.stack(
        [RNG.uniform(-10, 110, n), RNG.uniform(-10, 80, n)], -1
    ).astype(np.float32)
    want = _torch_centre(table, coords, (fh, fw), 16, "obj")
    got = np.asarray(
        model.apply(variables, jnp.asarray(coords[None]), (fh, fw), "obj")
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grid_random_roi_align_obj_matches_torch():
    """roi_align 'obj' mode: xywh->xyxy clamp, scale 1/(patch*factor)."""
    fh, fw = 32, 48
    model, variables, table = _build("roi_align", (fh, fw))
    n = 6
    xywh = np.stack(
        [RNG.uniform(0, 90, n), RNG.uniform(0, 60, n),
         RNG.uniform(1, 70, n), RNG.uniform(1, 50, n)], -1
    ).astype(np.float32)
    want = _torch_roi_align(table, xywh, (fh, fw), 16, "obj")
    got = np.asarray(
        model.apply(variables, jnp.asarray(xywh[None]), (fh, fw), "obj")
    )[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_random_roi_align_img_matches_torch():
    """roi_align 'img' mode with the model's real patch boxes (scale 1/patch)."""
    fh, fw = 32, 48
    model, variables, table = _build("roi_align", (fh, fw))
    coords = _model_patch_coords(2, 3, 16, b=2)
    want = _torch_roi_align(table, coords, (fh, fw), 16, "img")
    got = np.asarray(model.apply(variables, jnp.asarray(coords), (fh, fw), "img"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_random_obj_mode_backward_exact_f64():
    """EXACT (rtol 1e-9) gradient of the learnable table through the 'obj'
    centre-mode grid_sample, float64: torch autograd vs jax.grad. Completes
    the backward-oracle coverage for the grid positional strategies (the
    full-model backward oracle runs the learned_bbox_wh MLP strategy);
    grid_sample here is pure-jnp gather math whose VJP this pins."""
    fh, fw = 32, 48
    patch, e = 16, 16
    gh, gw = fh // patch, fw // patch
    dims = (64, 96)
    model = GridRandomPositionalEmbeddings(
        embed_dim=e, patch_size=patch, mode="centre", dims_train=dims,
        dims_test=dims, dtype=jnp.float64,
    )
    n = 9
    table_np = RNG.uniform(0, 1, (math.ceil(dims[0] / patch)
                                  * math.ceil(dims[1] / patch), e))
    coords = np.stack(
        [RNG.uniform(-10, 110, n), RNG.uniform(-10, 80, n)], -1
    )  # includes out-of-range points (zero-pad region: zero table grad)
    r = RNG.standard_normal((n, e))

    # torch f64 autograd through F.grid_sample
    t_table = torch.from_numpy(table_np).clone().requires_grad_(True)
    grid = (
        t_table[: gh * gw].view(gh, gw, e).permute(2, 0, 1).unsqueeze(0)
    )
    c = torch.from_numpy(coords).clone()
    im_h, im_w = fh * 2.0, fw * 2.0
    c0 = ((c[:, 0] / im_h) * 2) - 1
    c1 = ((c[:, 1] / im_w) * 2) - 1
    cg = torch.stack([c0, c1], -1).view(1, 1, -1, 2)
    out = torch.nn.functional.grid_sample(input=grid, grid=cg)
    loss = (out.squeeze(2).squeeze(0).permute(1, 0)
            * torch.from_numpy(r)).sum()
    loss.backward()

    with jax.enable_x64():
        def loss_fn(tbl):
            got = model.apply(
                {"params": {"positional_encodings": tbl}},
                jnp.asarray(coords[None]), (fh, fw), "obj",
            )[0]
            return jnp.sum(got * jnp.asarray(r))

        g = jax.grad(loss_fn)(jnp.asarray(table_np, jnp.float64))
    np.testing.assert_allclose(
        np.asarray(g), t_table.grad.numpy(), rtol=1e-9, atol=1e-12
    )
    # out-of-range samples must have contributed ZERO table gradient rows
    # only if no coordinate maps there; in-range rows must be nonzero
    assert np.abs(np.asarray(g)).max() > 0

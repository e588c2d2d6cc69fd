"""End-to-end golden test of the fused map update against a torch oracle.

The oracle below independently re-derives the reference map-update semantics
(SURVEY.md §1 L2; /root/reference/nav/agent/mapping.py:52-179) using torch
primitives, and the jnp implementation must agree to float tolerance.  It runs
small geometry (32x32 frames, vision range 24) to keep CI fast.
"""

import itertools

import numpy as np
import pytest

from peanut_tpu.config import NavConfig
from peanut_tpu.mapping import SemanticMapper, MapperParams

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


SMALL = dict(
    frame_height=32, frame_width=32, vision_range=24, map_size_cm=480,
    map_resolution=5, global_downscaling=1, num_sem_categories=10,
    camera_height=0.88, hfov=79.0, du_scale=1,
)


def oracle_step(p, obs, pose_delta, maps_last, poses_last):
    """torch reimplementation of the reference per-step map update (bs=1)."""
    obs = torch.from_numpy(obs)
    pose_delta = torch.from_numpy(pose_delta)
    maps_last = torch.from_numpy(maps_last)
    poses_last = torch.from_numpy(poses_last)
    bs, c, h, w = obs.shape
    vr = p.vision_range
    res = p.resolution
    nz = p.max_h_idx - p.min_h_idx
    local_m = p.map_size_cm // res

    # camera model
    xc, zc = (w - 1.0) / 2.0, (h - 1.0) / 2.0
    f = (w / 2.0) / np.tan(np.deg2rad(p.hfov / 2.0))
    depth = obs[:, 3]
    gx = torch.arange(w).float()[None, None, :].expand(bs, h, w)
    gz = torch.arange(h - 1, -1, -1).float()[None, :, None].expand(bs, h, w)
    X = (gx - xc) * depth / f
    Z = (gz - zc) * depth / f
    pc = torch.stack([X, depth, Z], dim=-1)
    pc[..., 2] += p.agent_height_cm
    # shift_loc: rotation angle 0, translate x by vr*res//2
    pc[..., 0] += vr * res // 2

    xyz = pc.clone()
    xyz[..., :2] = (xyz[..., :2] / res - vr // 2.0) / vr * 2.0
    xyz[..., 2] = ((xyz[..., 2] / res) - (p.max_h_idx + p.min_h_idx) // 2.0) \
        / (p.max_h_idx - p.min_h_idx) * 2.0

    feat = torch.ones(bs, 1 + p.num_sem_categories, h * w)
    feat[:, 1:, :] = obs[:, 4:].reshape(bs, c - 4, h * w)

    coords = xyz.permute(0, 3, 1, 2).reshape(bs, 3, h * w)

    # stair heuristic
    zs = coords[0, 2]
    sel = zs[(zs > -1) & (zs < 1)] * 2 + 1.6
    if len(sel) > 0 and torch.quantile(sel, 0.03) > 0.2 and \
            torch.sum((sel > 0.2) & (sel < 0.7)) > 0.2 * len(sel):
        below = coords[0, 2] * 2 + 1.6 < 0.7
        no_toilet = feat[0, 1 + 4] == 0
        coords[:, :, below & no_toilet] = 99999

    # trilinear splat with per-corner rounding
    grid_dims = (vr, vr, nz)
    grid_flat = torch.zeros(bs, 1 + p.num_sem_categories,
                            vr * vr * nz)
    pos_dim, wts_dim = [], []
    for d in range(3):
        pos = coords[:, [d], :] * grid_dims[d] / 2 + grid_dims[d] / 2
        pd, wd = [], []
        for ix in (0, 1):
            pos_ix = torch.floor(pos) + ix
            safe = ((pos_ix > 0) & (pos_ix < grid_dims[d])).float()
            wd.append((1 - torch.abs(pos - pos_ix)) * safe)
            pd.append(pos_ix * safe)
        pos_dim.append(pd)
        wts_dim.append(wd)
    for ix_d in itertools.product(*([(0, 1)] * 3)):
        wts = torch.ones_like(wts_dim[0][0])
        index = torch.zeros_like(wts_dim[0][0])
        for d in range(3):
            index = index * grid_dims[d] + pos_dim[d][ix_d[d]]
            wts = wts * wts_dim[d][ix_d[d]]
        grid_flat.scatter_add_(
            2, index.long().expand(-1, 1 + p.num_sem_categories, -1),
            feat * wts)
        grid_flat = torch.round(grid_flat)
    voxels = grid_flat.view(bs, -1, vr, vr, nz).transpose(2, 3)

    min_z = int(25 / res - p.min_h_idx)
    max_z = int((p.agent_height_cm + 1) / res - p.min_h_idx)
    ahp = voxels[..., min_z:max_z].sum(4)
    allp = voxels.sum(4)
    ahp[:, 1 + 5] = allp[:, 1 + 5]
    ahp[:, 1 + 2] = allp[:, 1 + 2]

    fp_map = torch.clamp(ahp[:, 0:1] / p.map_pred_threshold, 0, 1)
    fp_exp = torch.clamp(allp[:, 0:1] / p.exp_pred_threshold, 0, 1)

    agent_view = torch.zeros(bs, c, local_m, local_m)
    x1 = local_m // 2 - vr // 2
    y1 = local_m // 2
    agent_view[:, 0:1, y1:y1 + vr, x1:x1 + vr] = fp_map
    agent_view[:, 1:2, y1:y1 + vr, x1:x1 + vr] = fp_exp
    agent_view[:, 4:, y1:y1 + vr, x1:x1 + vr] = torch.clamp(
        ahp[:, 1:] / p.cat_pred_threshold, 0, 1)

    # pose integration (degrees)
    pose = poses_last.clone()
    rad = pose[:, 2] / 57.29577951308232
    pose[:, 1] += pose_delta[:, 0] * torch.sin(rad) + pose_delta[:, 1] * torch.cos(rad)
    pose[:, 0] += pose_delta[:, 0] * torch.cos(rad) - pose_delta[:, 1] * torch.sin(rad)
    pose[:, 2] += pose_delta[:, 2] * 57.29577951308232
    pose[:, 2] = torch.fmod(pose[:, 2] - 180.0, 360.0) + 180.0
    pose[:, 2] = torch.fmod(pose[:, 2] + 180.0, 360.0) - 180.0

    st = pose.clone()
    st[:, :2] = -(st[:, :2] * 100.0 / res - local_m // 2) / (local_m // 2)
    st[:, 2] = 90.0 - st[:, 2]
    t = st[:, 2] * np.pi / 180.0
    zeros = torch.zeros_like(t)
    ones = torch.ones_like(t)
    th1 = torch.stack([torch.stack([t.cos(), -t.sin(), zeros], 1),
                       torch.stack([t.sin(), t.cos(), zeros], 1)], 1)
    th2 = torch.stack([torch.stack([ones, zeros, st[:, 0]], 1),
                       torch.stack([zeros, ones, st[:, 1]], 1)], 1)
    size = torch.Size((bs, c, local_m, local_m))
    rot = F.grid_sample(agent_view, F.affine_grid(th1, size), align_corners=True)
    tra = F.grid_sample(rot, F.affine_grid(th2, size), align_corners=True)
    fused = torch.max(torch.stack([maps_last, tra], 1), 1)[0]
    return fp_map.numpy(), fused.numpy(), pose.numpy()


def make_inputs(rng, cfg, bs=1, stairs=False):
    c = cfg.num_map_channels
    h, w = cfg.frame_height, cfg.frame_width
    obs = np.zeros((bs, c, h, w), np.float32)
    obs[:, :3] = rng.rand(bs, 3, h, w) * 255
    if stairs:
        # depth pattern that puts most points on a low raised surface
        obs[:, 3] = 60.0 + rng.rand(bs, h, w) * 10.0
    else:
        obs[:, 3] = 50.0 + rng.rand(bs, h, w) * 400.0
    obs[:, 4:] = (rng.rand(bs, c - 4, h, w) > 0.9).astype(np.float32)
    pose_delta = (rng.rand(bs, 3).astype(np.float32) - 0.5) * np.array(
        [0.5, 0.5, 0.6], np.float32)
    local_m = cfg.map_size_cm // cfg.map_resolution // cfg.global_downscaling
    maps_last = (rng.rand(bs, c, local_m, local_m) > 0.8).astype(np.float32)
    poses_last = np.tile(
        np.array([[cfg.map_size_cm / 100.0 / 2.0,
                   cfg.map_size_cm / 100.0 / 2.0, 0.0]], np.float32), (bs, 1))
    poses_last[:, 2] = (rng.rand(bs) - 0.5) * 300.0
    return obs, pose_delta, maps_last, poses_last


@pytest.mark.parametrize("stairs", [False, True])
def test_map_update_matches_oracle(rng, stairs):
    cfg = NavConfig(**SMALL)
    mapper = SemanticMapper(cfg)
    p = mapper.params
    obs, pose_delta, maps_last, poses_last = make_inputs(rng, cfg, stairs=stairs)

    fp, fused, pose = [np.asarray(x) for x in
                       mapper(obs, pose_delta, maps_last, poses_last)]
    fp_o, fused_o, pose_o = oracle_step(p, obs, pose_delta, maps_last, poses_last)

    np.testing.assert_allclose(pose, pose_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(fp, fp_o, rtol=1e-4, atol=1e-4)
    mismatch = np.abs(fused - fused_o) > 1e-3
    # allow a vanishing fraction of boundary-pixel disagreements from
    # float associativity in the scatter + bilinear taps
    assert mismatch.mean() < 1e-4, f"fused map mismatch {mismatch.mean()}"


def test_map_update_batched_consistency(rng):
    cfg = NavConfig(**SMALL)
    mapper = SemanticMapper(cfg)
    obs, pd, ml, pl = make_inputs(rng, cfg, bs=3)
    fp, fused, pose = mapper(obs, pd, ml, pl)
    for i in range(3):
        fpi, fusedi, posei = mapper(obs[i:i + 1], pd[i:i + 1],
                                    ml[i:i + 1], pl[i:i + 1])
        np.testing.assert_allclose(np.asarray(fused[i]), np.asarray(fusedi[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pose[i]), np.asarray(posei[0]),
                                   atol=1e-5)

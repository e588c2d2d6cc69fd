"""Parallel-episode runtime: N agents, ONE device program per tick.

This is the framework's flagship throughput path (BASELINE config 5) and has
no reference counterpart — the reference steps ONE habitat env per process
(SURVEY.md §2.3).  Architecture:

  * the whole per-tick pipeline — observation assembly, point scatters,
    mapping, window shuttling, target prediction + geodesic value weighting
    (trigger ticks), found-goal extraction, traversibility and the batched
    geodesic planning solve — is ONE jit program (two variants: with /
    without the prediction branch), so each tick costs one dispatch + one
    packed download regardless of batch size;
  * observations upload as uint8 semantics + f32 depth only (rgb is unused
    by the mapping pipeline and zero-filled on device) and expand on
    device — 3x less host->device traffic;
  * pose integration runs HOST-side (numpy f32 twin shared with the
    single-env agent), so the host state machines and the device programs
    agree on agent cells by construction; lmb windows, collision points and
    visited-line cells are host-computed from those poses and passed in;
  * all maps are device-resident state arrays threaded functionally through
    the fused program (donated buffers);
  * rare control paths (replan-with-erosion, goal magnification) fall back
    to focused device/host solves with identical semantics.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NavConfig
from ..constants import hm3d_names, hm3d_to_coco
from ..geometry.pose import (get_rel_pose_change, get_l2_distance,
                             integrate_pose_np, threshold_poses)
from ..kernels import eikonal_distance, masked_fill_unreachable
from ..kernels.morphology import disk, np_binary_dilation, np_binary_erosion
from ..mapping import SemanticMapper
from ..perception import preprocess_depth, build_segmenter
from ..planning import FMMPlanner, UnTrapHelper
from ..planning.fmm_planner import step_mask, step_dist
from ..prediction import PredictionModel
from . import batched_ops as B

CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
N_LINE_PTS = 104   # 26 samples x 2x2 squares
N_COL_PTS = 8


class DeviceState(NamedTuple):
    """All device-resident per-episode arrays (threaded functionally)."""
    local_maps: jnp.ndarray    # (B, nc, Hl, Wl)
    full_maps: jnp.ndarray     # (B, nc, Hf, Wf)
    collision: jnp.ndarray     # (B, Hf, Wf)
    visited: jnp.ndarray       # (B, Hf, Wf)
    target_pred: jnp.ndarray   # (B, Hl, Wl)
    dd_wt: jnp.ndarray         # (B, Hl, Wl)
    dd_valid: jnp.ndarray      # (B,) bool
    cur_goal: jnp.ndarray      # (B, 2) int32
    last_goal: jnp.ndarray     # (B, 2) int32
    last_goal_valid: jnp.ndarray  # (B,) bool


class TickHandle(NamedTuple):
    """In-flight tick: the async device output plus the host-side values
    the collect phase needs (act_batch_dispatch -> act_batch_collect)."""
    packed: object             # (B, 125) device array, still computing
    starts: np.ndarray
    starts_exact: np.ndarray
    lmb_new: np.ndarray
    goal_cats: np.ndarray
    no_erode: np.ndarray
    is_toilet: np.ndarray
    poses_new: np.ndarray
    trig: np.ndarray
    stop_now: np.ndarray
    hp_dev: object = None      # device host_pack (pred_async reuses it)
    trig_idxs: object = None   # (B,) int32 padded trigger indices


@dataclass
class EnvSlot:
    """Per-episode host scalars (the sequential state machines)."""
    step: int = 0
    l_step: int = 0
    timestep: int = 0
    goal_name: str = ""
    found_goal: int = 0
    dist_to_goal: float = 1e9
    preset_id: int = 0
    origins: np.ndarray = field(default_factory=lambda: np.zeros(3))
    lmb: np.ndarray = field(default_factory=lambda: np.zeros(4, np.int32))
    pose_inputs: np.ndarray = field(default_factory=lambda: np.zeros(7))
    last_sim_location: Optional[tuple] = None
    # planner state
    curr_loc: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    last_loc: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    last_action: Optional[int] = None
    previous_action: int = -1
    col_width: int = 1
    prev_blocked: int = 0
    forward_after_stop: int = 1
    untrap: UnTrapHelper = field(default_factory=UnTrapHelper)


class BatchedNavRuntime:
    BLOCK_THRESHOLD = 4

    def __init__(self, cfg: NavConfig, num_envs: int,
                 prediction_model: Optional[PredictionModel] = None,
                 segmenter=None, predict_chunk: int = 8, mesh=None,
                 mesh_axis: str = "data", use_shard_map: bool = False):
        """mesh: optional jax.sharding.Mesh — when given, all per-episode
        device state shards its batch axis over ``mesh_axis`` so the fused
        tick program runs SPMD across chips (episodes are embarrassingly
        parallel; the reference's one-env-per-process NCCL analog)."""
        self.cfg = cfg
        self.n = num_envs
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # shard_map per-device execution of the tick programs: GSPMD
        # cannot partition the Pallas custom calls and replicates them
        # (measured 6.6x the unsharded time on identical work,
        # scripts/measure_scaling.py) — shard_map fixes that, but its
        # 1-core CPU compile cost could not be bounded within round 5,
        # so the driver-validated GSPMD path stays the default
        # (docs/SCALING.md).
        self.use_shard_map = use_shard_map
        if mesh is not None:
            ax = mesh.shape[mesh_axis]
            if num_envs % ax:
                raise ValueError(
                    f"num_envs={num_envs} not divisible by mesh axis "
                    f"'{mesh_axis}'={ax}")
        self.mapper = SemanticMapper(cfg)
        self.segmenter = segmenter if segmenter is not None \
            else build_segmenter(cfg)
        if cfg.only_explore == 0 and prediction_model is None:
            prediction_model = PredictionModel(cfg)
        self.pred_model = prediction_model if cfg.only_explore == 0 else None
        self.predict_chunk = min(predict_chunk, num_envs)

        self.nc = cfg.num_map_channels
        self.Hf = self.Wf = cfg.map_size
        self.Hl = self.Wl = int(self.Hf / cfg.global_downscaling)
        self.selem_idx = np.where(disk(cfg.col_rad + 1) > 0)
        self.presets = [(0.1, 0.1), (0.9, 0.1), (0.9, 0.9), (0.1, 0.9)]
        self.edge_buffer = 10 if cfg.num_sem_categories <= 16 else 40

        from ..utils.profiler import StageTimer
        self.timer = StageTimer()
        self.slots = [EnvSlot() for _ in range(num_envs)]
        # host shadows of device goal state (for triggers / stamping inputs)
        self.goal_shadow = np.zeros((num_envs, 2), np.int32)
        self.local_poses = np.zeros((num_envs, 3), np.float32)

        self.state = self._alloc_state()
        self._build_program()
        self._pool = ThreadPoolExecutor(max_workers=min(num_envs, 16))
        # pending point-scatter buffers (computed host-side each tick)
        self._clear_pending()
        # pred_async serving mode: the prediction/goal program dispatches
        # AFTER the tick's collect phase so it overlaps host env stepping;
        # the goal download lands at the next dispatch (one-tick goal lag)
        self._pred_async = bool(getattr(cfg, "pred_async", 0)) \
            and self.pred_model is not None
        self._pending_goal = None
        self._reset_since_pred = np.zeros(num_envs, bool)
        import threading as _threading
        self._reset_lock = _threading.Lock()
        # chunked-detect pipeline: stage_obs launches a detect chunk as
        # soon as seg_chunk envs have finished stepping, overlapping
        # detection with the remaining envs' stepping and the host logic
        import threading
        self._det_lock = threading.Lock()
        self._det_buf: list = []
        self._seg_chunk = int(getattr(self.segmenter, "chunk", 0) or 0)

    # ------------------------------------------------------------------
    def _alloc_state(self) -> DeviceState:
        n, nc = self.n, self.nc
        state = self._alloc_state_host()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(self.mesh_axis))
            state = DeviceState(*(jax.device_put(x, sh) for x in state))
        return state

    def _alloc_state_host(self) -> DeviceState:
        n, nc = self.n, self.nc
        return DeviceState(
            local_maps=jnp.zeros((n, nc, self.Hl, self.Wl), jnp.float32),
            full_maps=jnp.zeros((n, nc, self.Hf, self.Wf), jnp.float32),
            collision=jnp.zeros((n, self.Hf, self.Wf), jnp.float32),
            visited=jnp.zeros((n, self.Hf, self.Wf), jnp.float32),
            target_pred=jnp.zeros((n, self.Hl, self.Wl), jnp.float32),
            dd_wt=jnp.zeros((n, self.Hl, self.Wl), jnp.float32),
            dd_valid=jnp.zeros((n,), bool),
            cur_goal=jnp.zeros((n, 2), jnp.int32),
            last_goal=jnp.full((n, 2), -1, jnp.int32),
            last_goal_valid=jnp.zeros((n,), bool),
        )

    def _clear_pending(self):
        n = self.n
        self._line_pts = np.zeros((n, N_LINE_PTS, 2), np.int32)
        self._line_valid = np.zeros((n, N_LINE_PTS), bool)
        self._col_pts = np.zeros((n, N_COL_PTS, 2), np.int32)
        self._col_valid = np.zeros((n, N_COL_PTS), bool)

    # ------------------------------------------------------------------
    def _build_program(self):
        cfg = self.cfg
        res = cfg.map_resolution
        sel_r = np.asarray(self.selem_idx[0], np.int32)
        sel_c = np.asarray(self.selem_idx[1], np.int32)
        off = int(cfg.col_rad + 1)
        pw = cfg.prediction_window
        px1 = self.Hf // 2 - pw // 2
        py1 = self.Wf // 2 - pw // 2
        temperature = cfg.dist_weight_temperature / cfg.map_resolution
        pred_infer = None
        if self.pred_model is not None:
            model = self.pred_model.model
            pred_vars = self.pred_model.variables

            def pred_infer(crop_chw):
                nhwc = jnp.transpose(crop_chw, (0, 2, 3, 1))
                logits = model.apply(pred_vars, nhwc, method=model.inference)
                return jax.nn.sigmoid(jnp.transpose(logits, (0, 3, 1, 2)))

        def scatter_pts(grid, pts, valid):
            h, w = grid.shape[1], grid.shape[2]
            rows = jnp.clip(pts[..., 0], 0, h - 1)
            cols = jnp.clip(pts[..., 1], 0, w - 1)
            return jax.vmap(lambda g, r, c, v: g.at[r, c].max(
                v.astype(g.dtype)))(grid, rows, cols, valid)

        # host_pack layout (one f32 upload for all per-tick scalars):
        #   [0:3] pose (pre-rebase, mapper frame) | [3:7] lmb_old
        #   [7:11] lmb_new | [11] goal_cat | [12] no_erode | [13] is_toilet
        #   [14] trig | [15:17] preset_cells | [17] preset_override
        #   [18] erode_first | [19:21] planner start cells (pose_inputs
        #   convention, reference agent_helper.py:267-269) | [21:23] agent
        #   cell in the NEW window (post-rebase, for the value solve)
        #   [23:231] line_pts (104 x 2) | [231:335] line_valid
        #   [335:351] col_pts (8 x 2) | [351:359] col_valid
        PACK = 359

        def unpack(hp):
            poses = hp[:, 0:3]
            lmb_old = hp[:, 3:7].astype(jnp.int32)
            lmb_new = hp[:, 7:11].astype(jnp.int32)
            goal_cats = hp[:, 11].astype(jnp.int32)
            no_erode = hp[:, 12] > 0.5
            is_toilet = hp[:, 13] > 0.5
            trig = hp[:, 14] > 0.5
            preset_cells = hp[:, 15:17].astype(jnp.int32)
            preset_override = hp[:, 17] > 0.5
            erode_first = hp[:, 18] > 0.5
            starts = hp[:, 19:21].astype(jnp.int32)
            loc_new = hp[:, 21:23].astype(jnp.int32)
            line_pts = hp[:, 23:231].astype(jnp.int32).reshape(-1, 104, 2)
            line_valid = hp[:, 231:335] > 0.5
            col_pts = hp[:, 335:351].astype(jnp.int32).reshape(-1, 8, 2)
            col_valid = hp[:, 351:359] > 0.5
            return (poses, lmb_old, lmb_new, goal_cats, no_erode,
                    is_toilet, trig, preset_cells, preset_override,
                    erode_first, starts, loc_new, line_pts, line_valid,
                    col_pts, col_valid)

        self.PACK = PACK

        def pred_goal_update(full_maps, local_maps, collision, visited,
                             target_pred, dd_wt, dd_valid, cur_goal,
                             last_goal, last_goal_valid, trig, lmb_new,
                             goal_cats, loc_new, trig_idxs, pred_k,
                             spmd: bool = False):
            """Target prediction + geodesic value weighting + goal argmax.

            The update_prediction/update_global_goal twin
            (/root/reference/nav/agent/agent_state.py:345-415), shared by
            the synchronous tick (exact mode) and the standalone async
            pred program (``pred_async`` serving mode) so the two paths
            are the same computation by construction.  Operates on a
            gathered K-env subset (trig_idxs, padded with repeats) so
            trigger ticks pay O(K), not O(B).
            """
            if spmd:
                # under shard_map every index is SHARD-LOCAL; the global
                # gathered-subset optimization cannot apply, so each
                # shard runs prediction for its whole local batch with
                # trig masking (the selects below keep non-triggered
                # rows untouched)
                pred_k = full_maps.shape[0]
                sub = jnp.arange(pred_k)
            else:
                sub = trig_idxs[:pred_k]                # (K,)
            trig_s = trig[sub]
            lmb_s = lmb_new[sub]
            full_sub = full_maps[sub]                   # (K, nc, Hf, Wf)
            crop = jax.lax.dynamic_slice(
                full_sub, (0, 0, px1, py1),
                (pred_k, self.nc, pw, pw))
            probs = pred_infer(crop)                    # (K, 6, pw, pw)
            chan = probs[jnp.arange(pred_k), goal_cats[sub]]
            pred_full = jnp.zeros((pred_k, self.Hf, self.Wf), jnp.float32)
            pred_full = jax.lax.dynamic_update_slice(
                pred_full, chan, (0, px1, py1))
            window = B.window_shuttle_in(
                pred_full[:, None], lmb_s, self.Hl, self.Wl)[:, 0]
            cand_tp = window * (local_maps[sub, 1] < 0.5)
            tp_s = jnp.where(trig_s[:, None, None], cand_tp,
                             target_pred[sub])
            target_pred = target_pred.at[sub].set(tp_s)

            # geodesic distance weighting over the subset's full maps
            trav = jnp.logical_not(B.batch_dilate(
                jnp.rint(full_sub[:, 0]), disk(cfg.col_rad)))
            trav = trav & jnp.logical_not(collision[sub] > 0)
            trav = trav | (visited[sub] > 0)
            agent_r = jnp.clip(loc_new[sub, 0] + lmb_s[:, 0],
                               0, self.Hf - 1)
            agent_c = jnp.clip(loc_new[sub, 1] + lmb_s[:, 2],
                               0, self.Wf - 1)
            src = jnp.zeros_like(full_sub[:, 0])
            src = jax.vmap(lambda s, r, c: s.at[r, c].set(1.0))(
                src, agent_r, agent_c)
            ds = int(getattr(cfg, "dd_downscale", 1))
            dd_order = int(getattr(cfg, "dd_order", 2))
            dd_blk = int(getattr(cfg, "dd_block", 16))
            dd_inner = int(getattr(cfg, "dd_inner", 40))
            if cfg.dist_weight_temperature <= 0:
                # frontier mode thresholds dd at a 60-cell cliff and
                # T=-1 ignores dd: the smooth-weighting justification
                # for the half-res/low-order fields does not apply
                # (compile-time branch; mirrors
                # agent/state.py::update_global_goal)
                ds, dd_order, dd_blk, dd_inner = 1, 2, 16, 40
            if ds > 1 and self.Hf % ds == 0 and self.Wf % ds == 0:
                # serving-profile approximation (PARITY.md): solve the
                # goal-weighting field on an OR-pooled half-res grid
                # (walls are col_rad-dilated, so pooling keeps them)
                # and upsample nearest — the field only feeds
                # exp(-dd/temperature), temperature ~100 cells.
                # Mirrors agent/state.py::update_global_goal.
                pool = lambda x: jax.lax.reduce_window(
                    x.astype(jnp.float32), -jnp.inf, jax.lax.max,
                    (1, ds, ds), (1, ds, ds), "VALID")
                dd = eikonal_distance(pool(trav) > 0, pool(src) > 0,
                                      n_iters=cfg.fmm_sweeps,
                                      order=dd_order, block=dd_blk,
                                      inner=dd_inner) * ds
                dd = masked_fill_unreachable(dd)
                dd = jnp.repeat(jnp.repeat(dd, ds, axis=1), ds, axis=2)
            else:
                dd = eikonal_distance(trav, src, n_iters=cfg.fmm_sweeps,
                                      order=dd_order, block=dd_blk,
                                      inner=dd_inner)
                dd = masked_fill_unreachable(dd)
            mx = jnp.max(dd, axis=(1, 2), keepdims=True)
            dd = jnp.where(dd == mx, jnp.inf, dd)
            dd_wt_full = jnp.exp(-dd / temperature)
            cand_dd = B.window_shuttle_in(
                dd_wt_full[:, None], lmb_s, self.Hl, self.Wl)[:, 0]
            # stuck-inside-obstacle fallback (agent_state.py:398-399)
            reuse = (cand_dd.sum(axis=(1, 2)) < 10) & dd_valid[sub]
            cand_dd = jnp.where(reuse[:, None, None], dd_wt[sub], cand_dd)
            dd_s = jnp.where(trig_s[:, None, None], cand_dd, dd_wt[sub])
            dd_wt = dd_wt.at[sub].set(dd_s)
            dd_valid = dd_valid.at[sub].set(dd_valid[sub] | trig_s)

            # dist_weight_temperature special modes (agent_state.py:
            # 402-407): -1 = no distance weighting, 0 = frontier-based
            # exploration (ignore cells closer than 60, flat 100-cell
            # temperature, no prediction multiply).  Static config ->
            # compile-time branch.
            if cfg.dist_weight_temperature == -1:
                value = tp_s
            elif cfg.dist_weight_temperature == 0:
                dd_f = jnp.where(dd < 60.0, jnp.inf, dd)
                frontier = B.window_shuttle_in(
                    jnp.exp(-dd_f / 100.0)[:, None], lmb_s,
                    self.Hl, self.Wl)[:, 0]
                # non-trigger rows keep their previous goal anyway
                # (take = trig & changed); reuse the frontier window
                value = frontier
            else:
                value = tp_s * dd_s
            flat = value.reshape(pred_k, -1)
            idx = jnp.argmax(flat, axis=1).astype(jnp.int32)
            new_goal = jnp.stack([idx // self.Wl, idx % self.Wl], axis=1)
            same = jnp.all(new_goal == last_goal[sub], axis=1) & \
                last_goal_valid[sub]
            take = trig_s & jnp.logical_not(same)
            last_goal = last_goal.at[sub].set(
                jnp.where(take[:, None], cur_goal[sub], last_goal[sub]))
            last_goal_valid = last_goal_valid.at[sub].set(
                last_goal_valid[sub] | take)
            cur_goal = cur_goal.at[sub].set(
                jnp.where(take[:, None], new_goal, cur_goal[sub]))
            return (target_pred, dd_wt, dd_valid, cur_goal, last_goal,
                    last_goal_valid)

        def tick(state: DeviceState, sem_u8, depth_cm, host_pack, trig_idxs,
                 with_prediction: bool, pred_k: int = 0,
                 spmd: bool = False):
            (poses_new, lmb_old, lmb_new, goal_cats, no_erode, is_toilet,
             trig, preset_cells, preset_override, erode_first, starts,
             loc_new, line_pts, line_valid, col_pts, col_valid) = \
                unpack(host_pack)

            # --- pending point scatters (visited path / collisions) -------
            visited = scatter_pts(state.visited, line_pts, line_valid)
            collision = scatter_pts(state.collision, col_pts, col_valid)

            # --- observation assembly + fused map update ------------------
            # rgb channels are dead weight at runtime (the mapper reads
            # only depth + semantics; reference keeps rgb in the state
            # tensor for unused policy nets) — zero-fill on device instead
            # of uploading them
            zeros_rgb = jnp.zeros(
                (sem_u8.shape[0], 3) + sem_u8.shape[2:], jnp.float32)
            obs = jnp.concatenate([
                zeros_rgb,
                depth_cm[:, None, :, :],
                sem_u8.astype(jnp.float32)], axis=1)
            _, local_maps, _ = self.mapper.update_core(
                obs, poses_new, state.local_maps)

            loc_r = (poses_new[:, 1] * 100.0 / res).astype(jnp.int32)
            loc_c = (poses_new[:, 0] * 100.0 / res).astype(jnp.int32)
            local_maps = local_maps.at[:, 2].set(0.0)
            local_maps = B.mark_agent(local_maps, loc_r, loc_c, 2, (2, 3))
            local_maps = B.fill_disk(local_maps, 1, loc_r, loc_c,
                                     sel_r, sel_c, off)
            n_loc = local_maps.shape[0]
            goal_in = state.cur_goal
            d2g = jnp.sqrt(
                (loc_r - goal_in[:, 0]) ** 2
                + (loc_c - goal_in[:, 1]) ** 2).astype(jnp.float32) * res
            near = d2g < cfg.goal_reached_dist
            filled = B.fill_disk(local_maps, 1, goal_in[:, 0], goal_in[:, 1],
                                 sel_r, sel_c, off)
            local_maps = jnp.where(near[:, None, None, None], filled,
                                   local_maps)

            # --- window shuttling ----------------------------------------
            full_maps = B.window_shuttle_out(state.full_maps, local_maps,
                                             lmb_old)
            local_maps = B.window_shuttle_in(full_maps, lmb_new,
                                             self.Hl, self.Wl)

            # preset corner goals (explore mode / pre-switch_step)
            cur_goal = jnp.where(preset_override[:, None], preset_cells,
                                 goal_in)
            target_pred = state.target_pred
            dd_wt = state.dd_wt
            dd_valid = state.dd_valid
            last_goal = state.last_goal
            last_goal_valid = state.last_goal_valid

            # --- prediction + geodesic value weighting (trigger ticks) ----
            # runs on a gathered K-env subset (trig_idxs, padded with
            # repeats) so trigger ticks pay O(K), not O(B)
            if with_prediction and pred_infer is not None:
                (target_pred, dd_wt, dd_valid, cur_goal, last_goal,
                 last_goal_valid) = pred_goal_update(
                    full_maps, local_maps, collision, visited,
                    target_pred, dd_wt, dd_valid, cur_goal, last_goal,
                    last_goal_valid, trig, lmb_new, goal_cats, loc_new,
                    trig_idxs, pred_k, spmd=spmd)

            # --- found-goal extraction (update_goal_map) ------------------
            if cfg.only_explore == 0:
                bidx = jnp.arange(n_loc)
                cat_maps = local_maps[bidx, goal_cats + 4]
                cat_bin = (cat_maps > 0).astype(jnp.float32)
                eroded = cat_bin
                for _ in range(cfg.goal_erode):
                    eroded = B.batch_erode(eroded, CROSS).astype(jnp.float32)
                eroded = B.batch_dilate(eroded, CROSS).astype(jnp.float32)
                temp = jnp.where(no_erode[:, None, None], cat_bin, eroded)
                others = local_maps[:, 4:10].sum(axis=1) - cat_maps
                temp = temp * (others == 0)
                found = (cat_maps.sum(axis=(1, 2)) != 0) & \
                    (temp.sum(axis=(1, 2)) != 0)
            else:
                temp = jnp.zeros_like(local_maps[:, 0])
                found = jnp.zeros((n_loc,), bool)
            single = jnp.zeros_like(temp)
            single = jax.vmap(
                lambda g, rc: g.at[rc[0], rc[1]].set(1.0))(single, cur_goal)
            goal_maps = jnp.where(found[:, None, None], temp, single)

            # --- local planning solve ------------------------------------
            obstacle = local_maps[:, 0]
            obstacle = jnp.where(
                erode_first[:, None, None],
                B.batch_erode(jnp.rint(obstacle), CROSS).astype(jnp.float32),
                obstacle)
            coll_w = B.window_shuttle_in(collision[:, None], lmb_new,
                                         self.Hl, self.Wl)[:, 0]
            vis_w = B.window_shuttle_in(visited[:, None], lmb_new,
                                        self.Hl, self.Wl)[:, 0]
            trav_l, _ = B.build_traversible(
                obstacle, coll_w, vis_w, starts[:, 0], starts[:, 1],
                int(cfg.col_rad),
                lmb_new[:, 2] == 0, lmb_new[:, 3] == self.Wf,
                lmb_new[:, 0] == 0, lmb_new[:, 1] == self.Hf)
            goal_dil = B.dilate_goal(goal_maps, found.astype(jnp.float32),
                                     is_toilet).astype(jnp.float32)
            plan = B.plan_distance_fields(
                trav_l, goal_dil, starts[:, 0], starts[:, 1],
                n_iters=cfg.fmm_sweeps,
                block=int(getattr(cfg, "plan_block", 16)),
                inner=int(getattr(cfg, "plan_inner", 40)))

            new_state = DeviceState(
                local_maps=local_maps, full_maps=full_maps,
                collision=collision, visited=visited,
                target_pred=target_pred, dd_wt=dd_wt, dd_valid=dd_valid,
                cur_goal=cur_goal, last_goal=last_goal,
                last_goal_valid=last_goal_valid)
            # packed download: windows (121) | found | d2g | goal (2)
            k = plan.window.shape[-1]
            packed = jnp.concatenate([
                plan.window.reshape(n_loc, k * k),
                found.astype(jnp.float32)[:, None],
                d2g[:, None],
                cur_goal.astype(jnp.float32)], axis=1)
            return new_state, packed

        def replan_program(state: DeviceState, lmb, loc_r, loc_c, flags,
                           goal_cats, no_erode, found, is_toilet):
            """Eroded-obstacle re-solve for replan-flagged envs (one jit)."""
            obstacle = state.local_maps[:, 0]
            obstacle = jnp.where(
                flags[:, None, None],
                B.batch_erode(jnp.rint(obstacle), CROSS).astype(jnp.float32),
                obstacle)
            coll_w = B.window_shuttle_in(state.collision[:, None], lmb,
                                         self.Hl, self.Wl)[:, 0]
            vis_w = B.window_shuttle_in(state.visited[:, None], lmb,
                                        self.Hl, self.Wl)[:, 0]
            trav, _ = B.build_traversible(
                obstacle, coll_w, vis_w, loc_r, loc_c, int(cfg.col_rad),
                lmb[:, 2] == 0, lmb[:, 3] == self.Wf,
                lmb[:, 0] == 0, lmb[:, 1] == self.Hf)
            # rebuild goal maps from device state
            bidx = jnp.arange(state.local_maps.shape[0])
            cat_maps = state.local_maps[bidx, goal_cats + 4]
            cat_bin = (cat_maps > 0).astype(jnp.float32)
            eroded = cat_bin
            for _ in range(cfg.goal_erode):
                eroded = B.batch_erode(eroded, CROSS).astype(jnp.float32)
            eroded = B.batch_dilate(eroded, CROSS).astype(jnp.float32)
            temp = jnp.where(no_erode[:, None, None], cat_bin, eroded)
            others = state.local_maps[:, 4:10].sum(axis=1) - cat_maps
            temp = temp * (others == 0)
            single = jnp.zeros_like(temp)
            single = jax.vmap(
                lambda g, rc: g.at[rc[0], rc[1]].set(1.0))(
                single, state.cur_goal)
            goal_maps = jnp.where(found[:, None, None], temp, single)
            goal_dil = B.dilate_goal(goal_maps, found.astype(jnp.float32),
                                     is_toilet).astype(jnp.float32)
            plan = B.plan_distance_fields(
                trav, goal_dil, loc_r, loc_c, n_iters=cfg.fmm_sweeps,
                block=int(getattr(cfg, "plan_block", 16)),
                inner=int(getattr(cfg, "plan_inner", 40)))
            return plan.window

        # --- program wrapping ------------------------------------------
        # Without a mesh: plain jit.  With a mesh: shard_map over the
        # episode axis — episodes are embarrassingly parallel, and GSPMD
        # cannot partition the Pallas custom calls (eikonal sweeps, ROI
        # windows), so plain jit REPLICATES them on every device
        # (measured round 5: the 8-device sharded tick cost 6.6x the
        # unsharded tick on identical total work; shard_map runs each
        # device's local shard through the same programs instead).  The
        # gathered-K prediction subset is a cross-shard gather, so spmd
        # programs run prediction trig-masked over the local batch.
        def wrap_tick(fn):
            if self.mesh is None or not self.use_shard_map:
                return jax.jit(fn, donate_argnums=(0,))
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            d = P(self.mesh_axis)
            st = DeviceState(*([d] * len(DeviceState._fields)))
            return jax.jit(shard_map(
                fn, mesh=self.mesh, in_specs=(st, d, d, d, d),
                out_specs=(st, d), check_rep=False), donate_argnums=(0,))

        def wrap_replan(fn):
            if self.mesh is None or not self.use_shard_map:
                return jax.jit(fn)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            d = P(self.mesh_axis)
            st = DeviceState(*([d] * len(DeviceState._fields)))
            return jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(st, d, d, d, d, d, d, d, d),
                out_specs=d, check_rep=False))

        spmd = self.mesh is not None and self.use_shard_map
        self._replan_program = wrap_replan(replan_program)

        k_small = self.n if spmd else min(self.predict_chunk, self.n)
        self._tick_pred_small = wrap_tick(
            partial(tick, with_prediction=True, pred_k=k_small, spmd=spmd))
        self._tick_pred_full = wrap_tick(
            partial(tick, with_prediction=True, pred_k=self.n,
                    spmd=spmd)) if k_small < self.n             else self._tick_pred_small
        self._k_small = k_small
        self._tick_no_pred = wrap_tick(partial(tick, with_prediction=False,
                                               spmd=spmd))

        def pred_program(state: DeviceState, host_pack, trig_idxs,
                         pred_k: int, spmd: bool = False):
            """Standalone prediction/goal update for ``pred_async`` serving
            mode: the post-tick device state holds exactly the arrays the
            in-tick pred block reads (the tick stores local/full maps as of
            post-shuttle and scattered collision/visited), so running this
            AFTER tick t computes the identical goal the synchronous tick
            would have — applied at tick t+1 (one-tick goal lag, the
            labeled approximation).  Downloads the new goals so the host
            shadow can follow."""
            (_, _, lmb_new, goal_cats, _, _, trig, _, _, _, _, loc_new,
             _, _, _, _) = unpack(host_pack)
            (tp, ddw, ddv, cg, lg, lgv) = pred_goal_update(
                state.full_maps, state.local_maps, state.collision,
                state.visited, state.target_pred, state.dd_wt,
                state.dd_valid, state.cur_goal, state.last_goal,
                state.last_goal_valid, trig, lmb_new, goal_cats, loc_new,
                trig_idxs, pred_k, spmd=spmd)
            new_state = state._replace(
                target_pred=tp, dd_wt=ddw, dd_valid=ddv, cur_goal=cg,
                last_goal=lg, last_goal_valid=lgv)
            return new_state, cg

        if self.pred_model is not None:
            self._pred_prog_small = jax.jit(
                partial(pred_program, pred_k=k_small), donate_argnums=(0,))
            self._pred_prog_full = jax.jit(
                partial(pred_program, pred_k=self.n),
                donate_argnums=(0,)) if k_small < self.n \
                else self._pred_prog_small
        else:
            self._pred_prog_small = self._pred_prog_full = None
        # goal_maps needed by the rare magnify fallback
        self._goal_dil_cache = None

    # ------------------------------------------------------------------
    def warmup_rare_paths(self):
        """Compile the replan and goal-magnify programs outside any timed
        region.  Both are data-dependent (first triggered by a blocked
        short-term goal), so without this their multi-minute tunnel
        compiles land inside whichever measured tick first hits them
        (BENCH round-2: driver-recorded 7.5 steps/s vs 10.2 claimed)."""
        import jax.numpy as jnp

        n = self.n
        lmb = np.stack([s.lmb for s in self.slots])
        starts = np.full((n, 2), self.Hl // 2, np.int32)
        np.asarray(self._replan_program(
            self.state, jnp.asarray(lmb), jnp.asarray(starts[:, 0]),
            jnp.asarray(starts[:, 1]), jnp.asarray(np.ones(n, bool)),
            jnp.asarray(np.zeros(n, np.int32)),
            jnp.asarray(np.zeros(n, bool)), jnp.asarray(np.zeros(n, bool)),
            jnp.asarray(np.zeros(n, bool))))
        # the magnify fallback solves (n, Hl+2, Wl+2) padded fields — one
        # fixed shape (see _magnify_goal_batch's pad_n)
        trav = np.ones((n, self.Hl + 2, self.Wl + 2))
        goal = np.zeros_like(trav, dtype=bool)
        goal[:, 1, 1] = True
        FMMPlanner.solve_batch(trav, goal, n_iters=self.cfg.fmm_sweeps)
        self.warmup_tick_variants()

    def warmup_tick_variants(self):
        """Compile every tick-program variant outside timed regions.

        ``_tick_pred_small`` only dispatches when 1..k_small envs trigger —
        in lockstep-trigger regimes that can first happen dozens of ticks
        in, landing a multi-minute tunnel compile inside a measured tick
        (observed in BENCH r4 serving: one 3.5-min dispatch in tick 40ish).

        State-safe (VERDICT r4 item 7): the device state is snapshotted
        before the zero-input runs and restored afterwards, so warming up
        mid-episode leaves bit-identical episode state
        (tests/test_batched_runtime.py::test_warmup_mid_episode_state_safe).
        The snapshot is a fresh buffer copy because the tick programs
        donate their state argument."""
        import jax.numpy as jnp

        saved_state = jax.tree.map(jnp.copy, self.state)

        cfg = self.cfg
        n = self.n
        fh, fw = cfg.frame_height, cfg.frame_width
        if hasattr(self.segmenter, "batch_device"):
            # the seg path feeds a device f32 sem stack — match its dtype
            # so the traced program is the one the real loop dispatches
            sem = jnp.zeros((n, cfg.num_sem_categories, fh, fw),
                            jnp.float32)
        else:
            sem = jnp.zeros((n, cfg.num_sem_categories, fh, fw), jnp.uint8)
        depth = jnp.zeros((n, fh, fw), jnp.float32)
        hp = np.zeros((n, self.PACK), np.float32)
        hp[:, 3:7] = np.stack([s.lmb for s in self.slots])
        hp[:, 7:11] = hp[:, 3:7]
        idxs = jnp.zeros(n, np.int32)
        variants = [self._tick_no_pred]
        if self.pred_model is not None and not self._pred_async:
            variants += [self._tick_pred_small, self._tick_pred_full]
        for fn in dict.fromkeys(variants):       # dedup small==full case
            self.state, packed = fn(self.state, sem, depth,
                                    jnp.asarray(hp), idxs)
            np.asarray(packed)
        if self._pred_async:
            # async mode dispatches the standalone pred programs instead of
            # the sync pred tick variants — warm those (trig all-zero: the
            # compiled program is identical, no state rows are taken)
            hp_d = jnp.asarray(hp)
            for fn in dict.fromkeys([self._pred_prog_small,
                                     self._pred_prog_full]):
                self.state, goal_dl = fn(self.state, hp_d, idxs)
                np.asarray(goal_dl)
        self.state = saved_state

    # ==================================================================
    # episode lifecycle
    # ==================================================================
    def reset_env(self, i: int):
        cfg = self.cfg
        self._reset_since_pred[i] = True
        s = self.slots[i] = EnvSlot()
        s.forward_after_stop = cfg.move_forward_after_stop
        s.untrap.reset(full=True)

        center = cfg.map_size_cm / 100.0 / 2.0
        loc = int(center * 100.0 / cfg.map_resolution)
        pose = np.array([center, center, 0.0], np.float32)
        s.lmb = np.asarray(self._local_boundaries(loc, loc), np.int32)
        s.origins = np.array([s.lmb[2] * cfg.map_resolution / 100.0,
                              s.lmb[0] * cfg.map_resolution / 100.0, 0.0])
        s.pose_inputs[:3] = pose
        s.pose_inputs[3:] = s.lmb
        s.curr_loc = [center, center, 0.0]
        self.local_poses[i] = pose - s.origins.astype(np.float32)
        self.goal_shadow[i] = [int(0.1 * self.Hl), int(0.1 * self.Wl)]

        # reset_env is called from the env-step thread pool; serialize the
        # read-modify-write of self.state so two episodes finishing in the
        # same tick can't lose each other's slot reset
        with self._reset_lock:
            st = self.state
            full = st.full_maps.at[i].set(0.0)
            full = full.at[i, 2:4, loc - 1:loc + 2, loc - 1:loc + 2].set(1.0)
            local = jax.lax.dynamic_slice(
                full[i], (0, int(s.lmb[0]), int(s.lmb[2])),
                (self.nc, self.Hl, self.Wl))
            self.state = DeviceState(
                local_maps=st.local_maps.at[i].set(local),
                full_maps=full,
                collision=st.collision.at[i].set(0.0),
                visited=st.visited.at[i].set(0.0),
                target_pred=st.target_pred.at[i].set(0.0),
                dd_wt=st.dd_wt.at[i].set(0.0),
                dd_valid=st.dd_valid.at[i].set(False),
                cur_goal=st.cur_goal.at[i].set(
                    jnp.asarray(self.goal_shadow[i])),
                last_goal=st.last_goal.at[i].set(-1),
            last_goal_valid=st.last_goal_valid.at[i].set(False),
        )

    # ------------------------------------------------------------------
    # episode checkpoint / resume (elastic serving — beyond reference
    # parity: the reference's only episode "resume" is restarting whole
    # episodes via --start_ep/--end_ep, ref nav/collect.py:38-50)
    # ------------------------------------------------------------------
    def save_episode_state(self, path: str) -> None:
        """Checkpoint ALL cross-tick state (device maps + host state
        machines) to one .npz.  ``load_episode_state`` on a fresh runtime
        with the same config continues the episodes exactly: action
        streams are bit-identical to an uninterrupted run
        (tests/test_lifecycle.py::test_runtime_checkpoint_resume)."""
        import json

        if self._pending_goal is not None:
            # land the in-flight pred_async goal so the saved host shadow
            # matches the saved device cur_goal
            g = np.asarray(self._pending_goal).astype(np.int32)
            keep = np.logical_not(self._reset_since_pred)
            self.goal_shadow[keep] = g[keep]
            self._pending_goal = None
        arrays = {f"dev_{k}": np.asarray(v)
                  for k, v in self.state._asdict().items()}
        arrays["goal_shadow"] = self.goal_shadow
        arrays["local_poses"] = self.local_poses
        slots = []
        for s in self.slots:
            slots.append({
                "step": s.step, "l_step": s.l_step,
                "timestep": s.timestep, "goal_name": s.goal_name,
                "found_goal": s.found_goal,
                "dist_to_goal": s.dist_to_goal,
                "preset_id": s.preset_id,
                "origins": np.asarray(s.origins, np.float64).tolist(),
                "lmb": np.asarray(s.lmb, np.int64).tolist(),
                "pose_inputs": np.asarray(s.pose_inputs,
                                          np.float64).tolist(),
                "last_sim_location":
                    None if s.last_sim_location is None
                    else [float(v) for v in s.last_sim_location],
                "curr_loc": [float(v) for v in s.curr_loc],
                "last_loc": [float(v) for v in s.last_loc],
                "last_action":
                    None if s.last_action is None else int(s.last_action),
                "previous_action": int(s.previous_action),
                "col_width": int(s.col_width),
                "prev_blocked": int(s.prev_blocked),
                "forward_after_stop": int(s.forward_after_stop),
                "untrap": [s.untrap.total_id, s.untrap.epi_id],
            })
        np.savez_compressed(path, __slots__=json.dumps(slots), **arrays)

    def load_episode_state(self, path: str) -> None:
        """Restore a ``save_episode_state`` checkpoint (same config /
        env count; works on a freshly constructed runtime)."""
        import json

        z = np.load(path, allow_pickle=False)
        slots = json.loads(str(z["__slots__"]))
        if len(slots) != self.n:
            raise ValueError(
                f"checkpoint has {len(slots)} episodes, runtime has "
                f"{self.n}")
        state = DeviceState(**{k: jnp.asarray(z[f"dev_{k}"])
                               for k in DeviceState._fields})
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(self.mesh_axis))
            state = DeviceState(*(jax.device_put(x, sh) for x in state))
        self.state = state
        self.goal_shadow = np.asarray(z["goal_shadow"], np.int32)
        self.local_poses = np.asarray(z["local_poses"], np.float32)
        for s, d in zip(self.slots, slots):
            s.step, s.l_step = d["step"], d["l_step"]
            s.timestep = d["timestep"]
            s.goal_name = d["goal_name"]
            s.found_goal = d["found_goal"]
            s.dist_to_goal = d["dist_to_goal"]
            s.preset_id = d["preset_id"]
            s.origins = np.asarray(d["origins"])
            s.lmb = np.asarray(d["lmb"], np.int32)
            s.pose_inputs = np.asarray(d["pose_inputs"])
            s.last_sim_location = (None if d["last_sim_location"] is None
                                   else tuple(d["last_sim_location"]))
            s.curr_loc = list(d["curr_loc"])
            s.last_loc = list(d["last_loc"])
            s.last_action = d["last_action"]
            s.previous_action = d["previous_action"]
            s.col_width = d["col_width"]
            s.prev_blocked = d["prev_blocked"]
            s.forward_after_stop = d["forward_after_stop"]
            s.untrap.total_id, s.untrap.epi_id = d["untrap"]
        self._clear_pending()
        self._pending_goal = None
        self._reset_since_pred[:] = False

    def _local_boundaries(self, loc_r, loc_c):
        cfg = self.cfg
        if cfg.global_downscaling > 1:
            gx1 = loc_r - self.Hl // 2
            gy1 = loc_c - self.Wl // 2
            gx1 -= gx1 % cfg.grid_resolution
            gy1 -= gy1 % cfg.grid_resolution
            gx2, gy2 = gx1 + self.Hl, gy1 + self.Wl
            if gx1 < 0:
                gx1, gx2 = 0, self.Hl
            if gx2 > self.Hf:
                gx1, gx2 = self.Hf - self.Hl, self.Hf
            if gy1 < 0:
                gy1, gy2 = 0, self.Wl
            if gy2 > self.Wf:
                gy1, gy2 = self.Wf - self.Wl, self.Wf
        else:
            gx1, gx2, gy1, gy2 = 0, self.Hf, 0, self.Wf
        return [gx1, gx2, gy1, gy2]

    # ==================================================================
    # per-tick pipeline
    # ==================================================================
    def act_batch(self, observations: Sequence[Dict]) -> List[Dict]:
        return self.act_batch_collect(self.act_batch_dispatch(observations))

    def wait_pending_goal(self):
        """Land the async pred program's goal download (idempotent).

        Callers that know host work they could overlap with this wait —
        the batched-env runner stages observation uploads behind it —
        may invoke it early; act_batch_dispatch calls it regardless."""
        if self._pending_goal is None:
            return
        with self.timer.stage("pred_goal_wait"):
            g = np.asarray(self._pending_goal).astype(np.int32)
        keep = np.logical_not(self._reset_since_pred)
        self.goal_shadow[keep] = g[keep]
        self._pending_goal = None

    def act_batch_dispatch(self, observations: Sequence[Dict]
                           ) -> "TickHandle":
        """Phase 1: host bookkeeping + launch this tick's device program
        (async — returns as soon as the program is enqueued).  The caller
        may do arbitrary host work (e.g. step OTHER envs) before
        ``act_batch_collect`` blocks on the output.  Collect(t) must run
        before dispatch(t+1) on the same runtime: the host state machines
        mutated here assume the previous tick's results landed."""
        cfg = self.cfg
        n = self.n
        T = self.timer

        # ---- pred_async: land the in-flight goal download --------------
        # (the pred program ran on-device while the envs stepped; by now it
        # has finished, so this fetch is cheap).  Rows reset since the
        # dispatch keep their fresh episode goal.
        self.wait_pending_goal()

        # ---- host: pose integration + bookkeeping ---------------------
        pose_deltas = np.zeros((n, 3), np.float32)
        goal_cats = np.zeros(n, np.int32)
        stop_now = np.zeros(n, bool)
        for i, s in enumerate(self.slots):
            o = observations[i]
            s.timestep += 1
            if s.timestep > cfg.timestep_limit:
                stop_now[i] = True
            goal = int(np.asarray(o["objectgoal"]).reshape(-1)[0])
            s.goal_name = hm3d_names[goal]
            goal_cats[i] = hm3d_to_coco[goal]
            x = o["gps"][0]
            y = -o["gps"][1]
            th = float(np.asarray(o["compass"]).reshape(-1)[0])
            if th > np.pi:
                th -= 2 * np.pi
            cur = (x, y, th)
            if s.last_sim_location is not None:
                dx, dy, do = get_rel_pose_change(cur, s.last_sim_location)
                pose_deltas[i] = [dx, dy, do]
            s.last_sim_location = cur

        poses_new = integrate_pose_np(self.local_poses, pose_deltas)
        loc_r = (poses_new[:, 1] * 100.0 / cfg.map_resolution).astype(int)
        loc_c = (poses_new[:, 0] * 100.0 / cfg.map_resolution).astype(int)
        d2g_host = np.sqrt((loc_r - self.goal_shadow[:, 0]) ** 2 +
                           (loc_c - self.goal_shadow[:, 1]) ** 2) * \
            cfg.map_resolution

        # window shuttling + preset decisions (host mirrors of the device)
        lmb_old = np.stack([s.lmb for s in self.slots])
        lmb_new = lmb_old.copy()
        preset_cells = np.zeros((n, 2), np.int32)
        preset_override = np.zeros(n, bool)
        trig = np.zeros(n, bool)
        for i, s in enumerate(self.slots):
            s.dist_to_goal = float(d2g_host[i])
            s.pose_inputs[:3] = poses_new[i] + s.origins
            if s.l_step == cfg.num_local_steps - 1:
                full_pose = poses_new[i] + s.origins.astype(np.float32)
                fr = int(full_pose[1] * 100.0 / cfg.map_resolution)
                fc = int(full_pose[0] * 100.0 / cfg.map_resolution)
                lmb_new[i] = self._local_boundaries(fr, fc)
                if s.step < cfg.switch_step:
                    preset = self.presets[s.preset_id]
                    preset_cells[i] = [
                        min(int(preset[0] * self.Hl), self.Hl - 1),
                        min(int(preset[1] * self.Wl), self.Wl - 1)]
                    preset_override[i] = True
            trig[i] = ((s.step % cfg.update_goal_freq
                        == cfg.update_goal_freq - 1
                        or s.step == 0
                        or s.dist_to_goal < cfg.goal_reached_dist)
                       and s.step >= cfg.switch_step
                       and self.pred_model is not None)

        # re-base poses for envs that re-windowed (keep the pre-rebase copy
        # for the mapper, which updates in the OLD window's frame)
        poses_pre = poses_new.copy()
        for i, s in enumerate(self.slots):
            if s.l_step == cfg.num_local_steps - 1:
                full_pose = poses_new[i] + s.origins.astype(np.float32)
                s.lmb = lmb_new[i]
                s.origins = np.array(
                    [s.lmb[2] * cfg.map_resolution / 100.0,
                     s.lmb[0] * cfg.map_resolution / 100.0, 0.0])
                s.pose_inputs[3:] = s.lmb
                poses_new[i] = full_pose - s.origins.astype(np.float32)
        self.local_poses = poses_new
        loc_r = (poses_new[:, 1] * 100.0 / cfg.map_resolution).astype(int)
        loc_c = (poses_new[:, 0] * 100.0 / cfg.map_resolution).astype(int)

        # planner-frame cells, visited lines, collision points
        with T.stage("host_points"):
            starts, starts_exact = self._planner_cells(lmb_new)
            self._collect_points(starts, lmb_new)

        # ---- segmentation + obs packing -------------------------------
        with T.stage("pack_obs"):
            sem_u8, depth_cm = self._pack_obs(observations, goal_cats)

        # ---- one packed f32 upload for every small input ---------------
        no_erode = np.array(["tv" in s.goal_name for s in self.slots])
        is_toilet = np.array([s.goal_name == "toilet" for s in self.slots])
        hp = np.zeros((n, self.PACK), np.float32)
        hp[:, 0:3] = poses_pre
        hp[:, 3:7] = lmb_old
        hp[:, 7:11] = lmb_new
        hp[:, 11] = goal_cats
        hp[:, 12] = no_erode
        hp[:, 13] = is_toilet
        hp[:, 14] = trig
        hp[:, 15:17] = preset_cells
        hp[:, 17] = preset_override
        hp[:, 18] = 0.0  # erode_first (replan pass only)
        hp[:, 19:21] = starts
        hp[:, 21] = loc_r
        hp[:, 22] = loc_c
        hp[:, 23:231] = self._line_pts.reshape(n, -1)
        hp[:, 231:335] = self._line_valid
        hp[:, 335:351] = self._col_pts.reshape(n, -1)
        hp[:, 351:359] = self._col_valid

        trig_list = list(np.where(trig)[0])
        if not trig_list:
            fn = self._tick_no_pred
            idxs = np.zeros(self.n, np.int32)
        else:
            idxs = np.asarray(
                (trig_list + [trig_list[-1]] * self.n)[:self.n], np.int32)
            if self._pred_async:
                # the goal update runs as a separate post-collect program
                # (overlapping env stepping); the tick itself never pays
                # for prediction
                fn = self._tick_no_pred
            elif len(trig_list) <= self._k_small:
                fn = self._tick_pred_small
            else:
                fn = self._tick_pred_full
        with T.stage("upload"):
            args_d = (jnp.asarray(sem_u8), jnp.asarray(depth_cm),
                      jnp.asarray(hp), jnp.asarray(idxs))
        with T.stage("dispatch"):
            # async: the fused program is enqueued; nothing blocks until
            # collect fetches the packed download
            self.state, packed = fn(self.state, *args_d)
        self._clear_pending()
        return TickHandle(packed, starts, starts_exact, lmb_new, goal_cats,
                          no_erode, is_toilet, poses_new, trig, stop_now,
                          hp_dev=args_d[2], trig_idxs=args_d[3])

    def act_batch_collect(self, h: "TickHandle") -> List[Dict]:
        """Phase 2: block on the tick program's packed download, then run
        the host planning tail (STG extraction, rare fallbacks, action
        rules) and advance the per-episode step counters."""
        cfg = self.cfg
        n = self.n
        T = self.timer
        (starts, starts_exact, lmb_new, goal_cats, no_erode, is_toilet,
         poses_new, trig, stop_now) = (h.starts, h.starts_exact, h.lmb_new,
                                       h.goal_cats, h.no_erode, h.is_toilet,
                                       h.poses_new, h.trig, h.stop_now)
        with T.stage("tick_wait"):
            packed = np.asarray(h.packed)

        k = 11
        windows = packed[:, :k * k].reshape(n, k, k)
        found = packed[:, k * k] > 0.5
        self.goal_shadow = packed[:, k * k + 2:k * k + 4].astype(np.int32)
        for i, s in enumerate(self.slots):
            s.found_goal = int(found[i])

        # ---- host: STG extraction + rare fallbacks + action rules ------
        self.last_windows = windows  # debug/vis introspection
        with T.stage("stg"):
            stg_results = [self._stg_from_window(windows[i], starts_exact[i],
                                                 starts[i]) for i in range(n)]
        replan_flags = np.array([r[4] for r in stg_results])
        if replan_flags.any():
            with T.stage("replan"):
                stg_results = self._replan_pass(
                    replan_flags, stg_results, starts, starts_exact, lmb_new,
                    goal_cats, no_erode, is_toilet, poses_new, trig)
        mag_idxs = [i for i in range(n)
                    if self.slots[i].found_goal == 1
                    and stg_results[i][2] > cfg.magnify_goal_when_hard]
        if mag_idxs:
            with T.stage("magnify"):
                stg_results = self._magnify_goal_batch(
                    mag_idxs, starts, starts_exact, stg_results)

        # ---- pred_async: enqueue the prediction/goal program LAST, so it
        # executes on-device while the caller steps the envs (the ~270 ms
        # host phase the synchronous pred block used to serialize with)
        if self._pred_async and trig.any():
            n_trig = int(trig.sum())
            fn = self._pred_prog_small if n_trig <= self._k_small \
                else self._pred_prog_full
            with T.stage("pred_dispatch"):
                self.state, goal_dl = fn(self.state, h.hp_dev, h.trig_idxs)
            self._pending_goal = goal_dl
            self._reset_since_pred[:] = False

        self.last_stg = stg_results
        actions = self._action_rules(stg_results, starts, stop_now)
        for s in self.slots:
            s.l_step += 1
            s.step += 1
            s.l_step = s.step % cfg.num_local_steps
        return [{"action": a} for a in actions]

    # ------------------------------------------------------------------
    def stage_obs(self, obs: Dict) -> None:
        """Begin this observation's host->HBM copy immediately (called from
        the env-step thread pool so uploads overlap env stepping — the
        north star's double-buffered observation pipeline), and launch a
        detect chunk as soon as ``seg_chunk`` envs have staged: detection
        for the fastest envs overlaps the stragglers' stepping and the
        host's STG/action logic (JAX dispatch is async; the device queue
        drains while the host keeps working)."""
        if hasattr(self.segmenter, "batch_device"):
            import jax

            obs["_rgb_dev"] = jax.device_put(
                np.asarray(obs["rgb"], np.uint8))
        cfg = self.cfg
        d = preprocess_depth(np.asarray(obs["depth"])[None],
                             cfg.min_depth, cfg.max_depth)[0]
        ds = cfg.env_frame_width // cfg.frame_width
        if ds != 1:
            d = d[ds // 2::ds, ds // 2::ds]
        obs["_depth_np"] = d
        if self._seg_chunk and not cfg.use_gt_seg \
                and hasattr(self.segmenter, "batch_device"):
            goal = int(np.asarray(obs["objectgoal"]).reshape(-1)[0])
            obs["_goal_cat"] = int(hm3d_to_coco[goal])
            with self._det_lock:
                self._det_buf.append(obs)
                if len(self._det_buf) >= self._seg_chunk:
                    batch, self._det_buf = self._det_buf, []
                    self._launch_detect(batch)

    def _launch_detect(self, batch) -> None:
        """Dispatch one detect chunk (non-blocking); each obs gets a lazy
        device slice of the result under ``_sem_dev``."""
        import jax.numpy as jnp

        rgbs = jnp.stack([o["_rgb_dev"] for o in batch])
        cats = [int(o["_goal_cat"]) for o in batch]
        sem = self.segmenter.batch_device(rgbs, cats)
        for j, o in enumerate(batch):
            o["_sem_dev"] = sem[j]

    def _pack_obs(self, observations, goal_cats):
        cfg = self.cfg
        n = self.n
        fh, fw = cfg.frame_height, cfg.frame_width
        sem_u8 = np.zeros((n, cfg.num_sem_categories, fh, fw), np.uint8)
        depth_cm = np.zeros((n, fh, fw), np.float32)

        if hasattr(self.segmenter, "batch_device"):
            # Mask R-CNN serving path: uint8 RGB up, everything else stays
            # on device (preprocess + detect + paste + accumulate in one
            # program); the tick program consumes the device array directly
            import jax.numpy as jnp

            with self._det_lock:
                if self._det_buf:
                    # flush the partial tail chunk staged by stage_obs
                    batch, self._det_buf = self._det_buf, []
                    self._launch_detect(batch)
            if all("_sem_dev" in o for o in observations):
                # chunked-detect pipeline already produced every slice
                sem_dev = jnp.stack([o.pop("_sem_dev")
                                     for o in observations])
            else:
                if all("_rgb_dev" in o for o in observations):
                    rgbs = jnp.stack([o["_rgb_dev"] for o in observations])
                else:
                    rgbs = np.stack(
                        [np.asarray(observations[i]["rgb"], np.uint8)
                         for i in range(n)])
                sem_dev = self.segmenter.batch_device(
                    rgbs, [int(g) for g in goal_cats])
            if all("_depth_np" in o for o in observations):
                depth_cm[:] = np.stack(
                    [o["_depth_np"] for o in observations])
            else:
                depth_all = np.stack(
                    [np.asarray(o["depth"]) for o in observations])
                d_all = preprocess_depth(depth_all, cfg.min_depth,
                                         cfg.max_depth)
                ds = cfg.env_frame_width // cfg.frame_width
                if ds != 1:
                    d_all = d_all[:, ds // 2::ds, ds // 2::ds]
                depth_cm[:] = d_all
            return sem_dev, depth_cm

        ds_gt = cfg.env_frame_width // cfg.frame_width
        if cfg.use_gt_seg == 1 and not hasattr(self.segmenter, "batch") \
                and hasattr(self.segmenter, "goalseg"):
            # GroundTruthSegmenter fast path: only the goal channel is
            # nonzero, so subsample it directly into the uint8 stack
            # instead of materializing 16 full-res (H, W, 10) f32 stacks
            # (~200 MB of numpy churn per tick; byte-identical output)
            for i, o in enumerate(observations):
                gs = o.get("goalseg")
                if gs is not None:
                    sub = np.asarray(gs)[ds_gt // 2::ds_gt,
                                         ds_gt // 2::ds_gt]
                    sem_u8[i, int(goal_cats[i])] = np.clip(
                        sub, 0, 255).astype(np.uint8)
            if all("_depth_np" in o for o in observations):
                depth_cm[:] = np.stack(
                    [o["_depth_np"] for o in observations])
            else:
                depth_all = np.stack(
                    [np.asarray(o["depth"]) for o in observations])
                d_all = preprocess_depth(depth_all, cfg.min_depth,
                                         cfg.max_depth)
                if ds_gt != 1:
                    d_all = d_all[:, ds_gt // 2::ds_gt, ds_gt // 2::ds_gt]
                depth_cm[:] = d_all
            return sem_u8, depth_cm

        if hasattr(self.segmenter, "batch"):
            sems = self.segmenter.batch(
                [np.asarray(observations[i]["rgb"], np.uint8)
                 for i in range(n)], [int(g) for g in goal_cats])
        else:
            sems = []
            for i in range(n):
                o = observations[i]
                if cfg.use_gt_seg and hasattr(self.segmenter, "goalseg"):
                    self.segmenter.goalseg = o.get("goalseg")
                sems.append(self.segmenter(
                    np.asarray(o["rgb"], np.uint8), depth=o["depth"],
                    goal_cat=int(goal_cats[i])))

        ds = cfg.env_frame_width // cfg.frame_width

        # vectorized assembly across the whole batch (single numpy passes);
        # depth preprocessed in the env-step pool when staged (stage_obs)
        sem_all = np.stack(sems)
        if all("_depth_np" in o for o in observations):
            d_all = np.stack([o["_depth_np"] for o in observations])
        else:
            depth_all = np.stack(
                [np.asarray(o["depth"]) for o in observations])
            d_all = preprocess_depth(depth_all, cfg.min_depth, cfg.max_depth)
            if ds != 1:
                d_all = d_all[:, ds // 2::ds, ds // 2::ds]
        if ds != 1:
            sem_all = sem_all[:, ds // 2::ds, ds // 2::ds]
        # semantic masks are instance-count accumulations; uint8 is exact
        sem_u8[:] = np.clip(sem_all, 0, 255).astype(np.uint8).transpose(
            0, 3, 1, 2)
        depth_cm[:] = d_all
        return sem_u8, depth_cm

    def _planner_cells(self, lmb):
        cfg = self.cfg
        n = self.n
        starts = np.zeros((n, 2), np.int32)
        starts_exact = np.zeros((n, 2))
        for i, s in enumerate(self.slots):
            start_x, start_y, _ = s.pose_inputs[:3]
            gx1, gy1 = int(lmb[i][0]), int(lmb[i][2])
            se = [start_y * 100.0 / cfg.map_resolution - gx1,
                  start_x * 100.0 / cfg.map_resolution - gy1]
            starts_exact[i] = se
            starts[i] = threshold_poses([int(se[0]), int(se[1])],
                                        (self.Hl, self.Wl))
        return starts, starts_exact

    def _collect_points(self, starts, lmb):
        """Visited-line cells + collision cells for this tick's scatters."""
        cfg = self.cfg
        for i, s in enumerate(self.slots):
            start_x, start_y, start_o = s.pose_inputs[:3]
            gx1, gy1 = int(lmb[i][0]), int(lmb[i][2])
            s.last_loc = s.curr_loc
            s.curr_loc = [start_x, start_y, start_o]
            st = starts[i]
            last = threshold_poses(
                [int(s.last_loc[1] * 100.0 / cfg.map_resolution - gx1),
                 int(s.last_loc[0] * 100.0 / cfg.map_resolution - gy1)],
                (self.Hl, self.Wl))
            k = 0
            for t in range(26):
                x = int(np.rint(last[0] + (st[0] - last[0]) * t / 25))
                y = int(np.rint(last[1] + (st[1] - last[1]) * t / 25))
                for dx_ in (-1, 0):
                    for dy_ in (-1, 0):
                        self._line_pts[i, k] = (x + dx_ + gx1, y + dy_ + gy1)
                        self._line_valid[i, k] = True
                        k += 1

            if s.last_action == 1:
                x1l, y1l, t1 = s.last_loc
                x2l, y2l, _ = s.curr_loc
                buf = 4 if s.prev_blocked < self.BLOCK_THRESHOLD else 2
                length = 2
                if abs(x1l - x2l) < 0.05 and abs(y1l - y2l) < 0.05:
                    s.col_width += 2
                    if s.col_width == 7:
                        length = 4
                        buf = 3
                    s.col_width = min(s.col_width, 1)
                else:
                    s.col_width = 1
                dist = get_l2_distance(x1l, x2l, y1l, y2l)
                if dist < cfg.collision_threshold:
                    s.prev_blocked += 1
                    width = s.col_width
                    k = 0
                    for ii in range(length):
                        for jj in range(width):
                            wx = x1l + 0.05 * (
                                (ii + buf) * np.cos(np.deg2rad(t1))
                                + (jj - width // 2) * np.sin(np.deg2rad(t1)))
                            wy = y1l + 0.05 * (
                                (ii + buf) * np.sin(np.deg2rad(t1))
                                - (jj - width // 2) * np.cos(np.deg2rad(t1)))
                            rr = int(wy * 100 / cfg.map_resolution)
                            cc = int(wx * 100 / cfg.map_resolution)
                            rr, cc = threshold_poses(
                                [rr, cc], (self.Hf, self.Wf))
                            self._col_pts[i, k] = (rr, cc)
                            self._col_valid[i, k] = True
                            k += 1
                else:
                    if s.prev_blocked >= self.BLOCK_THRESHOLD:
                        s.untrap.reset()
                    s.prev_blocked = 0

    # ------------------------------------------------------------------
    def _stg_from_window(self, window, start_exact, start):
        """Annulus argmin on the pulled 11x11 window (FMMPlanner
        get_short_term_goal semantics)."""
        du = 5
        dx = start_exact[0] - int(start_exact[0])
        dy = start_exact[1] - int(start_exact[1])
        mask = step_mask(dx, dy, 1.0, du)
        dist_mask = step_dist(dx, dy, 1.0, du)
        sentinel = (self.Hl + 2) ** 2
        subset = window.copy()
        subset *= mask
        subset += (1 - mask) * sentinel
        distance = subset[du, du]
        stop = bool(distance < 0.25 * 100 / 5.0)
        subset = subset - distance
        ratio1 = subset / dist_mask
        subset[ratio1 < -1.5] = 1
        sx, sy = np.unravel_index(np.argmin(subset), subset.shape)
        replan = bool(subset[sx, sy] > -0.0001)
        return (sx + start[0] - du, sy + start[1] - du, distance, stop,
                replan)

    def _replan_pass(self, flags, stg_results, starts, starts_exact, lmb,
                     goal_cats, no_erode, is_toilet, poses_new, trig):
        """Second solve with eroded obstacle maps for flagged envs (one jit
        program; eager ops are catastrophically slow on tunneled devices)."""
        cfg = self.cfg
        for i in np.where(flags)[0]:
            if cfg.only_explore:
                sl = self.slots[i]
                sl.preset_id = (sl.preset_id + 1) % len(self.presets)

        found = np.array([sl.found_goal for sl in self.slots], bool)
        windows = np.asarray(self._replan_program(
            self.state, jnp.asarray(lmb), jnp.asarray(starts[:, 0]),
            jnp.asarray(starts[:, 1]), jnp.asarray(flags),
            jnp.asarray(goal_cats), jnp.asarray(no_erode),
            jnp.asarray(found), jnp.asarray(is_toilet)))
        out = list(stg_results)
        for i in np.where(flags)[0]:
            out[i] = self._stg_from_window(windows[i], starts_exact[i],
                                           starts[i])
        return out

    def _magnify_prepare(self, i, start, local_np, coll_full, vis_full):
        """Build the (padded) traversible + initial dilated goal map for
        one magnify-flagged env from pre-downloaded device state."""
        cfg = self.cfg
        s = self.slots[i]
        obstacle = np.rint(local_np[0])
        gx1, gx2, gy1, gy2 = [int(v) for v in s.lmb]
        coll = coll_full[gx1:gx2, gy1:gy2]
        vis = vis_full[gx1:gx2, gy1:gy2]
        if gx2 == self.Hf:
            obstacle[-1] = 1
        if gy2 == self.Wf:
            obstacle[:, -1] = 1
        if gx1 == 0:
            obstacle[0] = 1
        if gy1 == 0:
            obstacle[:, 0] = 1
        trav = np_binary_dilation(obstacle, disk(cfg.col_rad)) != True  # noqa: E712
        trav = trav.astype(float)
        trav[coll == 1] = 0
        trav[vis == 1] = 1
        trav[start[0] - 1:start[0] + 2, start[1] - 1:start[1] + 2] = 1
        trav = np.pad(trav, 1, constant_values=1)

        # host-side goal-map rebuild for this env (eager device ops are
        # too slow on tunneled backends for even rare paths)
        goal_cat = hm3d_to_coco[
            {v: k for k, v in hm3d_names.items()}[s.goal_name]]
        cat_map = (local_np[goal_cat + 4] > 0).astype(float)
        temp = cat_map
        if "tv" not in s.goal_name:
            for _ in range(cfg.goal_erode):
                temp = np_binary_erosion(temp.astype(bool)).astype(float)
            temp = np_binary_dilation(temp.astype(bool)).astype(float)
        others = local_np[4:10].sum(axis=0) - local_np[goal_cat + 4]
        temp = temp * (others == 0)
        if s.found_goal and temp.sum() > 0:
            goal = temp
        else:
            goal = np.zeros_like(cat_map)
            goal[self.goal_shadow[i][0], self.goal_shadow[i][1]] = 1.0
        goal = np.pad(goal, 1, constant_values=0)
        radius = 6 if s.goal_name == "toilet" else 8
        goal_dil = 1 - (np_binary_dilation(goal, disk(radius)) != True)  # noqa: E712
        return trav, goal_dil.astype(float)

    def _magnify_goal_batch(self, idxs, starts, starts_exact, stg_results):
        """Goal-magnification fallback (planner.py:473-489), batched: every
        flagged env solves in ONE device eikonal call per dilation round
        instead of a serial per-env planner loop (round-2 weak 7 — a burst
        of found-goal-but-unreachable episodes stalled the whole batch).
        Control flow per env is identical to the serial loop: initial
        solve, then up to 8 (toilet: 2) dilate-and-resolve rounds while the
        agent's annulus distance stays > 100."""
        cfg = self.cfg
        st = self.state
        k = len(idxs)
        ii = np.asarray(idxs)
        # one batched download of the flagged envs' device state
        locals_np = np.asarray(st.local_maps[ii])
        colls = np.asarray(st.collision[ii])
        viss = np.asarray(st.visited[ii])
        travs, goals = [], []
        for j, i in enumerate(idxs):
            trav, goal_dil = self._magnify_prepare(
                i, starts[i], locals_np[j], colls[j], viss[j])
            travs.append(trav)
            goals.append(goal_dil)
        travs = np.stack(travs)
        goals = np.stack(goals)
        limits = np.array([2 if self.slots[i].goal_name == "toilet" else 8
                           for i in idxs])
        planners = [FMMPlanner(travs[j], n_iters=cfg.fmm_sweeps)
                    for j in range(k)]
        states = [[starts_exact[i][0] + 1, starts_exact[i][1] + 1]
                  for i in idxs]
        results = [None] * k
        active = np.ones(k, bool)
        rnd = 0
        # every solve is padded to the full env count so the device program
        # has ONE shape regardless of how many envs are flagged or still
        # active — a variable leading dim would recompile per distinct
        # count through the tunnel (warmup_rare_paths warms this shape)
        pad_n = self.n
        while active.any():
            aw = np.where(active)[0]
            tb = np.ones((pad_n,) + travs.shape[1:], travs.dtype)
            gb = np.zeros((pad_n,) + goals.shape[1:], bool)
            tb[:len(aw)] = travs[aw]
            gb[:len(aw)] = goals[aw] == 1
            gb[len(aw):, 0, 0] = True  # padded rows need one goal cell
            dists = FMMPlanner.solve_batch(tb, gb,
                                           n_iters=cfg.fmm_sweeps)
            for jj, j in enumerate(aw):
                planners[j].fmm_dist = dists[jj]
                results[j] = planners[j].get_short_term_goal(states[j])
            rnd += 1
            for j in aw:
                if results[j][2] <= 100 or rnd > limits[j]:
                    active[j] = False
                else:
                    gd = np_binary_dilation(goals[j], disk(2)) != True  # noqa: E712
                    goals[j] = 1 - gd.astype(float)
        out = list(stg_results)
        for j, i in enumerate(idxs):
            sx, sy, distance, stop, replan = results[j]
            out[i] = (sx - 1, sy - 1, distance, stop, replan)
        return out

    # ------------------------------------------------------------------
    def _action_rules(self, stg_results, starts, stop_now) -> List[int]:
        cfg = self.cfg
        actions = []
        for i, s in enumerate(self.slots):
            if stop_now[i]:
                actions.append(0)
                s.previous_action = 0
                s.last_action = 0
                continue
            stg_x, stg_y, distance, stop, _ = stg_results[i]
            start = starts[i]
            start_o = s.pose_inputs[2]
            if s.forward_after_stop < 0:
                s.forward_after_stop = cfg.move_forward_after_stop
            if s.forward_after_stop != cfg.move_forward_after_stop:
                if s.forward_after_stop == 0:
                    s.forward_after_stop -= 1
                    action = 0
                else:
                    s.forward_after_stop -= 1
                    action = 1
            elif stop and s.found_goal == 1:
                if s.forward_after_stop == 0:
                    action = 0
                else:
                    s.forward_after_stop -= 1
                    action = 1
            else:
                sx = np.clip(stg_x, self.edge_buffer,
                             self.Hl - self.edge_buffer - 1)
                sy = np.clip(stg_y, self.edge_buffer,
                             self.Wl - self.edge_buffer - 1)
                angle_st_goal = math.degrees(
                    math.atan2(sx - start[0], sy - start[1]))
                angle_agent = start_o % 360.0
                if angle_agent > 180:
                    angle_agent -= 360
                relative_angle = (angle_agent - angle_st_goal) % 360.0
                if relative_angle > 180:
                    relative_angle -= 360
                if relative_angle > cfg.turn_angle / 2.0:
                    action = 3
                elif relative_angle < -cfg.turn_angle / 2.0:
                    action = 2
                else:
                    action = 1
            if s.prev_blocked >= self.BLOCK_THRESHOLD:
                if s.previous_action == 1:
                    action = s.untrap.get_action()
                else:
                    action = 1
            s.previous_action = action
            s.last_action = action
            actions.append(int(action))
        return actions

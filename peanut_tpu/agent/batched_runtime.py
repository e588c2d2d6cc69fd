"""Parallel-episode runtime: N agents, one device program set per tick.

This is the framework's flagship throughput path (BASELINE config 5) and has
no reference counterpart — the reference steps ONE habitat env per process
(SURVEY.md §2.3).  Architecture:

  * all maps (local/full/collision/visited/target-pred) are device-resident
    (B, ...) arrays; per tick the host receives only poses, flags and an
    11x11 planning window per episode;
  * mapping, morphology, goal-map construction, geodesic planning and
    target prediction each run as ONE batched jit program over all episodes;
  * the episodic state machines (collision streaks, untrap, goal
    bookkeeping, action rules) stay host-side per-env scalars, reusing the
    reference-parity logic of the single-env agent;
  * env stepping runs in a host thread pool, overlapped with device compute.

Rare control paths (replan-with-erosion, goal magnification) fall back to
per-env host solves, exactly preserving single-env semantics.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NavConfig
from ..constants import hm3d_names, hm3d_to_coco
from ..geometry.pose import get_rel_pose_change, get_l2_distance, \
    threshold_poses
from ..kernels.morphology import disk, np_binary_dilation, np_binary_erosion
from ..mapping import SemanticMapper
from ..perception import preprocess_depth, build_segmenter
from ..planning import FMMPlanner, UnTrapHelper
from ..planning.fmm_planner import step_mask, step_dist
from ..prediction import PredictionModel
from ..utils.drawing import draw_line
from . import batched_ops as B


@dataclass
class EnvSlot:
    """Per-episode host scalars (the sequential state machines)."""
    step: int = 0
    l_step: int = 0
    timestep: int = 0
    goal_cat: int = -1
    goal_name: str = ""
    found_goal: int = 0
    dist_to_goal: float = 1e9
    global_goal: List[int] = field(default_factory=lambda: [0, 0])
    last_global_goal: Optional[List[int]] = None
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
    first_obs: bool = True
    dd_wt_valid: bool = False


class BatchedNavRuntime:
    BLOCK_THRESHOLD = 4

    def __init__(self, cfg: NavConfig, num_envs: int,
                 prediction_model: Optional[PredictionModel] = None,
                 segmenter=None, predict_chunk: int = 8):
        self.cfg = cfg
        self.n = num_envs
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

        self.slots = [EnvSlot() for _ in range(num_envs)]
        self._alloc_device_state()
        self._build_programs()
        self._pool = ThreadPoolExecutor(max_workers=min(num_envs, 16))

    # ------------------------------------------------------------------
    def _alloc_device_state(self):
        n, nc = self.n, self.nc
        self.local_maps = jnp.zeros((n, nc, self.Hl, self.Wl), jnp.float32)
        self.full_maps = jnp.zeros((n, nc, self.Hf, self.Wf), jnp.float32)
        self.local_poses = jnp.zeros((n, 3), jnp.float32)
        self.collision = jnp.zeros((n, self.Hf, self.Wf), jnp.float32)
        self.visited = jnp.zeros((n, self.Hf, self.Wf), jnp.float32)
        self.target_pred = jnp.zeros((n, self.Hl, self.Wl), jnp.float32)
        self.dd_wt = jnp.zeros((n, self.Hl, self.Wl), jnp.float32)
        self.goal_maps = jnp.zeros((n, self.Hl, self.Wl), jnp.float32)

    # ------------------------------------------------------------------
    def _build_programs(self):
        cfg = self.cfg
        res = cfg.map_resolution
        sel_r = np.asarray(self.selem_idx[0], np.int32)
        sel_c = np.asarray(self.selem_idx[1], np.int32)
        off = int(cfg.col_rad + 1)
        traj_rad = 2

        @jax.jit
        def tick_map(obs, pose_delta, local_maps, local_poses, goal_cells):
            _, maps, poses = self.mapper._update(obs, pose_delta, local_maps,
                                                 local_poses)
            loc_r = (poses[:, 1] * 100.0 / res).astype(jnp.int32)
            loc_c = (poses[:, 0] * 100.0 / res).astype(jnp.int32)
            # clear current-location channel, stamp trajectory + location
            maps = maps.at[:, 2].set(0.0)
            maps = B.mark_agent(maps, loc_r, loc_c, traj_rad, (2, 3))
            maps = B.fill_disk(maps, 1, loc_r, loc_c, sel_r, sel_c, off)
            d2g = jnp.sqrt(
                (loc_r - goal_cells[:, 0]) ** 2
                + (loc_c - goal_cells[:, 1]) ** 2).astype(jnp.float32) * res
            near = d2g < cfg.goal_reached_dist
            filled = B.fill_disk(maps, 1, goal_cells[:, 0], goal_cells[:, 1],
                                 sel_r, sel_c, off)
            maps = jnp.where(near[:, None, None, None], filled, maps)
            return maps, poses, loc_r, loc_c, d2g

        self._tick_map = tick_map

        @jax.jit
        def shuttle(full_maps, local_maps, lmb_old, lmb_new):
            full = B.window_shuttle_out(full_maps, local_maps, lmb_old)
            local = B.window_shuttle_in(full, lmb_new, self.Hl, self.Wl)
            return full, local

        self._shuttle = shuttle

        @jax.jit
        def goal_map_program(local_maps, goal_cats, goal_cells, no_erode):
            """update_goal_map (agent/state.py): found-goal extraction."""
            bidx = jnp.arange(local_maps.shape[0])
            cat_maps = local_maps[bidx, goal_cats + 4]          # (B, Hl, Wl)
            cat_bin = (cat_maps > 0).astype(jnp.float32)
            eroded = cat_bin
            for _ in range(cfg.goal_erode):
                eroded = B.batch_erode(eroded, np.array(
                    [[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)).astype(
                    jnp.float32)
            eroded = B.batch_dilate(eroded, np.array(
                [[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)).astype(
                jnp.float32)
            temp = jnp.where(no_erode[:, None, None], cat_bin, eroded)
            others = local_maps[:, 4:10].sum(axis=1) - cat_maps
            temp = temp * (others == 0)
            found = (cat_maps.sum(axis=(1, 2)) != 0) & \
                (temp.sum(axis=(1, 2)) != 0)
            single = jnp.zeros_like(temp)
            single = jax.vmap(
                lambda g, rc: g.at[rc[0], rc[1]].set(1.0))(single, goal_cells)
            goal = jnp.where(found[:, None, None], temp, single)
            return goal, found

        self._goal_map_program = goal_map_program

        @jax.jit
        def plan_program(local_maps, collision, visited, lmb, loc_r, loc_c,
                         goal_maps, found, is_toilet, erode_first):
            """Traversibility + goal dilation + batched geodesic solve."""
            obstacle = local_maps[:, 0]
            obstacle = jnp.where(
                erode_first[:, None, None],
                B.batch_erode(jnp.rint(obstacle), np.array(
                    [[0, 1, 0], [1, 1, 1], [0, 1, 0]],
                    np.uint8)).astype(jnp.float32),
                obstacle)
            coll_w = B.window_shuttle_in(collision[:, None], lmb,
                                         self.Hl, self.Wl)[:, 0]
            vis_w = B.window_shuttle_in(visited[:, None], lmb,
                                        self.Hl, self.Wl)[:, 0]
            close_top = lmb[:, 0] == 0
            close_bottom = lmb[:, 1] == self.Hf
            close_left = lmb[:, 2] == 0
            close_right = lmb[:, 3] == self.Wf
            trav, _ = B.build_traversible(
                obstacle, coll_w, vis_w, loc_r, loc_c, int(cfg.col_rad),
                close_left, close_right, close_top, close_bottom)
            goal_dil = B.dilate_goal(goal_maps, found, is_toilet)
            goal_dil = goal_dil.astype(jnp.float32)
            return B.plan_distance_fields(trav, goal_dil, loc_r, loc_c,
                                          n_iters=cfg.fmm_sweeps)

        self._plan_program = plan_program

        @jax.jit
        def scatter_points(grid, rows, cols, valid):
            """Mark cells 1 in (B, H, W) grids at per-env point lists."""
            h, w = grid.shape[1], grid.shape[2]
            rows = jnp.clip(rows, 0, h - 1)
            cols = jnp.clip(cols, 0, w - 1)

            def one(g, r, c, v):
                return g.at[r, c].max(v.astype(g.dtype))

            return jax.vmap(one)(grid, rows, cols, valid)

        self._scatter_points = scatter_points

        temperature = cfg.dist_weight_temperature / cfg.map_resolution

        @jax.jit
        def value_program(full_maps, collision, visited, agent_r, agent_c):
            """update_global_goal's geodesic weighting, batched (full map)."""
            trav = jnp.logical_not(
                B.batch_dilate(jnp.rint(full_maps[:, 0]), disk(cfg.col_rad)))
            trav = trav & jnp.logical_not(collision > 0)
            trav = trav | (visited > 0)
            src = jnp.zeros_like(full_maps[:, 0])
            src = jax.vmap(lambda s, r, c: s.at[r, c].set(1.0))(
                src, agent_r, agent_c)
            from ..kernels import eikonal_distance, masked_fill_unreachable
            dd = eikonal_distance(trav, src, n_iters=cfg.fmm_sweeps)
            dd = masked_fill_unreachable(dd)
            mx = jnp.max(dd, axis=(1, 2), keepdims=True)
            dd = jnp.where(dd == mx, jnp.inf, dd)
            dd_wt_full = jnp.exp(-dd / temperature)
            return dd_wt_full

        self._value_program = value_program

    # ==================================================================
    # episode lifecycle
    # ==================================================================
    def reset_env(self, i: int):
        cfg = self.cfg
        s = self.slots[i] = EnvSlot()
        s.forward_after_stop = cfg.move_forward_after_stop
        s.untrap.reset(full=True)

        self.full_maps = self.full_maps.at[i].set(0.0)
        self.collision = self.collision.at[i].set(0.0)
        self.visited = self.visited.at[i].set(0.0)
        self.target_pred = self.target_pred.at[i].set(0.0)
        self.dd_wt = self.dd_wt.at[i].set(0.0)

        center = cfg.map_size_cm / 100.0 / 2.0
        pose = np.array([center, center, 0.0], np.float32)
        loc = int(center * 100.0 / cfg.map_resolution)
        self.full_maps = self.full_maps.at[
            i, 2:4, loc - 1:loc + 2, loc - 1:loc + 2].set(1.0)

        s.lmb = np.asarray(self._local_boundaries(loc, loc), np.int32)
        s.origins = np.array([s.lmb[2] * cfg.map_resolution / 100.0,
                              s.lmb[0] * cfg.map_resolution / 100.0, 0.0])
        s.pose_inputs[:3] = pose
        s.pose_inputs[3:] = s.lmb
        local = jax.lax.dynamic_slice(
            self.full_maps[i], (0, int(s.lmb[0]), int(s.lmb[2])),
            (self.nc, self.Hl, self.Wl))
        self.local_maps = self.local_maps.at[i].set(local)
        self.local_poses = self.local_poses.at[i].set(
            jnp.asarray(pose - s.origins.astype(np.float32)))
        s.curr_loc = [center, center, 0.0]
        s.global_goal = [int(0.1 * self.Hl), int(0.1 * self.Wl)]

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
        cfg = self.cfg
        n = self.n

        # ---- host: pose deltas + goals + preprocessing -----------------
        pose_deltas = np.zeros((n, 3), np.float32)
        goal_cats = np.zeros(n, np.int32)
        stop_now = np.zeros(n, bool)
        obs_batch = np.zeros((n, self.nc, cfg.frame_height, cfg.frame_width),
                             np.float32)

        def prep_pose(i):
            s = self.slots[i]
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

        list(self._pool.map(prep_pose, range(n)))

        # segmentation: one batched device program when the backend supports
        # it (Mask R-CNN), else per-env calls
        if hasattr(self.segmenter, "batch"):
            sems = self.segmenter.batch(
                [np.asarray(observations[i]["rgb"], np.uint8)
                 for i in range(n)], [int(g) for g in goal_cats])
        else:
            def seg_one(i):
                o = observations[i]
                if cfg.use_gt_seg and hasattr(self.segmenter, "goalseg"):
                    self.segmenter.goalseg = o.get("goalseg")
                return self.segmenter(np.asarray(o["rgb"], np.uint8),
                                      depth=o["depth"],
                                      goal_cat=int(goal_cats[i]))
            sems = [seg_one(i) for i in range(n)]

        def assemble(i):
            o = observations[i]
            sem = sems[i]
            depth_cm = preprocess_depth(np.asarray(o["depth"]),
                                        cfg.min_depth, cfg.max_depth)
            ds = cfg.env_frame_width // cfg.frame_width
            rgb = np.asarray(o["rgb"])
            if ds != 1:
                rgb = rgb[ds // 2::ds, ds // 2::ds]
                depth_cm = depth_cm[ds // 2::ds, ds // 2::ds]
                sem = sem[ds // 2::ds, ds // 2::ds]
            obs_batch[i] = np.concatenate(
                [rgb.astype(np.float32), depth_cm[:, :, None], sem],
                axis=2).transpose(2, 0, 1)

        list(self._pool.map(assemble, range(n)))

        goal_cells = np.array([s.global_goal for s in self.slots], np.int32)

        # ---- device: fused mapping tick -------------------------------
        self.local_maps, self.local_poses, loc_r_d, loc_c_d, d2g = \
            self._tick_map(jnp.asarray(obs_batch), jnp.asarray(pose_deltas),
                           self.local_maps, self.local_poses,
                           jnp.asarray(goal_cells))
        local_poses = np.array(self.local_poses)
        loc_r = np.array(loc_r_d)
        loc_c = np.array(loc_c_d)
        d2g = np.asarray(d2g)

        # ---- host: bookkeeping + window shuttling ---------------------
        lmb_old = np.stack([s.lmb for s in self.slots])
        lmb_new = lmb_old.copy()
        for i, s in enumerate(self.slots):
            s.dist_to_goal = float(d2g[i])
            s.pose_inputs[:3] = local_poses[i] + s.origins
            if s.l_step == cfg.num_local_steps - 1:
                full_pose = local_poses[i] + s.origins.astype(np.float32)
                fr = int(full_pose[1] * 100.0 / cfg.map_resolution)
                fc = int(full_pose[0] * 100.0 / cfg.map_resolution)
                lmb_new[i] = self._local_boundaries(fr, fc)

        self.full_maps, self.local_maps = self._shuttle(
            self.full_maps, self.local_maps, jnp.asarray(lmb_old),
            jnp.asarray(lmb_new))

        for i, s in enumerate(self.slots):
            if s.l_step == cfg.num_local_steps - 1:
                s.l_step = 0
                full_pose = local_poses[i] + s.origins.astype(np.float32)
                s.lmb = lmb_new[i]
                s.origins = np.array(
                    [s.lmb[2] * cfg.map_resolution / 100.0,
                     s.lmb[0] * cfg.map_resolution / 100.0, 0.0])
                s.pose_inputs[3:] = s.lmb
                lp = full_pose - s.origins.astype(np.float32)
                local_poses[i] = lp
                loc_r[i] = int(lp[1] * 100.0 / cfg.map_resolution)
                loc_c[i] = int(lp[0] * 100.0 / cfg.map_resolution)
                if s.step < cfg.switch_step:
                    preset = self.presets[s.preset_id]
                    s.global_goal = [
                        min(int(preset[0] * self.Hl), self.Hl - 1),
                        min(int(preset[1] * self.Wl), self.Wl - 1)]
        self.local_poses = jnp.asarray(local_poses)

        # ---- prediction + global goal (triggered envs) ----------------
        trig = [i for i, s in enumerate(self.slots)
                if ((s.step % cfg.update_goal_freq == cfg.update_goal_freq - 1
                     or s.step == 0
                     or s.dist_to_goal < cfg.goal_reached_dist)
                    and s.step >= cfg.switch_step
                    and self.pred_model is not None)]
        if trig:
            self._update_predictions(trig, goal_cats, loc_r, loc_c)

        # ---- goal map (found-goal handling) ---------------------------
        goal_cells = np.array([s.global_goal for s in self.slots], np.int32)
        no_erode = np.array(["tv" in s.goal_name for s in self.slots])
        if cfg.only_explore == 0:
            self.goal_maps, found_d = self._goal_map_program(
                self.local_maps, jnp.asarray(goal_cats),
                jnp.asarray(goal_cells), jnp.asarray(no_erode))
            found = np.asarray(found_d)
        else:
            single = np.zeros((n, self.Hl, self.Wl), np.float32)
            for i in range(n):
                single[i, goal_cells[i, 0], goal_cells[i, 1]] = 1.0
            self.goal_maps = jnp.asarray(single)
            found = np.zeros(n, bool)
        for i, s in enumerate(self.slots):
            s.found_goal = int(found[i])

        # ---- planner ---------------------------------------------------
        actions = self._plan_batch(local_poses, found, stop_now)

        for s in self.slots:
            s.l_step += 1
            s.step += 1
            s.l_step = s.step % cfg.num_local_steps
        return [{"action": a} for a in actions]

    # ------------------------------------------------------------------
    def _update_predictions(self, trig, goal_cats, loc_r, loc_c):
        """Prediction + geodesic value weighting for triggered envs."""
        cfg = self.cfg
        pw = cfg.prediction_window
        x1 = self.Hf // 2 - pw // 2
        y1 = self.Wf // 2 - pw // 2

        full = self.full_maps
        # chunked prediction over triggered envs
        preds = {}
        for start in range(0, len(trig), self.predict_chunk):
            chunk = trig[start:start + self.predict_chunk]
            pad = self.predict_chunk - len(chunk)
            idxs = np.asarray(chunk + [chunk[-1]] * pad, np.int32)
            crop = jax.lax.dynamic_slice(
                full, (0, 0, x1, y1),
                (full.shape[0], self.nc, pw, pw))[jnp.asarray(idxs)]
            probs = self.pred_model._infer(self.pred_model.variables, crop)
            for j, env in enumerate(chunk):
                preds[env] = probs[j]

        # paste per-env target channel into local windows
        tp = np.array(self.target_pred)
        local_explored = np.asarray(self.local_maps[:, 1])
        for env in trig:
            s = self.slots[env]
            pred_full = np.zeros((self.Hf, self.Wf), np.float32)
            pred_full[x1:x1 + pw, y1:y1 + pw] = \
                np.asarray(preds[env][goal_cats[env]])
            window = pred_full[s.lmb[0]:s.lmb[1], s.lmb[2]:s.lmb[3]]
            tp[env] = window * (local_explored[env] < 0.5)
        self.target_pred = jnp.asarray(tp)

        # batched geodesic weighting on the full maps (triggered subset,
        # padded to the fixed chunk size so program shapes never vary)
        dd_chunks = []
        for start in range(0, len(trig), self.predict_chunk):
            chunk = trig[start:start + self.predict_chunk]
            pad = self.predict_chunk - len(chunk)
            cidx = chunk + [chunk[-1]] * pad
            idxs = jnp.asarray(np.asarray(cidx, np.int32))
            agent_r = jnp.asarray(np.clip(
                [loc_r[i] + self.slots[i].lmb[0] for i in cidx],
                0, self.Hf - 1))
            agent_c = jnp.asarray(np.clip(
                [loc_c[i] + self.slots[i].lmb[2] for i in cidx],
                0, self.Wf - 1))
            out = self._value_program(
                full[idxs], self.collision[idxs], self.visited[idxs],
                agent_r, agent_c)
            dd_chunks.append(np.asarray(out)[:len(chunk)])
        dd_np = np.concatenate(dd_chunks, axis=0)
        dd_wt_all = np.array(self.dd_wt)
        tp_all = np.asarray(self.target_pred)
        for j, env in enumerate(trig):
            s = self.slots[env]
            window = dd_np[j][s.lmb[0]:s.lmb[1], s.lmb[2]:s.lmb[3]]
            if window.sum() < 10 and s.dd_wt_valid:
                window = dd_wt_all[env]  # stuck inside obstacle: reuse
            dd_wt_all[env] = window
            s.dd_wt_valid = True
            value = tp_all[env] * window
            idx = int(value.argmax())
            new_goal = [idx // self.Wl, idx % self.Wl]
            if [new_goal] != s.last_global_goal:
                s.last_global_goal = [list(s.global_goal)]
                s.global_goal = new_goal
        self.dd_wt = jnp.asarray(dd_wt_all)

    # ------------------------------------------------------------------
    def _plan_batch(self, local_poses, found, stop_now) -> List[int]:
        cfg = self.cfg
        n = self.n

        # planner-frame start cells + visited line drawing + collisions
        starts = np.zeros((n, 2), np.int32)
        starts_exact = np.zeros((n, 2))
        line_rows = np.zeros((n, 104), np.int32)
        line_cols = np.zeros((n, 104), np.int32)
        line_valid = np.zeros((n, 104), bool)
        col_rows = np.zeros((n, 8), np.int32)
        col_cols = np.zeros((n, 8), np.int32)
        col_valid = np.zeros((n, 8), bool)

        for i, s in enumerate(self.slots):
            start_x, start_y, start_o = s.pose_inputs[:3]
            gx1, gx2, gy1, gy2 = [int(v) for v in s.lmb]
            s.last_loc = s.curr_loc
            s.curr_loc = [start_x, start_y, start_o]
            r, c = start_y, start_x
            se = [r * 100.0 / cfg.map_resolution - gx1,
                  c * 100.0 / cfg.map_resolution - gy1]
            starts_exact[i] = se
            st = threshold_poses([int(se[0]), int(se[1])],
                                 (self.Hl, self.Wl))
            starts[i] = st
            last = threshold_poses(
                [int(s.last_loc[1] * 100.0 / cfg.map_resolution - gx1),
                 int(s.last_loc[0] * 100.0 / cfg.map_resolution - gy1)],
                (self.Hl, self.Wl))
            # visited line: 26 samples x 2x2 squares, in FULL map coords
            k = 0
            for t in range(26):
                x = int(np.rint(last[0] + (st[0] - last[0]) * t / 25))
                y = int(np.rint(last[1] + (st[1] - last[1]) * t / 25))
                for dx_ in (-1, 0):
                    for dy_ in (-1, 0):
                        line_rows[i, k] = x + dx_ + gx1
                        line_cols[i, k] = y + dy_ + gy1
                        line_valid[i, k] = True
                        k += 1

            # collision detection (planner.py:283-320)
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
                            rr, cc = threshold_poses([rr, cc],
                                                     (self.Hf, self.Wf))
                            col_rows[i, k] = rr
                            col_cols[i, k] = cc
                            col_valid[i, k] = True
                            k += 1
                else:
                    if s.prev_blocked >= self.BLOCK_THRESHOLD:
                        s.untrap.reset()
                    s.prev_blocked = 0

        self.visited = self._scatter_points(
            self.visited, jnp.asarray(line_rows), jnp.asarray(line_cols),
            jnp.asarray(line_valid))
        self.collision = self._scatter_points(
            self.collision, jnp.asarray(col_rows), jnp.asarray(col_cols),
            jnp.asarray(col_valid))

        lmb = jnp.asarray(np.stack([s.lmb for s in self.slots]))
        is_toilet = jnp.asarray(
            np.array([s.goal_name == "toilet" for s in self.slots]))
        found_d = jnp.asarray(found.astype(np.float32))
        loc_r = jnp.asarray(starts[:, 0])
        loc_c = jnp.asarray(starts[:, 1])

        plan = self._plan_program(
            self.local_maps, self.collision, self.visited, lmb, loc_r, loc_c,
            self.goal_maps, found_d, is_toilet,
            jnp.zeros(n, bool))
        windows = np.asarray(plan.window)
        replan_flags = np.zeros(n, bool)
        stg_results = [None] * n
        for i in range(n):
            stg_results[i] = self._stg_from_window(
                windows[i], starts_exact[i], starts[i])
            replan_flags[i] = stg_results[i][4]

        if replan_flags.any():
            # retry with eroded obstacle map for flagged envs
            for i in np.where(replan_flags)[0]:
                if cfg.only_explore:
                    s = self.slots[i]
                    s.preset_id = (s.preset_id + 1) % len(self.presets)
            plan2 = self._plan_program(
                self.local_maps, self.collision, self.visited, lmb, loc_r,
                loc_c, self.goal_maps, found_d, is_toilet,
                jnp.asarray(replan_flags))
            windows2 = np.asarray(plan2.window)
            for i in np.where(replan_flags)[0]:
                stg_results[i] = self._stg_from_window(
                    windows2[i], starts_exact[i], starts[i])

        # goal magnification (rare): host fallback per env
        for i in range(n):
            s = self.slots[i]
            _, _, distance, _, _ = stg_results[i]
            if s.found_goal == 1 and distance > cfg.magnify_goal_when_hard:
                stg_results[i] = self._magnify_goal_fallback(
                    i, starts[i], starts_exact[i], stg_results[i])

        # action rules (planner.py:326-371)
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
                s.forward_after_stop = self.cfg.move_forward_after_stop
            if s.forward_after_stop != self.cfg.move_forward_after_stop:
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

    # ------------------------------------------------------------------
    def _stg_from_window(self, window, start_exact, start):
        """Annulus argmin on the pulled 11x11 window (FMMPlanner
        get_short_term_goal semantics in planner coordinates)."""
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
        # window centre is the agent cell (+1 boundary coord cancels with -1)
        return (sx + start[0] - du, sy + start[1] - du, distance, stop,
                replan)

    def _magnify_goal_fallback(self, i, start, start_exact, result):
        """Host-side goal magnification loop (planner.py:473-489)."""
        cfg = self.cfg
        s = self.slots[i]
        obstacle = np.rint(np.asarray(self.local_maps[i, 0]))
        gx1, gx2, gy1, gy2 = [int(v) for v in s.lmb]
        coll = np.asarray(self.collision[i])[gx1:gx2, gy1:gy2]
        vis = np.asarray(self.visited[i])[gx1:gx2, gy1:gy2]
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

        goal = np.asarray(self.goal_maps[i])
        goal = np.pad(goal, 1, constant_values=0)
        radius = 6 if s.goal_name == "toilet" else 8
        goal_dil = 1 - (np_binary_dilation(goal, disk(radius)) != True)  # noqa: E712

        planner = FMMPlanner(trav, n_iters=cfg.fmm_sweeps)
        planner.set_multi_goal(goal_dil.astype(float))
        state = [start_exact[0] + 1, start_exact[1] + 1]
        stg_x, stg_y, distance, stop, replan = \
            planner.get_short_term_goal(state)
        step = 0
        is_toilet = s.goal_name == "toilet"
        while distance > 100:
            step += 1
            if step > 8 or (is_toilet and step > 2):
                break
            goal_dil = np_binary_dilation(goal_dil, disk(2)) != True  # noqa: E712
            goal_dil = 1 - goal_dil.astype(float)
            planner.set_multi_goal(goal_dil)
            stg_x, stg_y, distance, stop, replan = \
                planner.get_short_term_goal(state)
        return (stg_x - 1, stg_y - 1, distance, stop, replan)

"""Multi-keyframe track builder + sliding-window BA integration.

NEW CAPABILITY (SURVEY.md §7 step 7): the reference tracks only against
frame 0 and has no window/map. Here, with the 'every_frame' keyframe
policy, consecutive keyframes are chained into landmark TRACKS through the
temporal quad matches (each quad links a KF mate row to a CF mate index,
and the CF becomes the next keyframe), and a sliding window of keyframe
poses + tracked 3D edge points is refined by the Schur-complement BA of
models/ba.py.

Host-side bookkeeping is numpy (mate counts are a few thousand); the BA
solve itself is the jitted device program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu import geometry as geom
from edge_based_visual_odometry_tpu.models import ba as BA


@dataclasses.dataclass
class WindowBAConfig:
    window: int = 5            # keyframes in the optimization window
    min_track_len: int = 2
    max_landmarks: int = 4096
    max_obs: int = 16384
    n_iters: int = 8
    damping: float = 1e-3
    huber: float = 2.0
    # weight of the stereo-triangulation landmark prior (1/sigma^2 with
    # sigma ~ 0.2 m); essential for 2-view low-parallax tracks
    prior_weight: float = 25.0
    # landmark depth sanity bounds (camera frame, meters at rig scale):
    # near-zero-disparity stereo triangulations explode to huge depths and
    # ill-condition the Schur solve (observed: NaN poses poisoning the
    # whole trajectory). Out-of-range observations are skipped.
    min_depth: float = 1e-2
    max_depth: float = 1e3


class WindowBA:
    """Accumulates keyframe poses + landmark tracks; runs windowed BA.

    `mesh`: optional jax.sharding.Mesh. When set, the solve shards the
    landmark and observation axes over the mesh's first axis (poses and
    intrinsics replicated); XLA inserts the Schur-complement AllReduces
    over ICI. max_landmarks / max_obs are static, so the sharded program
    caches across frames exactly like the single-device one.
    """

    def __init__(self, K_cam: np.ndarray, cfg: WindowBAConfig = WindowBAConfig(),
                 mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.K_cam = np.asarray(K_cam, np.float32)
        self._next_track = 0
        # per-keyframe: pose (world->cam) + {mate_slot: track_id} + mate uv
        self.kf_poses: List[np.ndarray] = []     # (4, 4) homogeneous
        self.kf_tracks: List[Dict[int, int]] = []
        self.kf_uv: List[Dict[int, np.ndarray]] = []
        self.kf_normal: List[Dict[int, np.ndarray]] = []
        self.kf_gamma: List[Dict[int, np.ndarray]] = []

    def add_keyframe(self, mates, pose_est: geom.Pose,
                     links: Optional[np.ndarray] = None):
        """Register a new keyframe.

        mates: StereoMates of the new keyframe.
        pose_est: world->cam pose estimate of the new keyframe.
        links: optional (M_prev,) int array mapping the PREVIOUS keyframe's
          mate rows to this keyframe's mate indices (-1 = no link) - the
          best temporal quad candidates. Linked mates continue the track.
        """
        n = int(mates.count)
        valid = np.asarray(mates.valid)
        lx = np.asarray(mates.left_x)
        ly = np.asarray(mates.left_y)
        lt = np.asarray(mates.left_theta)
        gamma = np.asarray(mates.gamma)
        # drop degenerate triangulations (see WindowBAConfig depth bounds)
        depth_ok = (np.isfinite(gamma).all(axis=-1)
                    & (gamma[:, 2] > self.cfg.min_depth)
                    & (gamma[:, 2] < self.cfg.max_depth))
        valid = valid & depth_ok

        tracks: Dict[int, int] = {}
        if links is not None and self.kf_tracks:
            prev = self.kf_tracks[-1]
            for prev_slot, tid in prev.items():
                if prev_slot < len(links):
                    cf_slot = int(links[prev_slot])
                    if cf_slot >= 0 and valid[cf_slot]:
                        tracks[cf_slot] = tid
        # new tracks for unlinked mates
        for slot in range(n):
            if valid[slot] and slot not in tracks:
                tracks[slot] = self._next_track
                self._next_track += 1

        R = np.asarray(pose_est.R, np.float64)
        t = np.asarray(pose_est.t, np.float64)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        self.kf_poses.append(T)
        self.kf_tracks.append(tracks)
        self.kf_uv.append({s: np.array([lx[s], ly[s]], np.float32)
                           for s in tracks})
        # edge normal (perpendicular to the edge direction)
        self.kf_normal.append(
            {s: np.array([-np.sin(lt[s]), np.cos(lt[s])], np.float32)
             for s in tracks})
        self.kf_gamma.append({s: gamma[s].astype(np.float64)
                              for s in tracks})

        w = self.cfg.window
        if len(self.kf_poses) > w:
            self.kf_poses = self.kf_poses[-w:]
            self.kf_tracks = self.kf_tracks[-w:]
            self.kf_uv = self.kf_uv[-w:]
            self.kf_normal = self.kf_normal[-w:]
            self.kf_gamma = self.kf_gamma[-w:]

    def run(self):
        """Assemble + solve the window problem. Returns
        (poses_w2c list of geom.Pose, info dict) or None if the window is
        too small."""
        Kn = len(self.kf_poses)
        if Kn < 2:
            return None

        # collect tracks with >= min_track_len observations in the window
        count: Dict[int, int] = {}
        for tr in self.kf_tracks:
            for tid in tr.values():
                count[tid] = count.get(tid, 0) + 1
        keep = [tid for tid, c in count.items()
                if c >= self.cfg.min_track_len]
        if len(keep) > self.cfg.max_landmarks:
            import warnings
            warnings.warn(
                f"WindowBA: {len(keep)} qualifying tracks exceed "
                f"max_landmarks={self.cfg.max_landmarks}; keeping the "
                "longest tracks - raise WindowBAConfig.max_landmarks to "
                "use all")
            # deterministic, quality-ranked truncation (longest tracks
            # constrain the solve most), not dict insertion order
            keep.sort(key=lambda tid: (-count[tid], tid))
            keep = keep[: self.cfg.max_landmarks]
        lm_of = {tid: i for i, tid in enumerate(keep)}
        L = len(keep)
        if L < 10:
            return None

        obs_kf, obs_lm, obs_uv, obs_n = [], [], [], []
        X0 = np.zeros((L, 3))
        x_init_done = np.zeros(L, bool)
        for k in range(Kn):
            Tk = self.kf_poses[k]
            inv = np.linalg.inv(Tk)
            for slot, tid in self.kf_tracks[k].items():
                if tid not in lm_of:
                    continue
                li = lm_of[tid]
                obs_kf.append(k)
                obs_lm.append(li)
                obs_uv.append(self.kf_uv[k][slot])
                obs_n.append(self.kf_normal[k][slot])
                if not x_init_done[li]:
                    # landmark init: stereo-triangulated point lifted to world
                    g = self.kf_gamma[k][slot]
                    X0[li] = (inv[:3, :3] @ g + inv[:3, 3])
                    x_init_done[li] = True
        n_obs = len(obs_kf)
        if n_obs > self.cfg.max_obs:
            import warnings
            warnings.warn(
                f"WindowBA: truncating {n_obs} observations to "
                f"max_obs={self.cfg.max_obs}; raise WindowBAConfig.max_obs "
                f"to use all tracks", stacklevel=2)
            obs_kf = obs_kf[: self.cfg.max_obs]
            obs_lm = obs_lm[: self.cfg.max_obs]
            obs_uv = obs_uv[: self.cfg.max_obs]
            obs_n = obs_n[: self.cfg.max_obs]
            n_obs = self.cfg.max_obs

        # pad to static shapes so the jitted solve caches across frames
        Lp = self.cfg.max_landmarks
        Op = self.cfg.max_obs
        X_pad = np.full((Lp, 3), 5.0)
        X_pad[:L] = X0
        kf_pad = np.zeros(Op, np.int32)
        lm_pad = np.zeros(Op, np.int32)
        uv_pad = np.zeros((Op, 2), np.float32)
        w_pad = np.zeros(Op, np.float32)
        n_pad = np.zeros((Op, 2), np.float32)
        n_pad[:, 1] = 1.0
        kf_pad[:n_obs] = obs_kf
        lm_pad[:n_obs] = obs_lm
        uv_pad[:n_obs] = np.stack(obs_uv)
        n_pad[:n_obs] = np.stack(obs_n)
        w_pad[:n_obs] = 1.0

        prob = BA.BAProblem(
            R=jnp.asarray(np.stack([T[:3, :3] for T in self.kf_poses]),
                          jnp.float32),
            t=jnp.asarray(np.stack([T[:3, 3] for T in self.kf_poses]),
                          jnp.float32),
            X=jnp.asarray(X_pad, jnp.float32),
            obs_kf=jnp.asarray(kf_pad),
            obs_lm=jnp.asarray(lm_pad),
            obs_uv=jnp.asarray(uv_pad),
            obs_w=jnp.asarray(w_pad),
            K_cam=jnp.asarray(self.K_cam),
            X_prior=jnp.asarray(X_pad, jnp.float32),
            prior_w=jnp.float32(self.cfg.prior_weight),
            obs_n=jnp.asarray(n_pad))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = self.mesh.axis_names[0]
            shard = NamedSharding(self.mesh, P(axis))
            repl = NamedSharding(self.mesh, P())
            prob = prob._replace(
                X=jax.device_put(prob.X, shard),
                X_prior=jax.device_put(prob.X_prior, shard),
                obs_kf=jax.device_put(prob.obs_kf, shard),
                obs_lm=jax.device_put(prob.obs_lm, shard),
                obs_uv=jax.device_put(prob.obs_uv, shard),
                obs_w=jax.device_put(prob.obs_w, shard),
                obs_n=jax.device_put(prob.obs_n, shard),
                R=jax.device_put(prob.R, repl),
                t=jax.device_put(prob.t, repl),
                K_cam=jax.device_put(prob.K_cam, repl))
        if not hasattr(self, "_solver"):
            self._solver = jax.jit(lambda p: BA.run_ba(
                p, n_iters=self.cfg.n_iters, damping=self.cfg.damping,
                huber=self.cfg.huber))
        res = self._solver(prob)

        # a diverged solve (ill-conditioned Schur system) must not poison
        # the odometry: reject non-finite results and keep the incoming
        # poses (the VO loop treats None as "no BA correction")
        R_all = np.asarray(res.R[:Kn])
        t_all = np.asarray(res.t[:Kn])
        if not (np.isfinite(R_all).all() and np.isfinite(t_all).all()
                and np.isfinite(float(res.cost_history[-1]))):
            import warnings
            warnings.warn("WindowBA: solve diverged (non-finite result); "
                          "keeping odometry poses", stacklevel=2)
            return None

        poses = []
        for k in range(Kn):
            R = np.asarray(res.R[k], np.float64)
            t = np.asarray(res.t[k], np.float64)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            self.kf_poses[k] = T
            poses.append(geom.Pose(jnp.asarray(R, jnp.float32),
                                   jnp.asarray(t, jnp.float32)))
        info = {
            "n_landmarks": L,
            "n_obs": n_obs,
            "cost": np.asarray(res.cost_history),
        }
        return poses, info


def best_links_from_quads(tr) -> np.ndarray:
    """Extract the (M,) best CF-mate index per KF mate row from a
    TemporalResult (-1 where no surviving candidate)."""
    quads = tr.quads
    cmask = np.asarray(quads.cmask)
    ncc = np.asarray(quads.ncc_l)
    cf_idx = np.asarray(quads.cf_idx)
    score = np.where(cmask, ncc, -np.inf)
    best = score.argmax(axis=1)
    has = score.max(axis=1) > -np.inf
    out = np.where(has, cf_idx[np.arange(len(best)), best], -1)
    return out.astype(np.int64)

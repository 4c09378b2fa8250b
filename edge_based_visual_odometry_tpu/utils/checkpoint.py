"""Checkpoint / resume for the VO pipeline state.

The reference has no persistence at all (SURVEY.md §5 'Checkpoint/resume:
None'). This adds mid-sequence checkpointing: the keyframe pytree
(FrameResult of NamedTuples of arrays), the estimated trajectory, and the
frame cursor, serialized field-by-field to .npz (explicit field names, no
pickled treedefs - robust across refactors that keep field names).
"""

from __future__ import annotations

import json
import os

import numpy as np


def _nt_to_arrays(nt, prefix, out):
    """Recursively flatten NamedTuples of arrays into {name: array}.
    bfloat16 (not numpy-serializable) is stored as a uint16 bit view with
    a name suffix tag."""
    if isinstance(nt, dict):
        # diagnostic payloads (FrameResult.distributions) are not part of
        # inter-frame state - don't serialize them
        return
    if hasattr(nt, "_fields"):
        for f in nt._fields:
            _nt_to_arrays(getattr(nt, f), f"{prefix}{f}.", out)
    else:
        a = np.asarray(nt)
        if a.dtype.name == "bfloat16":
            out[prefix[:-1] + "@bf16"] = a.view(np.uint16)
        else:
            out[prefix[:-1]] = a


def _arrays_to_nt(cls, prefix, data):
    """Rebuild a NamedTuple class tree from {name: array}."""
    import typing

    import jax.numpy as jnp

    kwargs = {}
    hints = typing.get_type_hints(cls)
    for f in cls._fields:
        key = f"{prefix}{f}"
        if key in data:
            kwargs[f] = jnp.asarray(data[key])
        elif key + "@bf16" in data:
            kwargs[f] = jnp.asarray(data[key + "@bf16"]).view(jnp.bfloat16)
        elif f in getattr(cls, "_field_defaults", {}) and not any(
                k.startswith(f"{prefix}{f}.") for k in data):
            # unserialized field with a default (e.g. diagnostics dicts)
            kwargs[f] = cls._field_defaults[f]
        else:
            # nested NamedTuple
            sub_cls = hints.get(f)
            kwargs[f] = _arrays_to_nt(sub_cls, f"{prefix}{f}.", data)
    return cls(**kwargs)


def _wba_to_arrays(wba, arrays, meta):
    """Serialize WindowBA track state (keyframe poses + per-KF track
    dicts) into flat arrays."""
    meta["wba_n_kf"] = len(wba.kf_poses)
    meta["wba_next_track"] = wba._next_track
    for k in range(len(wba.kf_poses)):
        arrays[f"wba_T_{k}"] = np.asarray(wba.kf_poses[k])
        slots = np.array(sorted(wba.kf_tracks[k]), np.int64)
        arrays[f"wba_slots_{k}"] = slots
        arrays[f"wba_tids_{k}"] = np.array(
            [wba.kf_tracks[k][s] for s in slots], np.int64)
        for name, store in (("uv", wba.kf_uv), ("normal", wba.kf_normal),
                            ("gamma", wba.kf_gamma)):
            arrays[f"wba_{name}_{k}"] = (
                np.stack([store[k][s] for s in slots])
                if len(slots) else np.zeros((0, 3 if name == "gamma" else 2)))


def _wba_from_arrays(wba, data, meta):
    wba._next_track = int(meta["wba_next_track"])
    wba.kf_poses, wba.kf_tracks = [], []
    wba.kf_uv, wba.kf_normal, wba.kf_gamma = [], [], []
    for k in range(int(meta["wba_n_kf"])):
        wba.kf_poses.append(np.asarray(data[f"wba_T_{k}"], np.float64))
        slots = data[f"wba_slots_{k}"]
        tids = data[f"wba_tids_{k}"]
        wba.kf_tracks.append({int(s): int(t) for s, t in zip(slots, tids)})
        wba.kf_uv.append({int(s): np.asarray(data[f"wba_uv_{k}"][i],
                                             np.float32)
                          for i, s in enumerate(slots)})
        wba.kf_normal.append({int(s): np.asarray(data[f"wba_normal_{k}"][i],
                                                 np.float32)
                              for i, s in enumerate(slots)})
        wba.kf_gamma.append({int(s): np.asarray(data[f"wba_gamma_{k}"][i],
                                                np.float64)
                             for i, s in enumerate(slots)})


def save_pipeline_state(path: str, pipe) -> None:
    """Persist a VOPipeline's inter-frame state."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "frame_idx": pipe.frame_idx,
        "kf_index": pipe.kf_index,
        "ba_kf_frames": list(pipe._ba_kf_frames),
        "n_traj": len(pipe.trajectory),
        "has_keyframe": pipe.keyframe is not None,
        "has_kf_pose_gt": pipe.kf_pose_gt is not None,
        "has_prev_cam_pose": pipe.prev_cam_pose is not None,
        "has_wba": pipe.wba is not None,
    }
    arrays = {}
    if pipe.keyframe is not None:
        _nt_to_arrays(pipe.keyframe, "kf.", arrays)
    for i, p in enumerate(pipe.trajectory):
        arrays[f"traj_R_{i}"] = np.asarray(p.R)
        arrays[f"traj_t_{i}"] = np.asarray(p.t)
    arrays["kf_pose_est_R"] = np.asarray(pipe.kf_pose_est.R)
    arrays["kf_pose_est_t"] = np.asarray(pipe.kf_pose_est.t)
    arrays["last_rel_R"] = np.asarray(pipe.last_rel.R)
    arrays["last_rel_t"] = np.asarray(pipe.last_rel.t)
    if pipe.kf_pose_gt is not None:
        arrays["kf_pose_gt_R"] = np.asarray(pipe.kf_pose_gt.R)
        arrays["kf_pose_gt_t"] = np.asarray(pipe.kf_pose_gt.t)
    if pipe.prev_cam_pose is not None:
        arrays["prev_cam_pose_R"] = np.asarray(pipe.prev_cam_pose.R)
        arrays["prev_cam_pose_t"] = np.asarray(pipe.prev_cam_pose.t)
    if pipe.wba is not None:
        _wba_to_arrays(pipe.wba, arrays, meta)
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_pipeline_state(path: str, pipe) -> bool:
    """Restore state saved by save_pipeline_state into a freshly
    constructed VOPipeline (same config). Returns False if absent."""
    import jax.numpy as jnp

    from edge_based_visual_odometry_tpu.geometry import Pose
    from edge_based_visual_odometry_tpu.models.pipeline import FrameResult

    meta_path = os.path.join(path, "meta.json")
    npz_path = os.path.join(path, "state.npz")
    if not (os.path.exists(meta_path) and os.path.exists(npz_path)):
        return False
    with open(meta_path) as f:
        meta = json.load(f)
    data = dict(np.load(npz_path))

    pipe.frame_idx = int(meta["frame_idx"])
    pipe.kf_index = int(meta.get("kf_index", 0))
    pipe._ba_kf_frames = [int(i) for i in meta.get("ba_kf_frames", [])]
    pipe.trajectory = [
        Pose(jnp.asarray(data[f"traj_R_{i}"]), jnp.asarray(data[f"traj_t_{i}"]))
        for i in range(int(meta["n_traj"]))]
    pipe.kf_pose_est = Pose(jnp.asarray(data["kf_pose_est_R"]),
                            jnp.asarray(data["kf_pose_est_t"]))
    pipe.last_rel = Pose(jnp.asarray(data["last_rel_R"]),
                         jnp.asarray(data["last_rel_t"]))
    if meta.get("has_kf_pose_gt"):
        pipe.kf_pose_gt = Pose(jnp.asarray(data["kf_pose_gt_R"]),
                               jnp.asarray(data["kf_pose_gt_t"]))
    if meta.get("has_prev_cam_pose"):
        pipe.prev_cam_pose = Pose(jnp.asarray(data["prev_cam_pose_R"]),
                                  jnp.asarray(data["prev_cam_pose_t"]))
    if meta["has_keyframe"]:
        pipe.keyframe = _arrays_to_nt(FrameResult, "kf.", data)
    if meta.get("has_wba") and pipe.wba is not None:
        _wba_from_arrays(pipe.wba, data, meta)
    return True

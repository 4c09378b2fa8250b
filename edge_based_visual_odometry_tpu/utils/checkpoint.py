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
        else:
            # nested NamedTuple
            sub_cls = hints.get(f)
            kwargs[f] = _arrays_to_nt(sub_cls, f"{prefix}{f}.", data)
    return cls(**kwargs)


def save_pipeline_state(path: str, pipe) -> None:
    """Persist a VOPipeline's inter-frame state."""
    os.makedirs(path, exist_ok=True)
    meta = {
        "frame_idx": pipe.frame_idx,
        "n_traj": len(pipe.trajectory),
        "has_keyframe": pipe.keyframe is not None,
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
    pipe.trajectory = [
        Pose(jnp.asarray(data[f"traj_R_{i}"]), jnp.asarray(data[f"traj_t_{i}"]))
        for i in range(int(meta["n_traj"]))]
    pipe.kf_pose_est = Pose(jnp.asarray(data["kf_pose_est_R"]),
                            jnp.asarray(data["kf_pose_est_t"]))
    pipe.last_rel = Pose(jnp.asarray(data["last_rel_R"]),
                         jnp.asarray(data["last_rel_t"]))
    if meta["has_keyframe"]:
        pipe.keyframe = _arrays_to_nt(FrameResult, "kf.", data)
    return True

"""DreamX-World keyboard-action -> PRoPE camera condition builder.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/dreamx_world/
camera_conditioning.py (:27-228): WASD/JLIK actions integrate into per-frame
w2c poses, poses are slerp-interpolated down to the latent frame count
(1 + (F-1)//4), made relative to the first camera, and emitted as
(viewmats, K) with fixed normalized intrinsics.

Pure host-side numpy/scipy — camera math never enters the jit graph; the
resulting [F_lat, 4, 4] / [F_lat, 3, 3] tensors are step-fn inputs.
"""

from __future__ import annotations

import math

import numpy as np

_ACTION_TO_MOTION = {
    "w": "forward", "a": "left", "d": "right", "s": "backward",
    "j": "left_rot", "l": "right_rot", "i": "up_rot", "k": "down_rot",
}
_TRANSLATION_BASE_UNIT = 1.0
_ROTATION_BASE_UNIT = 10.0
_INTRINSIC_ROW = [0.8, 0.5, 0.5, 0.5]


def _translation_step(motion_type: str, current_pose: dict, value: float,
                      duration: int) -> np.ndarray:
    if motion_type in ("forward", "backward"):
        yaw = np.radians(current_pose["rotation"][1])
        pitch = np.radians(current_pose["rotation"][0])
        forward = np.array([
            -math.sin(yaw) * math.cos(pitch),
            math.sin(pitch),
            math.cos(yaw) * math.cos(pitch)
        ])
        direction = 1 if motion_type == "forward" else -1
        return forward * value * direction / duration
    if motion_type in ("left", "right"):
        yaw = np.radians(current_pose["rotation"][1])
        right = np.array([math.cos(yaw), 0.0, math.sin(yaw)])
        direction = -1 if motion_type == "left" else 1
        return right * value * direction / duration
    return np.zeros(3)


def _rotation_step(motion_type: str, value: float,
                   duration: int) -> np.ndarray:
    if not motion_type.endswith("rot"):
        return np.zeros(3)
    axis = motion_type.split("_")[0]
    rotation = np.zeros(3)
    if axis == "left":
        rotation[1] = value
    elif axis == "right":
        rotation[1] = -value
    elif axis == "up":
        rotation[0] = -value
    elif axis == "down":
        rotation[0] = value
    return rotation / duration


def _euler_to_quaternion(angles: np.ndarray) -> list[float]:
    pitch, yaw, roll = np.radians(angles)
    cy, sy = math.cos(yaw * 0.5), math.sin(yaw * 0.5)
    cp, sp = math.cos(pitch * 0.5), math.sin(pitch * 0.5)
    cr, sr = math.cos(roll * 0.5), math.sin(roll * 0.5)
    return [
        cy * cp * cr + sy * sp * sr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
        cy * cp * sr - sy * sp * cr,
    ]


def _quaternion_to_rotation_matrix(q: list[float]) -> np.ndarray:
    qw, qx, qy, qz = q
    return np.array([
        [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx**2 + qz**2),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx**2 + qy**2)],
    ])


def _pose_rows_from_actions(action_seq: list[str],
                            action_speed_list: list[float],
                            duration: int) -> list[list[float]]:
    if len(action_seq) != len(action_speed_list):
        raise ValueError(
            "action_seq and action_speed_list must have the same length")
    positions: list[np.ndarray] = []
    rotations: list[np.ndarray] = []
    current = {"position": np.zeros(3), "rotation": np.zeros(3)}
    for action_id, speed in zip(action_seq, action_speed_list):
        motions = [_ACTION_TO_MOTION[key] for key in list(action_id)]
        t_step = np.zeros(3)
        r_step = np.zeros(3)
        for motion in motions:
            t_step += _translation_step(
                motion, current, float(speed) * _TRANSLATION_BASE_UNIT,
                duration)
            r_step += _rotation_step(
                motion, float(speed) * _ROTATION_BASE_UNIT, duration)
        seg_pos, seg_rot = [], []
        for index in range(1, duration + 1):
            seg_pos.append(current["position"] + t_step * index)
            seg_rot.append(current["rotation"] + r_step * index)
        current["position"] = seg_pos[-1].copy()
        current["rotation"] = seg_rot[-1].copy()
        positions.extend(seg_pos)
        rotations.extend(seg_rot)

    rows = [[0.0] + _INTRINSIC_ROW + [0.0, 0.0] +
            [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]]
    for index, (position, rotation) in enumerate(zip(positions, rotations)):
        rot = _quaternion_to_rotation_matrix(_euler_to_quaternion(rotation))
        translation = -rot @ position
        extrinsic = np.hstack([rot, translation.reshape(3, 1)])
        rows.append([float(index)] + _INTRINSIC_ROW + [0.0, 0.0] +
                    extrinsic.flatten().tolist())
    return rows


def _w2c_from_row(row: list[float]) -> np.ndarray:
    w2c = np.eye(4, dtype=np.float64)
    w2c[:3, :] = np.asarray(row[7:], np.float64).reshape(3, 4)
    return w2c


def _interpolate_w2cs(w2cs: list[np.ndarray], src_indices: np.ndarray,
                      tgt_indices: np.ndarray) -> list[np.ndarray]:
    if len(w2cs) <= 1:
        return [w2cs[0]] * len(tgt_indices) if w2cs else []
    from scipy.interpolate import interp1d
    from scipy.spatial.transform import Rotation, Slerp

    rot = np.array([m[:3, :3] for m in w2cs])
    trans = np.array([m[:3, 3] for m in w2cs])
    dets = np.linalg.det(rot)
    flip = dets.size > 0 and np.median(dets) < 0.0
    flip_mat = np.diag([1.0, 1.0, -1.0])
    if flip:
        rot = rot @ flip_mat
    trans_i = interp1d(src_indices, trans, axis=0, kind="linear",
                       bounds_error=False,
                       fill_value="extrapolate")(tgt_indices)
    quats = Rotation.from_matrix(rot).as_quat().copy()
    for i in range(1, len(quats)):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    rot_i = Slerp(src_indices, Rotation.from_quat(quats))(
        tgt_indices).as_matrix()
    if flip:
        rot_i = rot_i @ flip_mat
    out = []
    for i in range(len(tgt_indices)):
        w2c = np.eye(4, dtype=np.float64)
        w2c[:3, :] = np.hstack([rot_i[i], trans_i[i].reshape(3, 1)])
        out.append(w2c)
    return out


def _invert_se3(transforms: np.ndarray) -> np.ndarray:
    rot_inv = np.swapaxes(transforms[..., :3, :3], -1, -2)
    out = np.zeros_like(transforms)
    out[..., :3, :3] = rot_inv
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", rot_inv,
                                 transforms[..., :3, 3])
    out[..., 3, 3] = 1.0
    return out


def build_dreamx_camera_condition(
        action_seq: list[str], action_speed_list: list[float], *,
        num_frames: int,
        latent_frame_count: int | None = None) -> dict[str, np.ndarray]:
    """Returns {"viewmats": [F_lat, 4, 4], "K": [F_lat, 3, 3]} float32.

    ``latent_frame_count`` defaults to the production Wan 4x temporal
    compression (reference :216); pass the actual latent T for other VAE
    ratios."""
    duration = math.ceil(num_frames / len(action_seq))
    rows = _pose_rows_from_actions(action_seq, action_speed_list,
                                   duration)[:num_frames]
    w2cs = [_w2c_from_row(row) for row in rows]

    if latent_frame_count is None:
        latent_frame_count = 1 + (len(w2cs) - 1) // 4
    src = np.arange(len(w2cs), dtype=np.float64)
    tgt = np.linspace(0, len(w2cs) - 1, latent_frame_count)
    w2cs = _interpolate_w2cs(w2cs, src, tgt)

    # relative c2ws anchored at the first camera (reference :185-193)
    c2ws = [np.linalg.inv(m) for m in w2cs]
    abs2rel = np.eye(4) @ w2cs[0]
    poses = [np.eye(4)] + [abs2rel @ c for c in c2ws[1:]]
    c2ws_rel = np.asarray(poses, np.float32)
    viewmats = _invert_se3(c2ws_rel)

    intrinsics = np.zeros((latent_frame_count, 3, 3), np.float32)
    intrinsics[:, 0, 0] = 969.6969696969696 / (960.0 * 2)
    intrinsics[:, 1, 1] = 969.6969696969696 / (540.0 * 2)
    intrinsics[:, 2, 2] = 1.0
    return {"viewmats": viewmats.astype(np.float32), "K": intrinsics}

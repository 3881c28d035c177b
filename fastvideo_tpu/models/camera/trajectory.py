"""Camera trajectory -> Plücker-coordinate embeddings (GameCraft actions).

Behavioral reference: /root/reference/fastvideo/models/camera/
trajectory.py (:19-395): WASD-style actions unroll into per-frame
extrinsics (euler -> quaternion -> rotation matrices, GameCraft pose
strings), relative poses scale translation x10, and Plücker ray
embeddings (r x o | r) come from the scaled intrinsics grid. All pure
numpy math; the result lands as a jnp array.
"""

from __future__ import annotations

import math

import numpy as np

ACTION_DICT = {
    "w": "forward", "a": "left", "d": "right", "s": "backward",
    "forward": "forward", "backward": "backward", "left": "left",
    "right": "right", "left_rot": "left_rot", "right_rot": "right_rot",
    "up_rot": "up_rot", "down_rot": "down_rot",
}

_INTRINSIC = [0.50505, 0.8979, 0.5, 0.5]


def _generate_motion_segment(current_pose, motion_type, value, duration):
    positions, rotations = [], []
    if motion_type in ("forward", "backward"):
        yaw = np.radians(current_pose["rotation"][1])
        pitch = np.radians(current_pose["rotation"][0])
        fwd = np.array([
            -math.sin(yaw) * math.cos(pitch),
            math.sin(pitch),
            -math.cos(yaw) * math.cos(pitch),
        ])
        direction = 1 if motion_type == "forward" else -1
        step = fwd * value * direction / duration
        for i in range(1, duration + 1):
            positions.append(current_pose["position"] + step * i)
            rotations.append(current_pose["rotation"].copy())
        current_pose["position"] = positions[-1]
    elif motion_type in ("left", "right"):
        yaw = np.radians(current_pose["rotation"][1])
        right = np.array([math.cos(yaw), 0, -math.sin(yaw)])
        direction = -1 if motion_type == "right" else 1
        step = right * value * direction / duration
        for i in range(1, duration + 1):
            positions.append(current_pose["position"] + step * i)
            rotations.append(current_pose["rotation"].copy())
        current_pose["position"] = positions[-1]
    elif motion_type.endswith("rot"):
        axis = motion_type.split("_")[0]
        total = np.zeros(3)
        if axis == "left":
            total[0] = value
        elif axis == "right":
            total[0] = -value
        elif axis == "up":
            total[2] = -value
        elif axis == "down":
            total[2] = value
        step = total / duration
        for i in range(1, duration + 1):
            positions.append(current_pose["position"].copy())
            rotations.append(current_pose["rotation"] + step * i)
        current_pose["rotation"] = rotations[-1]
    return positions, rotations, current_pose


def _euler_to_quaternion(angles):
    pitch, yaw, roll = np.radians(angles)
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    return [cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            sy * cp * sr + cy * sp * cr,
            sy * cp * cr - cy * sp * sr]


def _quaternion_to_rotation_matrix(q):
    qw, qx, qy, qz = q
    return np.array([
        [1 - 2 * (qy**2 + qz**2), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx**2 + qz**2),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx**2 + qy**2)],
    ])


def _action_to_pose_list(action_id: str, value: float = 0.2,
                         duration: int = 33) -> list[str]:
    current_pose = {"position": np.zeros(3), "rotation": np.zeros(3)}
    motion = ACTION_DICT.get(action_id, action_id)
    positions, rotations, _ = _generate_motion_segment(
        current_pose, motion, value, duration)
    pose_list = []
    row = [0] + _INTRINSIC + [0, 0] + [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0,
                                       0.0, 0.0, 0.0, 1.0, 0.0]
    pose_list.append(" ".join(map(str, row)))
    for i, (pos, rot) in enumerate(zip(positions, rotations)):
        rmat = _quaternion_to_rotation_matrix(_euler_to_quaternion(rot))
        extrinsic = np.hstack([rmat, pos.reshape(3, 1)])
        row = [i] + _INTRINSIC + [0, 0] + extrinsic.flatten().tolist()
        pose_list.append(" ".join(map(str, row)))
    return pose_list


class _Camera:
    def __init__(self, entry):
        self.fx, self.fy, self.cx, self.cy = entry[1:5]
        w2c = np.eye(4)
        w2c[:3, :] = np.array(entry[7:]).reshape(3, 4)
        self.w2c_mat = w2c
        self.c2w_mat = np.linalg.inv(w2c)


def _get_relative_pose(cam_params):
    abs_w2cs = [c.w2c_mat for c in cam_params]
    abs_c2ws = [c.c2w_mat for c in cam_params]
    target = np.eye(4)
    abs2rel = target @ abs_w2cs[0]
    ret = [target] + [abs2rel @ c2w for c2w in abs_c2ws[1:]]
    for pose in ret:
        pose[:3, -1:] *= 10
    return np.array(ret, dtype=np.float32)


def _ray_condition(K: np.ndarray, c2w: np.ndarray, H: int,
                   W: int) -> np.ndarray:
    """Plücker coordinates [B, V, H, W, 6] (reference :252-312)."""
    B, V = K.shape[:2]
    j, i = np.meshgrid(np.linspace(0, H - 1, H), np.linspace(0, W - 1, W),
                       indexing="ij")
    i = np.broadcast_to(i.reshape(1, 1, H * W), (B, V, H * W)) + 0.5
    j = np.broadcast_to(j.reshape(1, 1, H * W), (B, V, H * W)) + 0.5
    fx, fy, cx, cy = np.split(K, 4, axis=-1)
    zs = np.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = np.stack((xs, ys, zs), axis=-1)
    directions = directions / np.linalg.norm(directions, axis=-1,
                                             keepdims=True)
    rays_d = directions @ np.swapaxes(c2w[..., :3, :3], -1, -2)
    rays_o = np.broadcast_to(c2w[..., :3, 3][:, :, None], rays_d.shape)
    rays_dxo = np.cross(rays_o, rays_d)
    plucker = np.concatenate([rays_dxo, rays_d], axis=-1)
    return plucker.reshape(B, V, H, W, 6)


def create_camera_trajectory(action: str, height: int, width: int,
                             num_frames: int, action_speed: float = 0.2,
                             dtype=None):
    """Action command -> Plücker embeddings [1, T, 6, H, W]
    (reference :313-395)."""
    import jax.numpy as jnp

    poses = _action_to_pose_list(action, value=action_speed,
                                 duration=num_frames)
    poses_parsed = [p.split(" ") for p in poses][:num_frames]
    cam_params = [_Camera([float(x) for x in p]) for p in poses_parsed]

    monst3r_w = cam_params[0].cx * 2
    monst3r_h = cam_params[0].cy * 2
    rw, rh = width / monst3r_w, height / monst3r_h
    intrinsics = np.asarray(
        [[c.fx * rw, c.fy * rh, c.cx * rw, c.cy * rh]
         for c in cam_params], dtype=np.float32)[None]

    c2w = _get_relative_pose(cam_params)[None]
    plucker = _ray_condition(intrinsics, c2w, height, width)
    out = plucker[0].transpose(0, 3, 1, 2)[None]  # [1, T, 6, H, W]
    return jnp.asarray(out, dtype or jnp.bfloat16)

"""HYWorld pose-string -> (viewmats, Ks, action) + FOV memory retrieval.

Behavioral reference: /root/reference/fastvideo/models/dits/hyworld/
{pose.py,trajectory.py,retrieval_context.py}: WASD/camera pose strings
integrate into local camera trajectories; relative frame-to-frame motion is
classified into a 9x9 action vocabulary; memory/context frames for later
chunks are selected by Monte-Carlo FOV-frustum overlap. Pure host numpy.
"""

from __future__ import annotations

import math

import numpy as np

_MAPPING = {
    (0, 0, 0, 0): 0, (1, 0, 0, 0): 1, (0, 1, 0, 0): 2, (0, 0, 1, 0): 3,
    (0, 0, 0, 1): 4, (1, 0, 1, 0): 5, (1, 0, 0, 1): 6, (0, 1, 1, 0): 7,
    (0, 1, 0, 1): 8,
}

DEFAULT_INTRINSIC = [
    [969.6969696969696, 0.0, 960.0],
    [0.0, 969.6969696969696, 540.0],
    [0.0, 0.0, 1.0],
]
DEFAULT_FORWARD_SPEED = 0.08
DEFAULT_YAW_SPEED = np.deg2rad(3)
DEFAULT_PITCH_SPEED = np.deg2rad(3)


def _rot_x(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _rot_y(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def generate_camera_trajectory_local(motions) -> list[np.ndarray]:
    """(reference trajectory.py:22-85)."""
    poses = [np.eye(4)]
    T = np.eye(4)
    for move in motions:
        if "yaw" in move:
            T[:3, :3] = T[:3, :3] @ _rot_y(move["yaw"])
        if "pitch" in move:
            T[:3, :3] = T[:3, :3] @ _rot_x(move["pitch"])
        forward = move.get("forward", 0.0)
        if forward != 0:
            T[:3, 3] += T[:3, :3] @ np.array([0, 0, forward])
        right = move.get("right", 0.0)
        if right != 0:
            T[:3, 3] += T[:3, :3] @ np.array([right, 0, 0])
        poses.append(T.copy())
    return poses


def parse_pose_string(pose_string: str,
                      forward_speed: float = DEFAULT_FORWARD_SPEED,
                      yaw_speed: float = DEFAULT_YAW_SPEED,
                      pitch_speed: float = DEFAULT_PITCH_SPEED
                      ) -> list[dict]:
    """(reference pose.py:52-141)."""
    motions = []
    for cmd in (c.strip() for c in pose_string.split(",")):
        if not cmd:
            continue
        parts = cmd.split("-")
        if len(parts) != 2:
            raise ValueError(f"Invalid pose command: {cmd}")
        action, duration = parts[0].strip(), int(float(parts[1].strip()))
        step = {
            "w": {"forward": forward_speed},
            "s": {"forward": -forward_speed},
            "a": {"right": -forward_speed},
            "d": {"right": forward_speed},
            "up": {"pitch": pitch_speed},
            "down": {"pitch": -pitch_speed},
            "left": {"yaw": -yaw_speed},
            "right": {"yaw": yaw_speed},
        }.get(action)
        if step is None:
            raise ValueError(f"Unknown action: {action}")
        motions.extend(dict(step) for _ in range(duration))
    return motions


def pose_string_to_json(pose_string: str,
                        intrinsic=None) -> dict:
    if intrinsic is None:
        intrinsic = DEFAULT_INTRINSIC
    poses = generate_camera_trajectory_local(parse_pose_string(pose_string))
    return {str(i): {"extrinsic": p.tolist(), "K": intrinsic}
            for i, p in enumerate(poses)}


def compute_latent_num(num_frames: int) -> int:
    return (num_frames - 1) // 4 + 1


def pose_to_input(pose_data, latent_num: int,
                  tps: bool = False) -> tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """(reference pose.py:169-297): (viewmats [T,4,4], Ks [T,3,3],
    action labels [T])."""
    from scipy.spatial.transform import Rotation

    if isinstance(pose_data, str):
        pose_json = (pose_string_to_json(pose_data)
                     if not pose_data.endswith(".json") else
                     __import__("json").load(open(pose_data)))
    else:
        pose_json = pose_data
    keys = list(pose_json.keys())
    if len(keys) != latent_num:
        raise ValueError(
            f"pose corresponds to {len(keys) * 4 - 3} frames; num_frames "
            f"must be {len(keys) * 4 - 3}")
    w2cs, ks = [], []
    for i in range(latent_num):
        c2w = np.array(pose_json[keys[i]]["extrinsic"])
        w2cs.append(np.linalg.inv(c2w))
        k = np.array(pose_json[keys[i]]["K"], np.float64)
        k[0, 0] /= k[0, 2] * 2
        k[1, 1] /= k[1, 2] * 2
        k[0, 2] = 0.5
        k[1, 2] = 0.5
        ks.append(k)
    w2cs = np.asarray(w2cs)
    ks = np.asarray(ks)

    c2ws = np.linalg.inv(w2cs)
    rel = np.zeros_like(c2ws)
    rel[0] = c2ws[0]
    rel[1:] = np.linalg.inv(c2ws[:-1]) @ c2ws[1:]

    trans_oh = np.zeros((latent_num, 4), np.int32)
    rot_oh = np.zeros((latent_num, 4), np.int32)
    for i in range(1, latent_num):
        move = rel[i, :3, 3]
        norm = np.linalg.norm(move)
        if norm > 1e-4:
            ang = np.degrees(np.arccos(np.clip(move / norm, -1.0, 1.0)))
        else:
            ang = np.zeros(3)
        rot_deg = Rotation.from_matrix(rel[i, :3, :3]).as_euler(
            "xyz", degrees=True)
        if norm > 1e-4 and ((not tps) or (abs(rot_deg[1]) < 5e-2
                                          and abs(rot_deg[0]) < 5e-2)):
            if ang[2] < 60:
                trans_oh[i, 0] = 1
            elif ang[2] > 120:
                trans_oh[i, 1] = 1
            if ang[0] < 60:
                trans_oh[i, 2] = 1
            elif ang[0] > 120:
                trans_oh[i, 3] = 1
        if rot_deg[1] > 5e-2:
            rot_oh[i, 0] = 1
        elif rot_deg[1] < -5e-2:
            rot_oh[i, 1] = 1
        if rot_deg[0] > 5e-2:
            rot_oh[i, 2] = 1
        elif rot_deg[0] < -5e-2:
            rot_oh[i, 3] = 1
    trans_label = np.array([_MAPPING[tuple(r)] for r in trans_oh])
    rot_label = np.array([_MAPPING[tuple(r)] for r in rot_oh])
    return (w2cs.astype(np.float32), ks.astype(np.float32),
            (trans_label * 9 + rot_label).astype(np.float32))


def generate_points_in_sphere(n_points: int, radius: float,
                              seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    r = radius * np.cbrt(rng.random(n_points))
    phi = 2 * math.pi * rng.random(n_points)
    theta = np.arccos(1 - 2 * rng.random(n_points))
    return np.stack([
        r * np.sin(theta) * np.cos(phi),
        r * np.sin(theta) * np.sin(phi),
        r * np.cos(theta),
    ], axis=1).astype(np.float32)


def _rotation_matrix_to_angles(rot: np.ndarray):
    fwd = rot.T[:, 2]
    yaw = math.degrees(math.atan2(fwd[0], fwd[2]))
    pitch = math.degrees(
        math.atan2(fwd[1], math.sqrt(fwd[0]**2 + fwd[2]**2)))
    return pitch, yaw


def _is_inside_fov(points, center, pitch, yaw, half_h, half_v):
    v = points - center[None]
    azim = np.degrees(np.arctan2(v[:, 0], v[:, 2]))
    elev = np.degrees(np.arctan2(v[:, 1],
                                 np.sqrt(v[:, 0]**2 + v[:, 2]**2)))
    da = np.remainder(azim - yaw + 180, 360) - 180
    de = np.remainder(elev - pitch + 180, 360) - 180
    return (np.abs(da) < half_h) & (np.abs(de) < half_v)


def calculate_fov_overlap_similarity(w2c_curr, w2c_hist, fov_h_deg=105.0,
                                     fov_v_deg=75.0,
                                     points_local=None) -> float:
    """(reference retrieval_context.py:117-215)."""
    c2w_curr = np.linalg.inv(w2c_curr)
    c2w_hist = np.linalg.inv(w2c_hist)
    c_inv = w2c_curr
    w2c_curr = np.linalg.inv(c_inv @ c2w_curr)
    w2c_hist = np.linalg.inv(c_inv @ c2w_hist)
    r_curr, t_curr = w2c_curr[:3, :3], w2c_curr[:3, 3]
    r_hist, t_hist = w2c_hist[:3, :3], w2c_hist[:3, 3]
    p_curr = -r_curr.T @ t_curr
    p_hist = -r_hist.T @ t_hist
    pitch_c, yaw_c = _rotation_matrix_to_angles(r_curr)
    pitch_h, yaw_h = _rotation_matrix_to_angles(r_hist)
    points_world = points_local + p_curr[None]
    in_curr = _is_inside_fov(points_world, p_curr, pitch_c, yaw_c,
                             fov_h_deg / 2, fov_v_deg / 2)
    in_hist = _is_inside_fov(points_world, p_hist, pitch_h, yaw_h,
                             fov_h_deg / 2, fov_v_deg / 2)
    in_hist &= np.linalg.norm(points_world - p_hist[None], axis=1) < 8.0
    n_curr = in_curr.sum()
    if n_curr == 0:
        return 0.0
    return float((in_curr & in_hist).sum() / n_curr)


def select_aligned_memory_frames(w2c_list, current_frame_idx: int,
                                 memory_frames: int,
                                 temporal_context_size: int,
                                 pred_latent_size: int,
                                 points_local=None) -> list[int]:
    """(reference retrieval_context.py:218-316)."""
    if current_frame_idx <= memory_frames:
        return list(range(0, current_frame_idx))
    n = len(w2c_list)
    if current_frame_idx >= n or current_frame_idx < 3:
        raise ValueError("current frame index out of range")
    start_ctx = max(0, current_frame_idx - temporal_context_size)
    context = list(range(start_ctx, current_frame_idx))
    query = list(range(current_frame_idx,
                       min(current_frame_idx + pred_latent_size, n)))
    hist = list(range(4, current_frame_idx - temporal_context_size, 4))
    memory = [0, 1, 2, 3]
    memory_budget = memory_frames - temporal_context_size
    dists = []
    for h in hist:
        total = 0.0
        for q in query:
            d1 = 1.0 - calculate_fov_overlap_similarity(
                w2c_list[q], w2c_list[h], 60.0, 35.0,
                points_local=points_local)
            d2 = 1.0 - calculate_fov_overlap_similarity(
                w2c_list[q], w2c_list[h + 2], 60.0, 35.0,
                points_local=points_local)
            total += (d1 + d2) / 2.0
        dists.append((h, total / len(query)))
    dists.sort(key=lambda x: x[1])
    for start, _ in dists:
        if len(memory) >= memory_budget:
            break
        if start not in memory:
            memory.extend(range(start, start + 4))
    return sorted(set(context) | set(memory))

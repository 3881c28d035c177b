"""Matrix-Game 3.0 action -> camera trajectory -> Plücker embedding math.

Behavioral reference: /root/reference/fastvideo/models/dits/matrixgame3/
utils.py (:15-364) + models/dits/lingbotworld/cam_utils.py (:13-119):
keyboard/mouse actions integrate into (x, y, z, pitch, yaw) poses, poses
become extrinsics (Z-Y-X euler, axis remap, cm scale), slerp-interpolated
to latent frames, made frame-wise relative, and rasterized into per-latent
Plücker ray embeddings; memory frames are chosen by a frustum-overlap FOV
score. Pure host-side numpy/scipy.
"""

from __future__ import annotations

import random

import numpy as np

WSAD_OFFSET = 12.35
DIAGONAL_OFFSET = 8.73
MOUSE_PITCH_SENSITIVITY = 15.0
MOUSE_YAW_SENSITIVITY = 15.0
MOUSE_THRESHOLD = 0.02


def compute_next_pose_from_action(current_pose, keyboard_action,
                                  mouse_action) -> np.ndarray:
    x, y, z, pitch, yaw = current_pose
    w, s, a, d = keyboard_action[:4]
    mouse_x, mouse_y = mouse_action[:2]

    delta_pitch = (MOUSE_PITCH_SENSITIVITY * mouse_x
                   if abs(mouse_x) >= MOUSE_THRESHOLD else 0.0)
    delta_yaw = (MOUSE_YAW_SENSITIVITY * mouse_y
                 if abs(mouse_y) >= MOUSE_THRESHOLD else 0.0)
    new_pitch = pitch + delta_pitch
    new_yaw = (yaw + delta_yaw + 180) % 360 - 180

    local_forward = 0.0
    if w > 0.5 and s < 0.5:
        local_forward = WSAD_OFFSET
    elif s > 0.5 and w < 0.5:
        local_forward = -WSAD_OFFSET
    local_right = 0.0
    if d > 0.5 and a < 0.5:
        local_right = WSAD_OFFSET
    elif a > 0.5 and d < 0.5:
        local_right = -WSAD_OFFSET
    if abs(local_forward) > 0.1 and abs(local_right) > 0.1:
        local_forward = np.sign(local_forward) * DIAGONAL_OFFSET
        local_right = np.sign(local_right) * DIAGONAL_OFFSET

    avg_yaw = float((yaw + new_yaw) / 2.0)
    yaw_rad = float(np.deg2rad(avg_yaw))
    delta_x = np.cos(yaw_rad) * local_forward - np.sin(yaw_rad) * local_right
    delta_y = np.sin(yaw_rad) * local_forward + np.cos(yaw_rad) * local_right
    return np.array([x + delta_x, y + delta_y, z, new_pitch, new_yaw],
                    np.float32)


def compute_all_poses_from_actions(keyboard_conditions,
                                   mouse_conditions) -> np.ndarray:
    poses = np.zeros((len(keyboard_conditions), 5), np.float32)
    for idx in range(len(keyboard_conditions) - 1):
        poses[idx + 1] = compute_next_pose_from_action(
            poses[idx], keyboard_conditions[idx], mouse_conditions[idx])
    return poses


def build_intrinsics(height: int, width: int) -> np.ndarray:
    fov_rad = float(np.deg2rad(90.0))
    fx = float(width) / (2.0 * float(np.tan(fov_rad / 2.0)))
    fy = float(height) / (2.0 * float(np.tan(fov_rad / 2.0)))
    return np.array([[fx, fy, width / 2.0, height / 2.0]], np.float32)


def build_extrinsics(video_rotation: np.ndarray,
                     video_position: np.ndarray) -> np.ndarray:
    """(reference utils.py:118-149)."""
    exts = []
    for rot_deg, pos in zip(video_rotation, video_position):
        roll, pitch, yaw = np.radians(rot_deg)
        rot_z = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                          [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]],
                         np.float32)
        rot_y = np.array([[np.cos(pitch), 0, np.sin(pitch)], [0, 1, 0],
                          [-np.sin(pitch), 0, np.cos(pitch)]], np.float32)
        rot_x = np.array([[1, 0, 0], [0, np.cos(roll), -np.sin(roll)],
                          [0, np.sin(roll), np.cos(roll)]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = rot_z @ rot_y @ rot_x
        ext[:3, 3] = np.asarray(pos, np.float32)
        exts.append(ext)
    out = np.stack(exts)
    r_init = np.array([[0, 0, 1], [1, 0, 0], [0, -1, 0]], np.float32)
    out[:, :3, :3] = out[:, :3, :3] @ r_init
    out[:, :3, 3] *= 0.01
    return out


def build_extrinsics_from_actions(keyboard_conditions,
                                  mouse_conditions) -> np.ndarray:
    poses = compute_all_poses_from_actions(
        np.asarray(keyboard_conditions, np.float32),
        np.asarray(mouse_conditions, np.float32))
    rotations = np.concatenate(
        [np.zeros((poses.shape[0], 1), np.float32), poses[:, 3:5]], axis=1)
    return build_extrinsics(rotations, poses[:, :3])


def interpolate_camera_poses(src_indices, src_rot_mat, src_trans_vec,
                             tgt_indices) -> np.ndarray:
    """(reference cam_utils.py:13-46)."""
    from scipy.interpolate import interp1d
    from scipy.spatial.transform import Rotation, Slerp

    trans = interp1d(src_indices, src_trans_vec, axis=0, kind="linear",
                     bounds_error=False,
                     fill_value="extrapolate")(tgt_indices)
    quats = Rotation.from_matrix(src_rot_mat).as_quat().copy()
    for i in range(1, len(quats)):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    rot = Slerp(src_indices, Rotation.from_quat(quats))(
        tgt_indices).as_matrix()
    poses = np.zeros((len(tgt_indices), 4, 4))
    poses[:, :3, :3] = rot
    poses[:, :3, 3] = trans
    poses[:, 3, 3] = 1.0
    return poses.astype(np.float32)


def interpolate_camera_poses_handedness(src_indices, src_rot_mat,
                                        src_trans_vec,
                                        tgt_indices) -> np.ndarray:
    dets = np.linalg.det(src_rot_mat)
    flip = dets.size > 0 and np.median(dets) < 0.0
    flip_mat = np.diag([1.0, 1.0, -1.0]).astype(src_rot_mat.dtype)
    if flip:
        src_rot_mat = src_rot_mat @ flip_mat
    c2ws = interpolate_camera_poses(src_indices, src_rot_mat,
                                    src_trans_vec, tgt_indices)
    if flip:
        c2ws[:, :3, :3] = c2ws[:, :3, :3] @ flip_mat
    return c2ws


def _se3_inverse(mats: np.ndarray) -> np.ndarray:
    rot_inv = np.swapaxes(mats[..., :3, :3], -1, -2)
    out = np.zeros_like(mats)
    out[..., :3, :3] = rot_inv
    out[..., :3, 3] = -np.einsum("...ij,...j->...i", rot_inv,
                                 mats[..., :3, 3])
    out[..., 3, 3] = 1.0
    return out


def compute_relative_poses(c2ws_mat: np.ndarray, framewise: bool = False,
                           normalize_trans: bool = True) -> np.ndarray:
    """(reference cam_utils.py:60-79)."""
    rel = _se3_inverse(c2ws_mat[0:1]) @ c2ws_mat
    rel[0] = np.eye(4, dtype=c2ws_mat.dtype)
    if framewise:
        rel_fw = _se3_inverse(rel[:-1]) @ rel[1:]
        rel[1:] = rel_fw
    if normalize_trans:
        trans = rel[:, :3, 3]
        max_norm = np.linalg.norm(trans, axis=-1).max()
        if max_norm > 0:
            rel[:, :3, 3] = trans / max_norm
    return rel


def get_plucker_embeddings(c2ws_mat: np.ndarray, ks: np.ndarray,
                           height: int, width: int) -> np.ndarray:
    """(reference cam_utils.py:92-118): [F, H, W, 6] = (rays_o, rays_d)."""
    n = c2ws_mat.shape[0]
    gx, gy = np.meshgrid(np.arange(width, dtype=np.float32) + 0.5,
                         np.arange(height, dtype=np.float32) + 0.5)
    fx, fy, cx, cy = [ks[:, i:i + 1] for i in range(4)]
    i = np.broadcast_to(gx.reshape(1, -1), (n, height * width))
    j = np.broadcast_to(gy.reshape(1, -1), (n, height * width))
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    zs = np.ones_like(i)
    directions = np.stack([xs, ys, zs], axis=-1)
    directions = directions / np.linalg.norm(directions, axis=-1,
                                             keepdims=True)
    rays_d = directions @ np.swapaxes(c2ws_mat[:, :3, :3], -1, -2)
    rays_o = np.broadcast_to(c2ws_mat[:, None, :3, 3], rays_d.shape)
    plucker = np.concatenate([rays_o, rays_d], axis=-1)
    return plucker.reshape(n, height, width, 6).astype(np.float32)


def build_plucker_from_pose(c2ws_pose: np.ndarray, *, target_h: int,
                            target_w: int, latent_h: int,
                            latent_w: int) -> np.ndarray:
    """(reference utils.py:180-195): [1, 6*c1*c2, F, latent_h, latent_w]."""
    n = c2ws_pose.shape[0]
    ks = np.repeat(build_intrinsics(target_h, target_w), n, axis=0)
    plucker = get_plucker_embeddings(c2ws_pose, ks, target_h, target_w)
    c1 = target_h // latent_h
    c2 = target_w // latent_w
    plucker = plucker.reshape(n, latent_h, c1, latent_w, c2, 6)
    plucker = plucker.transpose(0, 1, 3, 5, 2, 4).reshape(
        n, latent_h, latent_w, 6 * c1 * c2)
    return plucker.transpose(3, 0, 1, 2)[None]


def build_plucker_from_c2ws(c2ws_seq: np.ndarray, src_indices, tgt_indices,
                            *, target_h: int, target_w: int, latent_h: int,
                            latent_w: int,
                            framewise: bool = True) -> np.ndarray:
    c2ws = interpolate_camera_poses_handedness(
        src_indices, c2ws_seq[:, :3, :3], c2ws_seq[:, :3, 3], tgt_indices)
    c2ws = compute_relative_poses(c2ws, framewise=framewise)
    return build_plucker_from_pose(c2ws, target_h=target_h,
                                   target_w=target_w, latent_h=latent_h,
                                   latent_w=latent_w)


def select_memory_idx_fov(extrinsics_all: np.ndarray,
                          current_start_frame_idx: int,
                          selected_index_base: list[int], *,
                          height: int = 720,
                          width: int = 1280) -> list[int]:
    """(reference utils.py:198-263): frustum-overlap memory selection."""
    if current_start_frame_idx <= 1:
        return [0] * len(selected_index_base)
    fov_rad = np.deg2rad(90.0)
    fx = width / (2 * np.tan(fov_rad / 2))
    fy = height / (2 * np.tan(fov_rad / 2))
    near, far = 0.1, 30.0

    candidates = np.arange(1, current_start_frame_idx)
    r_cand = extrinsics_all[candidates, :3, :3]
    t_cand = extrinsics_all[candidates, :3, 3:4]
    r_inv = np.swapaxes(r_cand, 1, 2)
    t_inv = -np.einsum("bij,bjk->bik", r_inv, t_cand)

    num_side = 10
    z = np.linspace(near, far, num_side, dtype=np.float32)
    xs = np.linspace(-1, 1, num_side, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, z, indexing="ij")
    points = np.stack([
        gx.reshape(-1) * gz.reshape(-1) * (width / (2 * fx)),
        gy.reshape(-1) * gz.reshape(-1) * (height / (2 * fy)),
        gz.reshape(-1),
    ])

    selected: list[int] = []
    for frame_idx in selected_index_base:
        base = extrinsics_all[frame_idx]
        pw = base[:3, :3] @ points + base[:3, 3:4]
        pc = np.einsum("bij,jk->bik", r_inv, pw) + t_inv
        x, y, zc = pc[:, 0], pc[:, 1], pc[:, 2]
        u = x * fx / np.clip(zc, 1e-6, None) + width / 2
        v = y * fy / np.clip(zc, 1e-6, None) + height / 2
        in_view = ((zc > near) & (zc < far) & (u >= 0) & (u <= width) &
                   (v >= 0) & (v <= height))
        ratios = in_view.astype(np.float32).mean(axis=1)
        selected.append(int(candidates[int(np.argmax(ratios))]))
    return selected


def create_action_presets(num_frames: int, keyboard_dim: int = 4,
                          seed: int | None = None) -> dict[str, np.ndarray]:
    """(reference utils.py:266-364): random preset action script."""
    if keyboard_dim not in (2, 4, 6, 7):
        raise ValueError(f"keyboard_dim must be 2, 4, 6, or 7, got "
                         f"{keyboard_dim}")
    if num_frames % 4 != 1:
        raise ValueError("Matrix-Game conditioning expects num_frames "
                         "to be 4k+1")
    rng = random.Random(seed)
    num_samples = 4
    if keyboard_dim == 4:
        singles = ["forward", "left", "right"]
        doubles = ["forward_left", "forward_right"]
        cameras = ["camera_l", "camera_r"]
        key_idx = {"forward": 0, "back": 1, "left": 2, "right": 3}
    elif keyboard_dim == 2:
        singles = ["forward", "back"]
        doubles = []
        cameras = ["camera_l", "camera_r"]
        key_idx = {"forward": 0, "back": 1}
    elif keyboard_dim == 6:
        singles = ["forward", "back", "left", "right"]
        doubles = ["forward_left", "forward_right"]
        cameras = ["camera_l", "camera_r"]
        key_idx = {"forward": 0, "back": 1, "left": 2, "right": 3,
                   "t1": 4, "t2": 5}
    else:
        singles = ["forward", "back", "left", "right"]
        doubles = []
        cameras = []
        key_idx = {"still": 0, "forward": 1, "back": 2, "left": 3,
                   "right": 4, "a": 5, "d": 6}
    actions = doubles * 5 + cameras * 5 + singles * 5
    for action in singles + doubles:
        for camera in cameras:
            actions.append(f"{action}_{camera}")
    if not actions:
        actions = singles * 5
    base_actions = singles + cameras
    cam_value = 0.1
    camera_map = {"camera_l": [0, -cam_value], "camera_r": [0, cam_value]}

    data = []
    for name in actions:
        kb = np.zeros((num_samples, keyboard_dim), np.float32)
        mouse = np.zeros((num_samples, 2), np.float32)
        for sub in base_actions:
            if sub not in name:
                continue
            if sub in camera_map:
                mouse = np.asarray([camera_map[sub]] * num_samples,
                                   np.float32)
            elif sub in key_idx:
                kb[:, key_idx[sub]] = 1
        data.append((kb, mouse))

    keyboard = np.zeros((num_frames, keyboard_dim), np.float32)
    mouse = np.zeros((num_frames, 2), np.float32)
    current = 0
    while current < num_frames:
        rd_frame = 12
        kb_seq, m_seq = data[rng.randint(0, len(data) - 1)]
        if current == 0:
            keyboard[:1] = kb_seq[:1]
            mouse[:1] = m_seq[:1]
            current = 1
        else:
            rd_frame = min(rd_frame, num_frames - current)
            repeat = rd_frame // 4
            keyboard[current:current + rd_frame] = np.tile(kb_seq,
                                                           (repeat, 1))
            mouse[current:current + rd_frame] = np.tile(m_seq, (repeat, 1))
            current += rd_frame
    return {"keyboard": keyboard, "mouse": mouse}


def build_matrixgame3_action_preset(num_frames: int,
                                    seed: int | None = None):
    presets = create_action_presets(num_frames, keyboard_dim=6, seed=seed)
    return presets["keyboard"], presets["mouse"]

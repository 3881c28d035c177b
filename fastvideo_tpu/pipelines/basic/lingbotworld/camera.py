"""LingBot-World camera math (host-side numpy).

Behavioral reference: /root/reference/fastvideo/models/dits/lingbotworld/
cam_utils.py (:13-203): c2w pose slerp to latent-frame count, framewise
relative poses with max-norm translation scaling, per-pixel Plücker rays
(origin ‖ direction) from the intrinsics, spatially folded 8x8 so the
maps align with the latent grid, channel-major for the DiT's camera
patch embedding.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation, Slerp


def interpolate_camera_poses(src_indices: np.ndarray, src_rot: np.ndarray,
                             src_trans: np.ndarray,
                             tgt_indices: np.ndarray) -> np.ndarray:
    """Linear translation + slerp rotation resampling -> [N, 4, 4]."""
    trans = interp1d(src_indices, src_trans, axis=0, kind="linear",
                     bounds_error=False,
                     fill_value="extrapolate")(tgt_indices)
    quats = Rotation.from_matrix(src_rot).as_quat().copy()
    for i in range(1, len(quats)):  # hemisphere continuity
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    rots = Slerp(src_indices,
                 Rotation.from_quat(quats))(tgt_indices).as_matrix()
    poses = np.zeros((len(tgt_indices), 4, 4), np.float64)
    poses[:, :3, :3] = rots
    poses[:, :3, 3] = trans
    poses[:, 3, 3] = 1.0
    return poses.astype(np.float32)


def se3_inverse(t: np.ndarray) -> np.ndarray:
    rot = t[:, :3, :3]
    trans = t[:, :3, 3:]
    inv = np.tile(np.eye(4, dtype=t.dtype), (t.shape[0], 1, 1))
    inv[:, :3, :3] = rot.transpose(0, 2, 1)
    inv[:, :3, 3:] = -rot.transpose(0, 2, 1) @ trans
    return inv


def compute_relative_poses(c2ws: np.ndarray, framewise: bool = False,
                           normalize_trans: bool = True) -> np.ndarray:
    rel = se3_inverse(c2ws[0:1]) @ c2ws
    rel[0] = np.eye(4, dtype=c2ws.dtype)
    if framewise:
        rel[1:] = se3_inverse(rel[:-1]) @ rel[1:]
    if normalize_trans:
        trans = rel[:, :3, 3]
        max_norm = np.linalg.norm(trans, axis=-1).max()
        if max_norm > 0:
            rel[:, :3, 3] = trans / max_norm
    return rel


def get_plucker_embeddings(c2ws: np.ndarray, ks: np.ndarray, height: int,
                           width: int) -> np.ndarray:
    """[F, 4, 4] poses + [F, 4] (fx, fy, cx, cy) -> [F, H, W, 6]
    (origin ‖ normalised direction)."""
    f = c2ws.shape[0]
    gy, gx = np.meshgrid(np.arange(height, dtype=np.float32),
                         np.arange(width, dtype=np.float32), indexing="ij")
    i = (gx + 0.5).reshape(-1)[None].repeat(f, axis=0)  # [F, H*W]
    j = (gy + 0.5).reshape(-1)[None].repeat(f, axis=0)
    fx, fy, cx, cy = [ks[:, n:n + 1] for n in range(4)]
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = np.stack([xs, ys, np.ones_like(i)], axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ c2ws[:, :3, :3].transpose(0, 2, 1)
    rays_o = np.broadcast_to(c2ws[:, None, :3, 3], rays_d.shape)
    return np.concatenate([rays_o, rays_d],
                          axis=-1).reshape(f, height, width, 6)


def transform_intrinsics(ks: np.ndarray, *, height_org: int, width_org: int,
                         height_final: int, width_final: int) -> np.ndarray:
    """Rescale (fx, fy, cx, cy) for resize + center crop
    (reference get_Ks_transformed)."""
    out = np.array(ks, np.float32)
    out[:, 0] *= width_final / width_org
    out[:, 1] *= height_final / height_org
    out[:, 2] *= width_final / width_org
    out[:, 3] *= height_final / height_org
    return out


def build_plucker_condition(c2ws: np.ndarray, ks: np.ndarray,
                            num_frames: int, height: int, width: int,
                            spatial_scale: int = 8,
                            temporal_scale: int = 4) -> np.ndarray:
    """Full pipeline: slerp to latent frames -> framewise relative poses
    -> Plücker maps folded (spatial_scale)^2 ->
    [1, 6*scale^2, T_lat, H/scale, W/scale]
    (reference prepare_camera_embedding:157-203; scales follow the VAE's
    compression so the maps align with the latent grid)."""
    n = min(num_frames,
            ((len(c2ws) - 1) // temporal_scale) * temporal_scale + 1)
    c2ws = np.asarray(c2ws, np.float32)[:n]
    num_latent = (n - 1) // temporal_scale + 1
    poses = interpolate_camera_poses(
        np.linspace(0, n - 1, n), c2ws[:, :3, :3], c2ws[:, :3, 3],
        np.linspace(0, n - 1, num_latent))
    poses = compute_relative_poses(poses, framewise=True)
    ks = np.broadcast_to(np.asarray(ks, np.float32).reshape(1, 4),
                         (num_latent, 4))
    plucker = get_plucker_embeddings(poses, ks, height, width)
    lh, lw = height // spatial_scale, width // spatial_scale
    plucker = plucker.reshape(num_latent, lh, spatial_scale, lw,
                              spatial_scale, 6)
    plucker = plucker.transpose(0, 1, 3, 5, 2, 4).reshape(
        num_latent, lh, lw, 6 * spatial_scale * spatial_scale)
    return plucker.transpose(3, 0, 1, 2)[None]  # [1, C_cam, T, h, w]


def load_camera_condition(action_path: str, num_frames: int, height: int,
                          width: int, spatial_scale: int = 8,
                          temporal_scale: int = 4) -> np.ndarray:
    """poses.npy + intrinsics.npy (480x832 convention) -> plucker cond."""
    c2ws = np.load(os.path.join(action_path, "poses.npy"))
    ks = np.load(os.path.join(action_path,
                              "intrinsics.npy")).astype(np.float32)
    ks = transform_intrinsics(ks, height_org=480, width_org=832,
                              height_final=height, width_final=width)
    return build_plucker_condition(c2ws, ks[0], num_frames, height, width,
                                   spatial_scale, temporal_scale)

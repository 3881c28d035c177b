"""GEN3C 3D point-cloud cache: unproject, forward-warp, splat.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/gen3c/
cache_3d.py (:17-720): depth maps unproject to world points; rendering a
target view projects the points and bilinear-SPLATS them (scatter-add with
bilinear + log-depth occlusion weights) into the target image; the buffer
keeps the newest N frames for temporal consistency.

Pure host numpy — this runs once per generation on images, not in the
denoise loop; ``np.add.at`` is the scatter-accumulate analog of torch's
``index_put_(accumulate=True)``.
"""

from __future__ import annotations

import numpy as np


def create_grid(b: int, h: int, w: int) -> np.ndarray:
    x = np.broadcast_to(np.arange(w, dtype=np.float32)[None, None, None],
                        (b, 1, h, w))
    y = np.broadcast_to(np.arange(h, dtype=np.float32)[None, None, :, None],
                        (b, 1, h, w))
    return np.concatenate([x, y], axis=1)


def unproject_points(depth: np.ndarray, w2c: np.ndarray,
                     intrinsic: np.ndarray, is_depth: bool = True,
                     mask: np.ndarray | None = None) -> np.ndarray:
    """depth (b,1,h,w) -> world points (b,h,w,3) (reference :41-105)."""
    b, _, h, w = depth.shape
    if mask is None:
        mask = depth > 0
    if mask.ndim == depth.ndim and mask.shape[1] == 1:
        mask = mask[:, 0]
    intrinsic_inv = np.linalg.inv(intrinsic.astype(np.float64))
    c2w = np.linalg.inv(w2c.astype(np.float64))

    grid = create_grid(b, h, w)  # x, y
    ones = np.ones((b, 1, h, w), np.float32)
    pos = np.stack([grid[:, 0], grid[:, 1], ones[:, 0]], axis=-1)  # b,h,w,3
    unnorm = np.einsum("bij,bhwj->bhwi", intrinsic_inv, pos)
    if is_depth:
        cam = depth[:, 0, :, :, None] * unnorm
    else:
        direction = unnorm / (np.linalg.norm(unnorm, axis=-1,
                                             keepdims=True) + 1e-8)
        cam = depth[:, 0, :, :, None] * direction
    cam_h = np.concatenate([cam, np.ones((*cam.shape[:3], 1))], axis=-1)
    world = np.einsum("bij,bhwj->bhwi", c2w, cam_h)[..., :3]
    world = np.where(mask[..., None], world, 0.0)
    return world.astype(np.float32)


def project_points(world_points: np.ndarray, w2c: np.ndarray,
                   intrinsic: np.ndarray) -> np.ndarray:
    """world (b,h,w,3) -> projected (b,h,w,3) [x*z, y*z, z]
    (reference :108-137)."""
    b, h, w, _ = world_points.shape
    homo = np.concatenate(
        [world_points, np.ones((b, h, w, 1), world_points.dtype)], axis=-1)
    cam = np.einsum("bij,bhwj->bhwi", w2c.astype(np.float32), homo)[..., :3]
    return np.einsum("bij,bhwj->bhwi", intrinsic.astype(np.float32), cam)


def bilinear_splatting(frame1: np.ndarray, mask1: np.ndarray | None,
                       depth1: np.ndarray, flow12: np.ndarray,
                       is_image: bool = False,
                       depth_weight_scale: float = 50.0
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Forward-warp by scatter-add splatting (reference :139-260)."""
    b, c, h, w = frame1.shape
    if mask1 is None:
        mask1 = np.ones((b, 1, h, w), np.float32)
    grid = create_grid(b, h, w)
    trans_pos = flow12 + grid + 1.0
    pos_floor = np.floor(trans_pos).astype(np.int64)
    pos_ceil = np.ceil(trans_pos).astype(np.int64)
    trans_pos = np.stack([np.clip(trans_pos[:, 0], 0, w + 1),
                          np.clip(trans_pos[:, 1], 0, h + 1)], axis=1)
    pos_floor = np.stack([np.clip(pos_floor[:, 0], 0, w + 1),
                          np.clip(pos_floor[:, 1], 0, h + 1)], axis=1)
    pos_ceil = np.stack([np.clip(pos_ceil[:, 0], 0, w + 1),
                         np.clip(pos_ceil[:, 1], 0, h + 1)], axis=1)

    w_nw = ((1 - (trans_pos[:, 1:2] - pos_floor[:, 1:2])) *
            (1 - (trans_pos[:, 0:1] - pos_floor[:, 0:1])))
    w_sw = ((1 - (pos_ceil[:, 1:2] - trans_pos[:, 1:2])) *
            (1 - (trans_pos[:, 0:1] - pos_floor[:, 0:1])))
    w_ne = ((1 - (trans_pos[:, 1:2] - pos_floor[:, 1:2])) *
            (1 - (pos_ceil[:, 0:1] - trans_pos[:, 0:1])))
    w_se = ((1 - (pos_ceil[:, 1:2] - trans_pos[:, 1:2])) *
            (1 - (pos_ceil[:, 0:1] - trans_pos[:, 0:1])))

    clamped = np.clip(depth1, 0, None)
    log_depth = np.log1p(clamped)
    exponent = log_depth / (log_depth.max() + 1e-7) * depth_weight_scale
    depth_weights = np.exp(np.clip(exponent, None, 80.0)) + 1e-7

    def cl(x):  # [b,1,h,w] -> [b,h,w,1]
        return np.moveaxis(x * mask1 / depth_weights, 1, 3)

    weights = [cl(w_nw), cl(w_sw), cl(w_ne), cl(w_se)]
    frame_cl = np.moveaxis(frame1, 1, 3)  # b,h,w,c
    warped = np.zeros((b, h + 2, w + 2, c), np.float32)
    warped_w = np.zeros((b, h + 2, w + 2, 1), np.float32)
    b_idx = np.arange(b)[:, None, None]
    corners = [(pos_floor[:, 1], pos_floor[:, 0]),
               (pos_ceil[:, 1], pos_floor[:, 0]),
               (pos_floor[:, 1], pos_ceil[:, 0]),
               (pos_ceil[:, 1], pos_ceil[:, 0])]
    for (yy, xx), wgt in zip(corners, weights):
        np.add.at(warped, (b_idx, yy, xx), frame_cl * wgt)
        np.add.at(warped_w, (b_idx, yy, xx), wgt)
    warped = np.moveaxis(warped, 3, 1)[:, :, 1:-1, 1:-1]
    warped_w = np.moveaxis(warped_w, 3, 1)[:, :, 1:-1, 1:-1]
    warped_w = np.nan_to_num(warped_w, nan=1000.0)
    mask = warped_w > 0
    zero = -1.0 if is_image else 0.0
    out = np.where(mask, warped / np.where(mask, warped_w, 1.0), zero)
    if is_image:
        out = np.clip(out, -1.0, 1.0)
    return out.astype(np.float32), mask.astype(np.float32)


def forward_warp(frame1: np.ndarray, mask1: np.ndarray | None,
                 transformation2: np.ndarray, intrinsic2: np.ndarray,
                 world_points1: np.ndarray,
                 is_image: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Warp frame1 (with known world points) to the view of
    transformation2 (reference :263-330)."""
    b, c, h, w = frame1.shape
    if mask1 is None:
        mask1 = np.ones((b, 1, h, w), np.float32)
    trans = project_points(world_points1, transformation2, intrinsic2)
    mask1 = mask1 * (trans[..., 2] > 0)[:, None]
    coords = trans[..., :2] / (trans[..., 2:3] + 1e-7)
    coords = np.moveaxis(coords, 3, 1)  # b,2,h,w
    depth = trans[..., 2][:, None]
    flow12 = coords - create_grid(b, h, w)
    return bilinear_splatting(frame1, mask1, depth, flow12,
                              is_image=is_image)


def reliable_depth_mask(depth: np.ndarray, window_size: int = 5,
                        ratio_thresh: float = 0.05,
                        eps: float = 1e-6) -> np.ndarray:
    """Local-variation depth reliability (reference :333-371)."""
    from scipy.ndimage import maximum_filter, minimum_filter, uniform_filter

    if depth.ndim == 3:
        depth = depth[:, None]
    size = (1, 1, window_size, window_size)
    local_max = maximum_filter(depth, size=size, mode="nearest")
    local_min = minimum_filter(depth, size=size, mode="nearest")
    local_mean = uniform_filter(depth, size=size, mode="nearest")
    ratio = (local_max - local_min) / (local_mean + eps)
    return (ratio < ratio_thresh) & (depth > 0)


class Cache3DBuffer:
    """Frame-buffered point-cloud cache (reference :374-720, simplified to
    the single-view B x N layout the GEN3C pipeline uses)."""

    def __init__(self, input_image: np.ndarray, input_depth: np.ndarray,
                 input_w2c: np.ndarray, input_intrinsics: np.ndarray,
                 frame_buffer_max: int = 2,
                 noise_aug_strength: float = 0.0,
                 filter_points_threshold: float = 1.0,
                 seed: int = 42):
        """input_image [B, C, H, W] in [-1, 1]; input_depth [B, 1, H, W];
        input_w2c [B, 4, 4]; input_intrinsics [B, 3, 3]."""
        self.frame_buffer_max = frame_buffer_max
        self.noise_aug_strength = noise_aug_strength
        self.filter_points_threshold = filter_points_threshold
        self.rng = np.random.default_rng(seed)

        depth = np.clip(np.nan_to_num(input_depth, nan=100.0), 0, 100)
        points = unproject_points(depth, input_w2c, input_intrinsics)
        mask = None
        if filter_points_threshold < 1.0:
            mask = reliable_depth_mask(
                depth, ratio_thresh=filter_points_threshold).astype(
                    np.float32)
        # buffers: lists of (image [B,C,H,W], points [B,H,W,3],
        # mask [B,1,H,W] | None), newest first
        self.buffers = [(input_image.astype(np.float32), points, mask)]

    def input_frame_count(self) -> int:
        return len(self.buffers)

    def update_cache(self, new_image: np.ndarray, new_depth: np.ndarray,
                     new_w2c: np.ndarray,
                     new_intrinsics: np.ndarray) -> None:
        depth = np.clip(np.nan_to_num(new_depth, nan=1e4), 0, 1e4)
        points = unproject_points(depth, new_w2c, new_intrinsics)
        mask = None
        if self.filter_points_threshold < 1.0:
            mask = reliable_depth_mask(
                depth, ratio_thresh=self.filter_points_threshold).astype(
                    np.float32)
        self.buffers.insert(0, (new_image.astype(np.float32), points, mask))
        if len(self.buffers) > self.frame_buffer_max:
            self.buffers = self.buffers[:self.frame_buffer_max]

    def render_cache(self, target_w2cs: np.ndarray,
                     target_intrinsics: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
        """target_w2cs [B, F, 4, 4] -> (images [B, F, N, 3, H, W],
        masks [B, F, N, 1, H, W])."""
        b, f = target_w2cs.shape[:2]
        n = len(self.buffers)
        imgs = []
        masks = []
        for fi in range(f):
            per_buffer_img = []
            per_buffer_mask = []
            for image, points, mask in self.buffers:
                out, m = forward_warp(image,
                                      mask, target_w2cs[:, fi],
                                      target_intrinsics[:, fi], points,
                                      is_image=True)
                per_buffer_img.append(out)
                per_buffer_mask.append(m[:, :1])
            imgs.append(np.stack(per_buffer_img, axis=1))
            masks.append(np.stack(per_buffer_mask, axis=1))
        pixels = np.stack(imgs, axis=1)  # B,F,N,3,H,W
        out_masks = np.stack(masks, axis=1)
        if self.noise_aug_strength > 0:
            noise = self.rng.standard_normal(pixels.shape).astype(
                np.float32)
            per_buffer = (np.arange(n - 1, -1, -1, dtype=np.float32) *
                          self.noise_aug_strength)
            pixels = pixels + noise * per_buffer.reshape(1, 1, -1, 1, 1, 1)
        return pixels, out_masks

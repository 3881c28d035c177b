"""GEN3C camera trajectory generation.

Behavioral reference: /root/reference/fastvideo/pipelines/basic/gen3c/
camera_utils.py (:10-203): look-at linear/spiral trajectories around the
initial camera, composed with the source world-to-camera. Host numpy.
"""

from __future__ import annotations

import math

import numpy as np


def look_at_matrix(camera_pos: np.ndarray,
                   target: np.ndarray) -> np.ndarray:
    forward = (target - camera_pos).astype(np.float64)
    forward = forward / np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    look = np.eye(4)
    look[0, :3] = right
    look[1, :3] = up
    look[2, :3] = forward
    look[:3, 3] = -camera_pos
    return look


def _finish(trajectory: list[np.ndarray],
            initial_w2c: np.ndarray) -> np.ndarray:
    traj = np.stack(trajectory)
    return (traj @ initial_w2c[None]).astype(np.float32)


def create_horizontal_trajectory(initial_w2c: np.ndarray,
                                 center_depth: float, positive: bool,
                                 n_steps: int, distance: float, axis: str,
                                 camera_rotation: str) -> np.ndarray:
    target = np.array([0.0, 0.0, center_depth])
    trajectory = []
    for i in range(n_steps):
        offset = i * distance * center_depth / n_steps * (
            1 if positive else -1)
        pos = {"x": [offset, 0, 0], "y": [0, offset, 0],
               "z": [0, 0, offset]}[axis]
        pos = np.asarray(pos, np.float64)
        if camera_rotation == "trajectory_aligned":
            look = target + pos * 2
        elif camera_rotation == "center_facing":
            look = target
        elif camera_rotation == "no_rotation":
            look = target + pos
        else:
            raise ValueError(f"bad camera_rotation {camera_rotation}")
        trajectory.append(look_at_matrix(pos, look))
    return _finish(trajectory, initial_w2c)


def create_spiral_trajectory(initial_w2c: np.ndarray, center_depth: float,
                             radius_x: float, radius_y: float,
                             positive: bool, camera_rotation: str,
                             n_steps: int, radius_z: float = 0.0,
                             start_from_zero: bool = True,
                             num_circles: int = 1) -> np.ndarray:
    target = np.array([0.0, 0.0, center_depth])
    theta_max = 2 * math.pi * num_circles
    trajectory = []
    for i in range(n_steps):
        theta = theta_max * i / (n_steps - 1)
        if start_from_zero:
            x = radius_x * (math.cos(theta) - 1) * (
                1 if positive else -1) * center_depth
        else:
            x = radius_x * math.cos(theta) * center_depth
        y = radius_y * math.sin(theta) * center_depth
        z = radius_z * math.sin(theta) * center_depth
        pos = np.array([x, y, z])
        if camera_rotation == "center_facing":
            look = target
        elif camera_rotation == "trajectory_aligned":
            look = target + pos * 2
        elif camera_rotation == "no_rotation":
            look = target + pos
        else:
            raise ValueError(f"bad camera_rotation {camera_rotation}")
        trajectory.append(look_at_matrix(pos, look))
    return _finish(trajectory, initial_w2c)


def generate_camera_trajectory(trajectory_type: str,
                               initial_w2c: np.ndarray,
                               initial_intrinsics: np.ndarray,
                               num_frames: int, movement_distance: float,
                               camera_rotation: str = "center_facing",
                               center_depth: float = 1.0
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Returns ([1, F, 4, 4] w2cs, [1, F, 3, 3] intrinsics)
    (reference :130-203)."""
    if trajectory_type in ("clockwise", "counterclockwise"):
        w2cs = create_spiral_trajectory(
            initial_w2c, center_depth, movement_distance,
            movement_distance, trajectory_type == "clockwise",
            camera_rotation, num_frames)
    elif trajectory_type == "none":
        w2cs = np.broadcast_to(initial_w2c[None],
                               (num_frames, 4, 4)).astype(np.float32)
    else:
        axis_map = {"left": (False, "x"), "right": (True, "x"),
                    "up": (False, "y"), "down": (True, "y"),
                    "zoom_in": (True, "z"), "zoom_out": (False, "z")}
        if trajectory_type not in axis_map:
            raise ValueError(
                f"Unsupported trajectory type: {trajectory_type}")
        positive, axis = axis_map[trajectory_type]
        w2cs = create_horizontal_trajectory(initial_w2c, center_depth,
                                            positive, num_frames,
                                            movement_distance, axis,
                                            camera_rotation)
    intr = np.broadcast_to(initial_intrinsics[None],
                           (num_frames, 3, 3)).astype(np.float32)
    return w2cs[None], intr[None]

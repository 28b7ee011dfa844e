"""Analytic synthetic RGB-D scenes with ground truth, for tests and demos.

The reference ships no tests and no synthetic data; this module provides the
golden-scene harness SURVEY.md §4 calls for: a box room (background,
instance 0) containing colored spheres (instances 4, 5, ...), rendered
analytically per pixel — exact depth, color, and instance maps from any
camera pose, so trained fields can be scored against closed-form truth
(depth error, PSNR, silhouette IoU).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Sphere:
    center: np.ndarray
    radius: float
    color: np.ndarray  # [3] in 0..1
    inst_id: int


@dataclass
class BoxRoom:
    half_extent: np.ndarray  # room spans [-he, he]
    color: np.ndarray
    inst_id: int = 0


@dataclass
class SyntheticScene:
    room: BoxRoom
    spheres: list[Sphere] = field(default_factory=list)

    def render(self, t_wc: np.ndarray, dirs_c: np.ndarray):
        """Render exact rgb (uint8 [H,W,3]), depth (f32 [H,W], z-depth
        convention), inst (int32 [H,W]) from camera pose t_wc using the
        cached camera-frame dirs [H,W,3] (z=1 plane, unnormalized)."""
        h, w, _ = dirs_c.shape
        r = t_wc[:3, :3]
        o = t_wc[:3, 3]
        d = dirs_c.reshape(-1, 3) @ r.T       # world dirs, |d_z-cam| scaling kept
        o = np.broadcast_to(o, d.shape)

        # room: from inside a box, take the exit (max) slab intersection
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t_lo = (-self.room.half_extent - o) * inv
        t_hi = (self.room.half_extent - o) * inv
        t_exit = np.minimum.reduce([np.maximum(t_lo, t_hi)[:, i] for i in range(3)])
        best_t = t_exit.copy()
        color = np.broadcast_to(self.room.color, (d.shape[0], 3)).copy()
        inst = np.full(d.shape[0], self.room.inst_id, np.int32)

        for s in self.spheres:
            oc = o - s.center
            b = np.sum(oc * d, -1)
            a = np.sum(d * d, -1)
            c = np.sum(oc * oc, -1) - s.radius**2
            disc = b * b - a * c
            hit = disc > 0
            t = (-b - np.sqrt(np.maximum(disc, 0.0))) / a
            hit &= (t > 1e-4) & (t < best_t)
            best_t = np.where(hit, t, best_t)
            color[hit] = s.color
            inst[hit] = s.inst_id

        # z-depth = t * dir_z(camera frame); camera dirs have z=1 => depth = t
        depth = best_t.reshape(h, w).astype(np.float32)
        rgb = (color.reshape(h, w, 3) * 255).astype(np.uint8)
        return rgb, depth, inst.reshape(h, w)


def default_scene(n_spheres: int = 2) -> SyntheticScene:
    rng = np.random.default_rng(7)
    colors = np.array(
        [[0.85, 0.2, 0.15], [0.15, 0.55, 0.85], [0.2, 0.8, 0.3],
         [0.9, 0.8, 0.1], [0.7, 0.3, 0.8]]
    )
    spheres = []
    for i in range(n_spheres):
        ang = 2 * np.pi * i / max(n_spheres, 1)
        spheres.append(
            Sphere(
                center=np.array([1.2 * np.cos(ang), 1.2 * np.sin(ang), 0.0]),
                radius=0.35 + 0.1 * (i % 2),
                color=colors[i % len(colors)],
                inst_id=4 + i,
            )
        )
    return SyntheticScene(
        room=BoxRoom(half_extent=np.array([3.0, 3.0, 2.0]), color=np.array([0.6, 0.6, 0.55])),
        spheres=spheres,
    )


def orbit_pose(angle: float, radius: float = 2.6, height: float = 0.0) -> np.ndarray:
    """Camera on a horizontal orbit, looking at the origin. OpenCV-style
    camera: +z forward, +x right, +y down."""
    eye = np.array([radius * np.cos(angle), radius * np.sin(angle), height])
    fwd = -eye / np.linalg.norm(eye)
    up_w = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up_w)
    right /= np.linalg.norm(right)
    y_cam = np.cross(fwd, right)  # right-handed basis: z = x cross y
    y_cam /= np.linalg.norm(y_cam)
    t = np.eye(4)
    t[:3, 0] = right
    t[:3, 1] = y_cam
    t[:3, 2] = fwd
    t[:3, 3] = eye
    return t


def make_sequence(scene: SyntheticScene, dirs_c: np.ndarray, n_frames: int = 12):
    """Yield (rgb, depth, inst, t_wc) around an orbit."""
    for i in range(n_frames):
        t_wc = orbit_pose(2 * np.pi * i / n_frames)
        rgb, depth, inst = scene.render(t_wc, dirs_c)
        yield rgb, depth, inst, t_wc

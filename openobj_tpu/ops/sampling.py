"""Ray math and fixed-shape z-sampling.

Behavioural parity:
  * ``stratified_bins`` — per-ray uniform-jittered depth bins
    (reference utils.py:342-379);
  * ``normal_bins`` — sorted N(depth, (eps/3)^2) clipped to +-eps around the
    surface (reference utils.py:382-397);
  * ``ray_box_intersection`` — slab test (reference utils.py:309-319);
  * ``origin_dirs_w`` — camera->world ray transform (reference utils.py:324-336);
  * ``sample_z_values`` — the 3-mode per-ray strategy of
    ``sceneObject.sample_3d_points`` (reference vmap.py:456-554), rebuilt
    TPU-first: all three depth lattices are computed for every ray and
    selected per-ray with ``jnp.where`` — no data-dependent shapes, so the
    whole sampler jits into one fused program.

Pixel states (reference vmap.py:117-120): 0 = other object, 1 = this object,
2 = unknown.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STATE_OTHER = 0
STATE_THIS = 1
STATE_UNKNOWN = 2


def stratified_bins(
    key: jax.Array,
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    n_bins: int,
    shape: tuple[int, ...],
) -> jnp.ndarray:
    """Uniform-jittered bins in [min_depth, max_depth] per ray.

    min_depth/max_depth broadcast against ``shape`` (the ray shape);
    returns [*shape, n_bins]. Matches reference utils.py:342-379: bin i
    starts at min + i*(range/n) and gets a U(0, range/n) jitter.
    """
    min_depth = jnp.broadcast_to(jnp.asarray(min_depth, jnp.float32), shape)
    max_depth = jnp.broadcast_to(jnp.asarray(max_depth, jnp.float32), shape)
    depth_range = max_depth - min_depth
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)[:-1]  # lower bin edges
    lower = depth_range[..., None] * edges + min_depth[..., None]
    jitter = jax.random.uniform(key, (*shape, n_bins)) * (
        depth_range[..., None] / n_bins
    )
    return lower + jitter


def normal_bins(
    key: jax.Array,
    depth: jnp.ndarray,
    n_bins: int,
    delta: float,
    method: str = "spacings",
) -> jnp.ndarray:
    """Sorted N(0, (delta/3)^2) offsets clipped to +-delta around ``depth``
    (reference utils.py:382-397). depth: [...]; returns [..., n_bins].

    method "spacings" (default) draws the order statistics DIRECTLY: sorted
    U(0,1) samples are cumsum(E_1..E_n) / sum(E_1..E_{n+1}) with E ~ Exp(1)
    (the exponential-spacings construction), and pushing sorted uniforms
    through the monotone normal inverse CDF yields exactly the distribution
    of sort(normal(n)) — same law as the reference's sample-then-sort, with
    NO sort (the [.., 9]-wide sort custom-call was ~6% of the room_0
    per-frame device time). method "sort" keeps the literal formulation.
    """
    if method == "sort":
        bins = jax.random.normal(key, (*depth.shape, n_bins)) * (delta / 3.0)
        bins = jnp.sort(bins, axis=-1)
    else:
        e = jax.random.exponential(key, (*depth.shape, n_bins + 1))
        csum = jnp.cumsum(e[..., :-1], axis=-1)
        u = csum / (csum[..., -1:] + e[..., -1:])
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        bins = jax.scipy.special.ndtri(u) * (delta / 3.0)
    bins = jnp.clip(bins, -delta, delta)
    return depth[..., None] + bins


def ray_box_intersection(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    bounds_min: jnp.ndarray,
    bounds_max: jnp.ndarray,
):
    """Slab test (reference utils.py:309-319).

    origins/directions: [..., 3]; bounds: [3]. Returns (near, far, hit)
    with shapes [...]. A ray hits iff near <= far and far > 0.
    """
    inv = 1.0 / directions
    tmin = (bounds_min - origins) * inv
    tmax = (bounds_max - origins) * inv
    t1 = jnp.minimum(tmin, tmax)
    t2 = jnp.maximum(tmin, tmax)
    near = jnp.max(t1, axis=-1)
    far = jnp.min(t2, axis=-1)
    hit = (near <= far) & (far > 0)
    return near, far, hit


def origin_dirs_w(t_wc: jnp.ndarray, dirs_c: jnp.ndarray):
    """Transform camera-frame ray directions into the world frame.

    t_wc: [..., 4, 4]; dirs_c: [..., 3] (broadcastable against t_wc's
    leading dims). Returns (origins [..., 3], dirs_w [..., 3]).
    (Reference utils.py:324-336.)
    """
    r = t_wc[..., :3, :3]
    dirs_w = jnp.einsum("...ij,...j->...i", r, dirs_c)
    origins = jnp.broadcast_to(t_wc[..., :3, 3], dirs_w.shape)
    return origins, dirs_w


def sample_z_values(
    key: jax.Array,
    depth: jnp.ndarray,
    state: jnp.ndarray,
    min_bound: float,
    n_bins_cam2surface: int,
    n_bins: int,
    surface_eps: float,
    stop_eps: float,
    max_bound: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fixed-shape 3-mode z sampling (reference vmap.py:456-554).

    depth: [...] ground-truth depth per ray; state: [...] pixel state.
    Returns z [..., n_bins_cam2surface + n_bins]:

      * invalid depth (d <= min_bound): all bins stratified in
        [min_bound, max_bound] (default: max(depth) over the batch, the
        reference's per-object batch max vmap.py:493 — pass a per-object
        keepdims max when depth carries a stacked object axis);
      * valid + this object: front bins stratified in [min_bound, d - eps],
        back bins sorted-normal N(d, (eps/3)^2) clipped +-eps;
      * valid + other/unknown: same front bins, back bins stratified in
        [d - eps, d + stop_eps].
    """
    k_all, k_front, k_this, k_other = jax.random.split(key, 4)
    shape = depth.shape
    total = n_bins_cam2surface + n_bins
    if max_bound is None:
        max_bound = jnp.max(depth)  # batch max (reference vmap.py:493)

    z_invalid = stratified_bins(k_all, min_bound, max_bound, total, shape)
    # clamp the front-interval top to min_bound: a valid surface closer
    # than min_bound + surface_eps would otherwise produce a DESCENDING
    # (even negative) front lattice, breaking the front-to-back ordering
    # the termination cumprod assumes (the reference inherits this defect
    # at close range, vmap.py:517; deviation: bins collapse to min_bound)
    z_front = stratified_bins(
        k_front, min_bound, jnp.maximum(depth - surface_eps, min_bound),
        n_bins_cam2surface, shape,
    )
    z_this = normal_bins(k_this, depth, n_bins, surface_eps)
    z_other = stratified_bins(
        k_other, jnp.maximum(depth - surface_eps, min_bound),
        depth + stop_eps, n_bins, shape,
    )

    is_this = (state == STATE_THIS)[..., None]
    z_back = jnp.where(is_this, z_this, z_other)
    z_valid = jnp.concatenate([z_front, z_back], axis=-1)

    invalid = (depth <= min_bound)[..., None]
    return jnp.where(invalid, z_invalid, z_valid)


def rays_to_points(
    origins: jnp.ndarray,
    dirs_w: jnp.ndarray,
    z: jnp.ndarray,
    obj_center: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """points[..., p, :] = origin + dir * z_p - obj_center
    (reference vmap.py:548-551)."""
    pts = origins[..., None, :] + dirs_w[..., None, :] * z[..., None]
    return pts - obj_center


def camera_ray_dirs(
    width: int, height: int, fx: float, fy: float, cx: float, cy: float,
    depth_type: str = "z",
) -> jnp.ndarray:
    """Cached per-pixel camera-frame ray directions, [H, W, 3].

    Matches the reference ``cameraInfo.rays_dir_cache`` (vmap.py:689-720):
    x = (u - cx)/fx, y = (v - cy)/fy, z = 1 (integer pixel indices, no
    half-pixel offset); for depth_type 'z' (Replica/ScanNet z-depth) dirs are
    NOT normalized so that z-depth values multiply directly. Row index = v
    (height), col = u (width); the reference stores the transposed [W, H]
    layout — we use [H, W].
    """
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    x = (u - cx) / fx  # [W]
    y = (v - cy) / fy  # [H]
    xx, yy = jnp.meshgrid(x, y, indexing="xy")  # [H, W]
    dirs = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    if depth_type == "euclidean":
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs

"""Two-pass (coarse + importance) triplane volume renderer.

Spec: eg3d/training/volumetric_rendering/renderer.py. TPU redesign
notes:

- Static shapes throughout: rays x samples tensors, jit-friendly.
- Triplane lookup keeps features channels-last and gathers the whole
  2x2 bilinear footprint with ONE take per plane
  (spi_tpu.ops.grid_sample.quad_sample_nhwc — TPU gathers are
  latency-bound per index).
- The coarse+fine union is composited WITHOUT sorting: both sample
  groups are ascending by construction (jittered linspace; sorted
  uniforms through the inverse CDF), so the union is a rank-based
  two-sorted-list merge (ray_marcher.march_rays_merge) — lane-axis
  sort/gather lower pathologically on TPU.
- The plane projection (renderer.py:23-53) is three fixed axis picks —
  (x,y), (x,z), (z,x) — rather than a batched matrix inverse.
- Importance sampling (renderer.py:194-253) runs under stop_gradient;
  the inverse-CDF bracketing uses masked reductions over the bins, not
  searchsorted+gather (see sample_pdf).
- Rays are processed in checkpointed chunks (RenderingOptions.ray_chunk)
  to bound activation HBM during multi-camera backward passes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from spi_tpu.models.rendering import math_utils
from spi_tpu.models.rendering.ray_marcher import march_rays, march_rays_merge
from spi_tpu.ops import plane_splat
from spi_tpu.ops.grid_sample import quad_sample_nhwc
from spi_tpu.ops.plane_splat import RayGeom


def save_plane_feats_policy():
    """Remat policy for render subgraphs: save the gathered plane
    features (checkpoint_name 'plane_feats' in _render_rays_inner),
    rematerialize the rest (ray math, MLP hiddens, march)."""
    return jax.checkpoint_policies.save_only_these_names("plane_feats")


@dataclasses.dataclass(frozen=True)
class RenderingOptions:
    """Static subset of the pickled rendering_kwargs that the renderer
    consumes (eg3d/training/triplane.py:44, renderer.py:91-140)."""

    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    ray_start: float | str = 2.25  # 'auto' = box intersection
    ray_end: float | str = 3.3
    box_warp: float = 1.0
    disparity_space_sampling: bool = False
    white_back: bool = False
    clamp_mode: str = "softplus"
    # density_noise is only used in GAN training (renderer.py:146-147)
    density_noise: float = 0.0
    # Rays per sequential chunk. Rays are independent, so chunking is
    # exact; each chunk is checkpointed, bounding activation HBM to one
    # chunk's gathers/MLP hiddens (the full 16384-ray x 96-sample pass
    # peaks at multiple 1.5 GB corner-gather tensors otherwise). None =
    # single pass.
    ray_chunk: int | None = 4096
    # Single-camera renders (the stage-1 'sg'/'sgw+' step and the
    # stage-2 recon term — the most-executed programs in the system) run
    # UNCHUNKED: the jax.checkpoint around each chunk otherwise re-runs
    # the whole gather+decode+march forward inside the backward, and a
    # batch-1 pass's live activations fit HBM comfortably (the gather
    # VJP only keeps the bilinear weights and row indices, not the
    # quad-row tensors). Multi-camera passes keep the chunked+remat
    # path. Set False to chunk everything (tight-memory configs).
    unchunked_single_camera: bool = True
    # Backward of the triplane gather: 'windowed' uses the Pallas
    # windowed-splat kernel (ops/plane_splat.py, ~3-5 ns/row on v5e vs
    # XLA scatter's ~15.6), 'xla' the autodiff scatter, 'auto' picks
    # windowed on TPU whenever the pass geometry admits it. NOTE the
    # windowed path returns ZERO gradient for the sample coordinates —
    # sound for every render in this codebase (coarse depths carry no
    # parameter gradient and importance depths are stop_gradient'ed);
    # set 'xla' if you ever differentiate w.r.t. cameras.
    plane_splat: str = "auto"


def project_onto_planes(coordinates):
    """(N, M, 3) -> (N, 3, M, 2): per-plane 2D projections.

    Equivalent to renderer.py:39-53 with the canonical EG3D plane axes
    (renderer.py:23-37): plane 0 reads (x, y), plane 1 reads (x, z),
    plane 2 reads (z, x).
    """
    x, y, z = coordinates[..., 0], coordinates[..., 1], coordinates[..., 2]
    p0 = jnp.stack([x, y], axis=-1)
    p1 = jnp.stack([x, z], axis=-1)
    p2 = jnp.stack([z, x], axis=-1)
    return jnp.stack([p0, p1, p2], axis=1)


def _sample_planes_math(plane_features_nhwc, coordinates, box_warp: float):
    """Single-table core of sample_from_planes: (1|N, 3, HW, C) tables
    at (N, M, 3) points -> (N, 3, M, C)."""
    n_tab, n_planes, hw, c = plane_features_nhwc.shape
    h = w = int(round(hw**0.5))
    assert h * w == hw
    coords = coordinates * (2.0 / box_warp)
    grids = project_onto_planes(coords)  # (N, 3, M, 2)
    # One quad-row take per plane (static Python loop: per-plane 2D
    # tables gather measurably faster than one batched 3-plane gather).
    outs = [
        quad_sample_nhwc(plane_features_nhwc[:, p], grids[:, p], h, w)
        for p in range(n_planes)
    ]
    return jnp.stack(outs, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_planes_windowed(plane_features_nhwc, coordinates, box_warp, geom):
    """sample_from_planes core with the windowed-splat backward.

    Forward identical to _sample_planes_math; the backward replaces the
    XLA gather-VJP scatter with the Pallas windowed splat
    (ops/plane_splat.py). Returns ZERO cotangent for `coordinates` —
    callers guarantee the coordinates carry no parameter gradient
    (coarse depths are camera-only, importance depths stop_gradient'ed).
    """
    return _sample_planes_math(plane_features_nhwc, coordinates, box_warp)


def _sample_planes_windowed_fwd(planes, coords, box_warp, geom):
    out = _sample_planes_math(planes, coords, box_warp)
    # Residuals must be JAX types: carry the plane dtype as a size-0
    # token and recover the (square) table side from a 1-element shape
    # probe. geom_supported pins h = w = 256 today, but keep it general.
    shape_token = jnp.zeros((planes.shape[2], 0), planes.dtype)
    return out, (shape_token, coords)


def _sample_planes_windowed_bwd(box_warp, geom, res, g):
    shape_token, coords = res
    hw = shape_token.shape[0]
    planes_dtype = shape_token.dtype
    h = w = int(round(hw**0.5))
    grids = project_onto_planes(
        jax.lax.stop_gradient(coords) * (2.0 / box_warp)
    )  # (1, 3, M, 2) in [-1, 1]
    # align_corners=False texel mapping (matches ops.grid_sample).
    fx = ((grids[..., 0] + 1.0) * w - 1.0) * 0.5
    fy = ((grids[..., 1] + 1.0) * h - 1.0) * 0.5
    tex = jnp.stack([fx, fy], axis=-1)
    d = plane_splat.splat_planes(
        tex, g, geom, h, w, interpret=jax.default_backend() != "tpu"
    )
    return d.astype(planes_dtype), jnp.zeros_like(coords)


_sample_planes_windowed.defvjp(
    _sample_planes_windowed_fwd, _sample_planes_windowed_bwd
)


def sample_from_planes(plane_features_nhwc, coordinates, box_warp: float,
                       geom: RayGeom | None = None, impl: str = "auto"):
    """Bilinear-sample triplane features at 3D points.

    Args:
      plane_features_nhwc: (N, 3, H*W, C) channels-last plane tables.
      coordinates: (N, M, 3) world-space points.
      box_warp: side length of the [-1,1]-normalized cube.
      geom: static ray-bundle structure of the pass (enables the
        windowed-splat backward); None falls back to XLA autodiff.
      impl: 'auto' | 'windowed' | 'xla' (see RenderingOptions.plane_splat).

    Returns:
      (N, 3, M, C) per-plane features. (renderer.py:55-65)
    """
    n_tab, n_planes, hw, c = plane_features_nhwc.shape
    n, m, _ = coordinates.shape
    if n_tab == 1 and n > 1:
        # Shared planes across a camera batch (synthesis_from_planes):
        # merge the batch into the POINT axis so each plane is ONE 2D
        # gather from one table — XLA's batched gather over broadcast
        # tables costs ~1.4x per index (and the backward scatter
        # similarly), measured 5.6x total on a batch-4 render backward.
        out = sample_from_planes(
            plane_features_nhwc, coordinates.reshape(1, n * m, 3), box_warp,
            geom=geom, impl=impl,
        )  # (1, 3, N*M, C)
        return jnp.transpose(out[0].reshape(n_planes, n, m, c), (1, 0, 2, 3))
    assert n_tab == n, (n_tab, n)
    h = w = int(round(hw**0.5))
    use_windowed = (
        impl in ("auto", "windowed")
        and n == 1
        and 128 % c == 0  # lane alignment of the kernel's ox*C offset
        and plane_splat.geom_supported(geom, h, w, m)
        and (impl == "windowed" or jax.default_backend() == "tpu")
    )
    if use_windowed:
        return _sample_planes_windowed(
            plane_features_nhwc, coordinates, box_warp, geom
        )
    return _sample_planes_math(plane_features_nhwc, coordinates, box_warp)


def sample_stratified(rng, ray_origins, ray_start, ray_end, depth_resolution: int,
                      disparity_space_sampling: bool = False):
    """Jittered uniform depths (renderer.py:169-192).

    ray_start/ray_end: scalars, or (N, M, 1) arrays from the auto box
    intersection. Returns (N, M, S, 1).
    """
    n, m, _ = ray_origins.shape
    s = depth_resolution
    if disparity_space_sampling:
        depths = jnp.linspace(0.0, 1.0, s, dtype=jnp.float32).reshape(1, 1, s, 1)
        depths = jnp.broadcast_to(depths, (n, m, s, 1))
        delta = 1.0 / (s - 1)
        depths = depths + jax.random.uniform(rng, (n, m, s, 1)) * delta
        return 1.0 / (1.0 / ray_start * (1.0 - depths) + 1.0 / ray_end * depths)

    if isinstance(ray_start, (float, int)):
        depths = jnp.linspace(float(ray_start), float(ray_end), s, dtype=jnp.float32)
        depths = jnp.broadcast_to(depths.reshape(1, 1, s, 1), (n, m, s, 1))
        delta = (float(ray_end) - float(ray_start)) / (s - 1)
        return depths + jax.random.uniform(rng, (n, m, s, 1)) * delta

    # Per-ray tensor bounds: linspace along a leading axis then move it in.
    depths = math_utils.linspace_batched(ray_start, ray_end, s)  # (S, N, M, 1)
    depths = jnp.moveaxis(depths, 0, 2)  # (N, M, S, 1)
    delta = (ray_end - ray_start) / (s - 1)  # (N, M, 1)
    return depths + jax.random.uniform(rng, (n, m, s, 1)) * delta[..., None]


def sample_pdf(rng, bins, weights, n_importance: int, det: bool = False, eps: float = 1e-5):
    """Inverse-CDF sampling (renderer.py:214-253).

    bins: (R, B); weights: (R, B-1-ish) — the reference passes mid-bin
    weights trimmed by one on each side; shapes are respected as-is.
    Returns (R, n_importance).
    """
    r, n_bins_w = weights.shape
    if n_bins_w == 0:
        # Degenerate toy configs (depth_resolution <= 3) trim the smoothed
        # weights to nothing; fall back to a uniform pdf over the actual
        # bin segments so the inverse CDF stays well-defined.
        n_bins_w = bins.shape[1] - 1
        assert n_bins_w >= 1, f"need >= 2 bins, got {bins.shape}"
        weights = jnp.ones((r, n_bins_w), bins.dtype)
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B_w+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), (r, n_importance))
    else:
        # SORTED uniforms via the Rényi order-statistics representation:
        # with E_1..E_{n+1} iid Exp(1) and S_k = sum_{i<=k} E_i,
        # (S_1/S_{n+1}, ..., S_n/S_{n+1}) is distributed exactly as the
        # ascending sort of n iid U(0,1) draws. The reference draws raw
        # uniforms (renderer.py:231) and later sorts the coarse+fine
        # union; emitting u ascending makes the importance depths
        # ascending per ray (the CDF inverse is monotone), which lets
        # the ray marcher merge two sorted lists instead of sorting —
        # the lane-axis sort is pathologically slow on TPU (see
        # march_rays_merge).
        e = jax.random.exponential(rng, (r, n_importance + 1))
        cum = jnp.cumsum(e, axis=-1)
        u = cum[:, :n_importance] / cum[:, n_importance:]

    # The reference gathers cdf/bins at searchsorted indices
    # (renderer.py:237-243). On TPU both the binary search and the four
    # take_along_axis row gathers are latency-bound (~5 ms each at 786k
    # indices). Both cdf and bins are MONOTONIC, so the bracketing
    # values are masked reductions over the ~48 bins instead:
    #   cdf_g0  = max{cdf[j]  : cdf[j] <= u}      (largest cdf <= u)
    #   cdf_g1  = min{cdf[j]  : cdf[j] >  u}      (smallest cdf > u)
    # and the same j ranges pick bins_g0/bins_g1. One broadcast compare
    # + four masked reductions, all VPU-vectorized.
    nb = n_bins_w + 1  # cdf entries; bins[j] pairs with cdf[j], j < nb
    bins_nb = bins[:, :nb]
    mask = cdf[:, None, :] <= u[:, :, None]  # (R, I, nb)
    neg = -jnp.inf
    pos = jnp.inf
    cdf_b = jnp.broadcast_to(cdf[:, None, :], mask.shape)
    bins_b = jnp.broadcast_to(bins_nb[:, None, :], mask.shape)
    cdf_g0 = jnp.max(jnp.where(mask, cdf_b, neg), axis=-1)
    bins_g0 = jnp.max(jnp.where(mask, bins_b, neg), axis=-1)
    # empty ">u" mask (u >= cdf[-1] by fp roundoff) falls back to the
    # final entry, matching the reference's index clamp
    cdf_g1 = jnp.minimum(
        jnp.min(jnp.where(mask, pos, cdf_b), axis=-1), cdf[:, None, -1]
    )
    bins_g1 = jnp.minimum(
        jnp.min(jnp.where(mask, pos, bins_b), axis=-1), bins_nb[:, None, -1]
    )

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)


def sample_importance(rng, z_vals, weights, n_importance: int):
    """Importance depths from coarse weights (renderer.py:194-212).

    z_vals: (N, M, S, 1); weights: (N, M, S-1, 1). Returns (N, M, I, 1).
    Runs under stop_gradient like the reference's no_grad block.
    """
    n, m, s, _ = z_vals.shape
    z = jax.lax.stop_gradient(z_vals.reshape(n * m, s))
    w = jax.lax.stop_gradient(weights.reshape(n * m, -1))

    # Smooth: max_pool1d(k=2, s=1, p=1) then avg_pool1d(k=2, s=1)
    # (renderer.py:205-207). Torch pads max-pool with -inf.
    wp = jnp.pad(w, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    w_max = jnp.maximum(wp[:, :-1], wp[:, 1:])  # length S
    w_smooth = (w_max[:, :-1] + w_max[:, 1:]) / 2.0  # length S-1
    w_smooth = w_smooth + 0.01

    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])  # (NM, S-1)
    samples = sample_pdf(rng, z_mid, w_smooth[:, 1:-1], n_importance)
    return jax.lax.stop_gradient(samples).reshape(n, m, n_importance, 1)


def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
    """Sort-merge coarse and fine samples (renderer.py:157-167)."""
    all_depths = jnp.concatenate([depths1, depths2], axis=-2)
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)
    all_densities = jnp.concatenate([densities1, densities2], axis=-2)

    indices = jnp.argsort(all_depths, axis=-2)
    all_depths = jnp.take_along_axis(all_depths, indices, axis=-2)
    all_colors = jnp.take_along_axis(
        all_colors, jnp.broadcast_to(indices, all_colors.shape[:-1] + (1,)), axis=-2
    )
    all_densities = jnp.take_along_axis(all_densities, indices, axis=-2)
    return all_depths, all_colors, all_densities


@dataclasses.dataclass(frozen=True)
class ImportanceRenderer:
    """Functional two-pass renderer (renderer.py:82-148).

    `decoder` is supplied per call: a pure fn (features (N, P, C),
    directions (N, P, 3)) -> (rgb (N, P, C_out), sigma (N, P, 1)).
    """

    options: RenderingOptions

    def __call__(self, rng, planes_nhwc, decoder: Callable, ray_origins,
                 ray_directions, rays_w: int | None = None):
        """Renders (N, M, 3) rays; chunks the ray axis when
        options.ray_chunk divides M (exact — rays are independent).

        `rays_w` is the scanline width of the ray bundle (the render
        resolution); it only informs the windowed-splat backward's
        tiling (plane_splat.RayGeom) and may be omitted."""
        chunk = self.options.ray_chunk
        n, m, _ = ray_origins.shape
        if n == 1 and self.options.unchunked_single_camera:
            chunk = None
        if chunk is not None and n > 1:
            # Normalize per-chunk WORK (n_cameras x rays) rather than rays:
            # batch-4 chunks at the batch-1 chunk size quadruple the live
            # gather/scatter tensors per body and spill (measured +22% on a
            # 4-camera render backward on v5e). Use the largest divisor of
            # m not exceeding chunk/n so the chunked path survives any
            # (m, n) combination; give up (unchunked) rather than degrade
            # into a pathologically long per-ray map.
            target = max(1, chunk // n)
            while target >= 32 and m % target:
                target -= 1
            chunk = target if target >= 32 else None
        if chunk is None or m <= chunk or m % chunk != 0:
            return self._render_rays(
                rng, planes_nhwc, decoder, ray_origins, ray_directions,
                rays_w=rays_w,
            )

        nchunks = m // chunk
        ro = ray_origins.reshape(n, nchunks, chunk, 3).transpose(1, 0, 2, 3)
        rd = ray_directions.reshape(n, nchunks, chunk, 3).transpose(1, 0, 2, 3)
        # A chunk is whole scanlines iff rays_w divides it; otherwise
        # the tile structure is lost and the splat falls back to XLA.
        chunk_rays_w = rays_w if (rays_w and chunk % rays_w == 0) else None

        @partial(jax.checkpoint, policy=save_plane_feats_policy())
        def body(args):
            idx, ro_c, rd_c = args
            return self._render_rays(
                jax.random.fold_in(rng, idx), planes_nhwc, decoder, ro_c,
                rd_c, rays_w=chunk_rays_w,
            )

        rgb, depth, wsum = jax.lax.map(body, (jnp.arange(nchunks), ro, rd))
        # (nchunks, N, chunk, C) -> (N, M, C)
        def merge(x):
            return x.transpose(1, 0, 2, 3).reshape(n, m, x.shape[-1])

        return merge(rgb), merge(depth), merge(wsum)

    def _render_rays(self, rng, planes_nhwc, decoder: Callable, ray_origins,
                     ray_directions, rays_w: int | None = None):
        # named_scope mirrors the reference's profiled_function boundaries
        # (misc.py:102-107 applied over renderer.py) for jax.profiler traces.
        with jax.named_scope("importance_render"):
            return self._render_rays_inner(
                rng, planes_nhwc, decoder, ray_origins, ray_directions,
                rays_w=rays_w,
            )

    def _render_rays_inner(self, rng, planes_nhwc, decoder: Callable,
                           ray_origins, ray_directions,
                           rays_w: int | None = None):
        opts = self.options
        rng_coarse, rng_fine, rng_noise = jax.random.split(rng, 3)

        if opts.ray_start == opts.ray_end == "auto":
            ray_start, ray_end = math_utils.get_ray_limits_box(
                jax.lax.stop_gradient(ray_origins),
                jax.lax.stop_gradient(ray_directions),
                box_side_length=opts.box_warp,
            )
            is_valid = ray_end > ray_start
            # Fill invalid rays with the min/max over valid rays
            # (renderer.py:93-96), via masked reductions.
            valid_min = jnp.min(jnp.where(is_valid, ray_start, jnp.inf))
            valid_max = jnp.max(jnp.where(is_valid, ray_start, -jnp.inf))
            ray_start = jnp.where(is_valid, ray_start, valid_min)
            ray_end = jnp.where(is_valid, ray_end, valid_max)

        else:
            ray_start, ray_end = opts.ray_start, opts.ray_end

        depths_coarse = sample_stratified(
            rng_coarse, ray_origins, ray_start, ray_end,
            opts.depth_resolution, opts.disparity_space_sampling,
        )

        n, m, s, _ = depths_coarse.shape

        def make_geom(k: int, fine: bool):
            if not rays_w or m % rays_w:
                return None
            if n > 1:
                # Chunked multi-camera fan-outs split the pass into 4x
                # smaller kernels with 4x the per-call glue (barrier,
                # cond operands, launch) — measured to give the
                # single-camera win back. Keep the XLA scatter there.
                return None
            if fine:
                # Importance depths spread too far per tile: the splat
                # needs ts=3 tiles + 112-tall windows, whose extra tile
                # count and window area eat the whole win (measured at
                # parity with the XLA scatter on v5e). Keep autodiff.
                return None
            return RayGeom(n_views=n, rays_h=m // rays_w, rays_w=rays_w,
                           n_samples=k, fine=fine)

        def run(depths, fine: bool):
            pts = ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
            pts = pts.reshape(n, -1, 3)
            with jax.named_scope("triplane_sample"):
                feats = sample_from_planes(
                    planes_nhwc, pts, opts.box_warp,
                    geom=make_geom(depths.shape[2], fine),
                    impl=opts.plane_splat,
                )
                feats = feats.mean(axis=1)  # aggregate planes (triplane.py:125)
                # Named residual for remat: under
                # jax.checkpoint(..., policy=save_plane_feats_policy())
                # the gathered features are SAVED while everything else
                # rematerializes. The gathers are the latency-bound part
                # of the render (~16 ns/row on v5e); re-running them in
                # the backward doubles their cost, while saving them
                # costs only (points x 32) bf16 of HBM. Sound because
                # the sample coordinates carry no parameter gradient
                # (coarse depths are camera-only; importance depths are
                # stop_gradient'ed), so the backward needs no re-gather.
                feats = checkpoint_name(feats, "plane_feats")
            dirs = jnp.broadcast_to(
                ray_directions[:, :, None, :], (n, m, depths.shape[2], 3)
            ).reshape(n, -1, 3)
            with jax.named_scope("osg_decode"):
                rgb, sigma = decoder(feats, dirs)
            if opts.density_noise > 0:
                sigma = sigma + jax.random.normal(rng_noise, sigma.shape) * opts.density_noise
            k = depths.shape[2]
            return (
                rgb.reshape(n, m, k, rgb.shape[-1]),
                sigma.reshape(n, m, k, 1),
            )

        colors_coarse, densities_coarse = run(depths_coarse, fine=False)

        n_imp = opts.depth_resolution_importance
        if n_imp > 0:
            _, _, weights = march_rays(
                colors_coarse, densities_coarse, depths_coarse, white_back=opts.white_back
            )
            depths_fine = sample_importance(rng_fine, depths_coarse, weights, n_imp)
            colors_fine, densities_fine = run(depths_fine, fine=True)

            # coarse+fine union composited as a rank-based merge of two
            # per-ray-sorted groups — no sort, no take_along_axis
            # (march_rays_merge docstring; replaces the unify_samples
            # sort-merge of renderer.py:157-167)
            rgb_final, depth_final, weights = march_rays_merge(
                colors_coarse, densities_coarse, depths_coarse,
                colors_fine, densities_fine, depths_fine,
                white_back=opts.white_back,
            )
        else:
            rgb_final, depth_final, weights = march_rays(
                colors_coarse, densities_coarse, depths_coarse, white_back=opts.white_back
            )

        return rgb_final, depth_final, weights.sum(axis=2)

    def run_model(self, planes_nhwc, decoder: Callable, coordinates, directions):
        """Density/color probe at arbitrary points (renderer.py:142-148);
        used by shape extraction and the TV loss."""
        feats = sample_from_planes(planes_nhwc, coordinates, self.options.box_warp)
        feats = feats.mean(axis=1)
        rgb, sigma = decoder(feats, directions)
        return rgb, sigma

"""Whole-image evaluation rendering with fixed-shape chunking.

Counterpart of the reference render driver
(/root/reference/radiance_fields/video_utils.py:50-468): renders a
SceneDataset split image by image, collecting rgb / depth / opacity /
decomposition / flow / feature maps and computing PSNR/SSIM (+ dynamic- and
static-masked variants).  TPU-first details: rays are padded to a fixed
chunk size so exactly one executable is compiled, and chunks stream through
that jitted function.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.eval.metrics import compute_psnr, compute_ssim
from emernerf_tpu.render.renderer import render_ray_batch

# per-ray outputs worth reshaping into image maps
_MAP_KEYS = (
    "rgb", "depth", "median_depth", "opacity", "static_rgb", "dynamic_rgb",
    "static_depth", "dynamic_depth", "static_opacity", "dynamic_opacity",
    "shadow_reduced_static_rgb", "shadow_only_static_rgb", "shadow",
    "shadow_ratio", "forward_flow", "backward_flow", "dino_feat",
    "dino_pe", "dino_pe_free", "static_dino", "dynamic_dino",
)


class ImageRenderer:
    """Chunked full-image renderer around one jitted chunk function."""

    def __init__(
        self,
        model,
        prop_models: Sequence,
        *,
        num_samples: int = 64,
        prop_samples: Sequence[int] = (128, 64),
        near_plane: float = 0.1,
        far_plane: float = 1000.0,
        sampling_type: str = "uniform_lindisp",
        chunk_size: int = 16384,
        return_decomposition: bool = False,
        mesh=None,
        sample_topk: int = 0,
    ):
        """``mesh``: optional jax.sharding.Mesh — eval chunks are sharded
        across its data axis (parallel/mesh.py:shard_render_chunk);
        chunk_size must divide evenly by the mesh size.

        ``sample_topk``: query the field at only the K samples/ray the last
        prop net ranks highest (render/renderer.py:_topk_sample_select) —
        opt-in eval speedup (render.eval_sample_topk); 0 = exact."""
        if mesh is not None and chunk_size % mesh.size != 0:
            raise ValueError(
                f"chunk_size {chunk_size} not divisible by mesh size "
                f"{mesh.size}"
            )
        self.chunk_size = chunk_size

        def _render_chunk(params, prop_params, rays, key):
            out, _, _ = render_ray_batch(
                model, params, prop_models, prop_params, rays, key,
                num_samples=num_samples, prop_samples=tuple(prop_samples),
                near_plane=near_plane, far_plane=far_plane,
                sampling_type=sampling_type, stratified=False,
                proposal_requires_grad=False, sample_topk=sample_topk,
                return_decomposition=return_decomposition, train=False,
            )
            out.pop("extras", None)
            return out

        self._render_chunk = jax.jit(_render_chunk)
        if mesh is not None:
            from emernerf_tpu.parallel.mesh import shard_render_chunk

            self._render_chunk = shard_render_chunk(self._render_chunk, mesh)

        def _render_chunk_lidar(params, prop_params, rays, key):
            out, _, _ = render_ray_batch(
                model, params, prop_models, prop_params, rays, key,
                num_samples=num_samples, prop_samples=tuple(prop_samples),
                near_plane=near_plane, far_plane=far_plane,
                sampling_type=sampling_type, stratified=False,
                proposal_requires_grad=False, sample_topk=sample_topk,
                is_lidar=True, train=False,
            )
            out.pop("extras", None)
            return out

        self._render_chunk_lidar = jax.jit(_render_chunk_lidar)
        if mesh is not None:
            from emernerf_tpu.parallel.mesh import shard_render_chunk

            self._render_chunk_lidar = shard_render_chunk(
                self._render_chunk_lidar, mesh
            )

    # ---------------------------------------------------------------- #
    def render_rays_chunked(
        self, params, prop_params, rays: Dict[str, np.ndarray],
        key=None, is_lidar: bool = False,
    ) -> Dict[str, np.ndarray]:
        """Render an arbitrary-length ray dict by padding to chunk_size."""
        if key is None:
            key = jax.random.PRNGKey(0)
        n = rays["origins"].shape[0]
        chunk = self.chunk_size
        n_chunks = max((n + chunk - 1) // chunk, 1)
        pad = n_chunks * chunk - n

        padded = {}
        for k, v in rays.items():
            v = np.asarray(v)
            if pad:
                v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            padded[k] = v

        fn = self._render_chunk_lidar if is_lidar else self._render_chunk
        outs: List[Dict[str, np.ndarray]] = []
        for i in range(n_chunks):
            sl = {k: jnp.asarray(v[i * chunk : (i + 1) * chunk])
                  for k, v in padded.items()}
            out = fn(params, prop_params, sl, key)
            outs.append(jax.tree.map(np.asarray, out))

        merged = {}
        for k in outs[0]:
            merged[k] = np.concatenate([o[k] for o in outs], axis=0)[:n]
        return merged

    # ---------------------------------------------------------------- #
    def render_image(
        self, params, prop_params, rays: Dict[str, np.ndarray], hw,
        key=None,
    ) -> Dict[str, np.ndarray]:
        """Render one image; per-ray outputs reshaped to (H, W, ...)."""
        out = self.render_rays_chunked(params, prop_params, rays, key)
        h, w = hw
        maps = {}
        for k in _MAP_KEYS:
            if k in out:
                v = out[k].reshape(h, w, *out[k].shape[1:])
                if v.ndim == 3 and v.shape[-1] == 1:
                    v = v[..., 0]
                maps[k] = v
        return maps

    # ---------------------------------------------------------------- #
    def render_split(
        self,
        params,
        prop_params,
        dataset,
        indices: Sequence[int],
        downscale: int = 1,
        compute_metrics: bool = True,
    ):
        """Render a list of dataset images; returns (frames, metrics)
        mirroring render_pixels (video_utils.py:50-101)."""
        frames: List[Dict[str, np.ndarray]] = []
        psnrs, ssims = [], []
        dyn_psnrs, stat_psnrs, dyn_ssims = [], [], []
        feat_psnrs, masked_feat_psnrs = [], []
        for idx in indices:
            rays, gt = dataset.get_image_rays(int(idx), downscale=downscale)
            maps = self.render_image(params, prop_params, rays, gt["hw"])
            maps["gt_rgb"] = gt["pixels"]
            if "dynamic_masks" in gt:
                maps["gt_dynamic_mask"] = gt["dynamic_masks"]
            if "sky_masks" in gt:
                maps["gt_sky_mask"] = gt["sky_masks"]
            frames.append(maps)
            if compute_metrics and "rgb" in maps:
                psnrs.append(compute_psnr(maps["rgb"], gt["pixels"]))
                ssim_mean, ssim_map = compute_ssim(
                    np.clip(maps["rgb"], 0, 1), np.clip(gt["pixels"], 0, 1),
                    full=True,
                )
                ssims.append(ssim_mean)
                if "dynamic_masks" in gt:
                    m = gt["dynamic_masks"] > 0.5
                    if m.sum() > 0:
                        dyn_psnrs.append(
                            compute_psnr(maps["rgb"][m], gt["pixels"][m])
                        )
                        dyn_ssims.append(float(ssim_map[m].mean()))
                    if (~m).sum() > 0:
                        stat_psnrs.append(
                            compute_psnr(maps["rgb"][~m], gt["pixels"][~m])
                        )
                # feat-PSNR on lifted DINO features
                # (reference video_utils.py:92-99, 234-247)
                if "dino_feat" in maps and "features" in gt:
                    feat_psnrs.append(
                        compute_psnr(maps["dino_feat"], gt["features"])
                    )
                    if "dynamic_masks" in gt:
                        m = gt["dynamic_masks"] > 0.5
                        if m.sum() > 0:
                            masked_feat_psnrs.append(
                                compute_psnr(
                                    maps["dino_feat"][m], gt["features"][m]
                                )
                            )
        metrics = {}
        if psnrs:
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))
        if dyn_psnrs:
            metrics["masked_psnr"] = float(np.mean(dyn_psnrs))
            metrics["masked_ssim"] = float(np.mean(dyn_ssims))
        if stat_psnrs:
            metrics["non_masked_psnr"] = float(np.mean(stat_psnrs))
        if feat_psnrs:
            metrics["feat_psnr"] = float(np.mean(feat_psnrs))
        if masked_feat_psnrs:
            metrics["masked_feat_psnr"] = float(np.mean(masked_feat_psnrs))
        return frames, metrics

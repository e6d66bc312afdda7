"""EmerNeRF fields as flax modules.

TPU-first re-design of the reference model classes
(/root/reference/radiance_fields/radiance_field.py):

  * ``RadianceField`` — static hash field, optional dynamic 4D (xyz+t) hash
    field, optional emergent scene-flow field with temporal aggregation
    (Eq. 8), shared RGB head, sky / shadow / DINO-feature heads and the
    learnable positional-embedding (PE) map (radiance_field.py:20-785).
  * ``DensityField`` — proposal density network (radiance_field.py:788-841).

All grid encodings run through :func:`emernerf_tpu.ops.grid.grid_encode`
(brick grids by default — one wide XLA gather per point-level — or exact
hash grids for parity checks), every head is a dense matmul
batch, and all shapes are static: positions are (R, S, 3), per-ray data is
expanded to (R, S) by the renderer.  Config booleans are module attributes,
so Python branching below is resolved at trace time.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from emernerf_tpu.models.mlp import MLP, Sequential64
from emernerf_tpu.models.init_utils import torch_embedding_init
from emernerf_tpu.ops.activations import density_activation
from emernerf_tpu.ops.contraction import (
    contract_merf,
    inside_unit_cube_selector,
    normalize_aabb,
)
from emernerf_tpu.ops.grid import grid_encode, init_grid_table
from emernerf_tpu.ops.interp import grid_sample_2d
from emernerf_tpu.ops.sh import sh_encode
from emernerf_tpu.ops.sinusoidal import sinusoidal_encode, sinusoidal_output_dim


import math
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def _lane_split_matrices(lvls: int, df: int, ff: int):
    """0/1 selection matrices ((lvls*(df+ff), lvls*df), (..., lvls*ff))
    that de-interleave per-level (dyn | flow) lanes as matmuls."""
    k = df + ff
    sd = np.zeros((lvls * k, lvls * df), np.float32)
    sf = np.zeros((lvls * k, lvls * ff), np.float32)
    for l in range(lvls):
        for j in range(df):
            sd[l * k + j, l * df + j] = 1.0
        for j in range(ff):
            sf[l * k + df + j, l * ff + j] = 1.0
    return sd, sf


def find_topk_nearby_timesteps(training_timesteps, query, topk: int = 2):
    """Per-query nearest training timesteps (reference nerf_utils.py:31-56).

    training_timesteps: (T,); query: (...,). Returns (..., topk) values,
    nearest first."""
    diffs = jnp.abs(
        jnp.asarray(training_timesteps)[None, :] - query.reshape(-1)[:, None]
    )
    _, idx = jax.lax.top_k(-diffs, topk)
    vals = jnp.asarray(training_timesteps)[idx]
    return vals.reshape(*query.shape, topk)


def _table_init(spec, dtype=jnp.float32):
    """Table storage dtype is configurable (``table_param_dtype``): fp32
    for CPU tests / small scenes, bf16 at flagship scale where the two big
    tables (540MB fp32 each) plus Adam moments dominate HBM.  bf16 storage
    matches the reference precedent (tcnn keeps hash tables fp16,
    third_party/tcnn_modules.py); no loss scaling is needed on TPU since
    bf16 has fp32's exponent range (SURVEY §2.3)."""

    def init(key, *_):
        return init_grid_table(key, spec, dtype=dtype)

    return init


class DensityField(nn.Module):
    """Proposal density network: small hash encoder + 2-layer MLP -> density
    (radiance_field.py:788-841).

    ``fine_level_skip > 0`` enables footprint-based fine-level skipping
    (TPU-native row reduction, no reference analogue — the CUDA reference
    gets its row cuts from nerfacc occupancy skipping): the finest K grid
    levels are queried only for the first ceil(frac * S) samples of each
    ray.  Sample index is monotone in t under the uniform_lindisp sampler,
    and a pixel cone's footprint r = t * pixel_angle exceeds the fine
    cells' size at large t, where fine-level features alias anyway (the
    zip-NeRF anti-aliasing argument the prop blur loss already encodes,
    nerfacc_prop_net.py:22-60).  Far samples read a COARSE VIEW of the
    same table (static slice, exact same per-level geometry) and their
    fine features are zero — a STATIC-shape cut of both gather and
    scatter rows on the proposal grids."""

    spec: object  # HashGridSpec | BrickGridSpec
    aabb: Tuple[float, ...] = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    unbounded: bool = True
    base_mlp_layer_width: int = 64
    table_dtype: jnp.dtype = jnp.float32
    table_param_dtype: jnp.dtype = jnp.float32
    mlp_dtype: jnp.dtype = jnp.float32
    fine_level_skip: int = 0
    fine_level_frac: float = 0.5

    def setup(self):
        self.table = self.param(
            "hash_table", _table_init(self.spec, self.table_param_dtype)
        )
        self.base_mlp = Sequential64(
            widths=(self.base_mlp_layer_width, 1), dtype=self.mlp_dtype
        )

    def _encode(self, normed: jnp.ndarray) -> jnp.ndarray:
        table = self.table.astype(self.table_dtype)
        k = self.fine_level_skip
        if k > 0:
            # misconfiguration errors loudly (round-4 review: a silent
            # no-op would let a quality gate pass without the knob ever
            # engaging); builders.py pre-validates the config path
            if not hasattr(self.spec, "view_levels") or getattr(
                    self.spec, "has_time", False):
                raise ValueError(
                    "fine_level_skip requires a 3D brick-grid spec "
                    f"(got {type(self.spec).__name__})")
            if k >= self.spec.n_levels:
                raise ValueError(
                    f"fine_level_skip={k} must be < n_levels="
                    f"{self.spec.n_levels}")
        # flat point queries (no sample axis, e.g. occupancy probes) have
        # no near/far structure — full encode is the correct semantics
        if k <= 0 or normed.ndim < 3:
            return grid_encode(table, normed, self.spec,
                               needs_pos_grad=False)
        s = normed.shape[-2]
        # near-sample count: ceil(frac * S), snapped DOWN to the sublane
        # tile (multiple of 8, floor 8) — static, so both segment encodes
        # compile once.  Rounding down instead of up keeps the knob
        # engaged for small S (round-4 review: rounding UP silently
        # disabled it whenever ceil(frac*S) reached S, so a quality gate
        # could pass without the knob ever running).
        s_near = min(s, max(1, int(math.ceil(s * self.fine_level_frac))))
        s_near = max(8, (s_near // 8) * 8)
        if s_near >= s:
            # too few samples for a near/far split: erroring loudly is
            # this knob's contract — a silent full-encode fallback would
            # let its quality/speed gates measure nothing
            raise ValueError(
                f"fine_level_skip={k} cannot engage: sample count {s} "
                f"with fine_level_frac={self.fine_level_frac} leaves no "
                f"far segment (need > {s_near} samples on the sorted "
                f"axis); raise num_samples_per_prop or disable the knob")
        import dataclasses

        f = self.spec.n_features_per_level
        coarse_levels = self.spec.n_levels - k
        cspec = dataclasses.replace(self.spec, view_levels=coarse_levels)
        ctable = jax.lax.slice_in_dim(
            table, 0, coarse_levels * self.spec.bricks_per_level
        )
        near = jax.lax.slice_in_dim(normed, 0, s_near, axis=-2)
        far = jax.lax.slice_in_dim(normed, s_near, s, axis=-2)
        enc_n = grid_encode(table, near, self.spec, needs_pos_grad=False)
        enc_f = grid_encode(ctable, far, cspec, needs_pos_grad=False)
        enc_f = jnp.concatenate(
            [enc_f, jnp.zeros((*enc_f.shape[:-1], k * f), enc_f.dtype)],
            axis=-1,
        )
        return jnp.concatenate([enc_n, enc_f], axis=-2)

    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        """positions: (..., 3) world coords -> density (...,).

        With fine-level skipping enabled the sample axis (-2) must be
        sorted near-to-far (true for every sampler in this codebase)."""
        aabb = jnp.asarray(self.aabb, dtype=jnp.float32)
        if self.unbounded:
            normed = contract_merf(positions, aabb)
        else:
            normed = normalize_aabb(positions, aabb)
        normed = normed * inside_unit_cube_selector(normed)[..., None]
        enc = self._encode(normed).astype(jnp.float32)
        raw = self.base_mlp(enc)[..., 0]
        return density_activation(raw)


class RadianceField(nn.Module):
    static_spec: object  # HashGridSpec | BrickGridSpec
    dynamic_spec: object = None
    flow_spec: object = None
    # fuse the dynamic and flow grids into ONE table with
    # F = dyn_F + flow_F features per level (dyn = lanes [:dyn_F], flow =
    # lanes [dyn_F:]): every 4D query site needs both fields at the same
    # (position, time), so fusing halves the gather/scatter row count —
    # the dominant cost on TPU (gathers are row-rate/bandwidth-bound,
    # perf/bench_gather_widths.py).  The fused grid uses the dynamic
    # spec's level scales (the flow field gets the dynamic grid's finer
    # resolution instead of the reference's hardcoded base 16 / max 4096,
    # radiance_field.py:916-923 — strictly more capacity).
    fuse_flow_grid: bool = False
    # temporal aggregation on only the top-K samples per ray by
    # current-time dynamic density (0 = all samples, the reference
    # semantics).  Scene flow is only meaningful where dynamic content
    # exists; the warped re-queries (2 fused grid encodes per sample) are
    # the single largest train cost, so restricting them to the K most
    # dynamic samples cuts it ~S/K-fold.  Non-selected samples fall back
    # to the un-aggregated current-time features, and the cycle loss is
    # masked to selected samples (extras["agg_mask"]).
    temporal_agg_topk: int = 0
    aabb: Tuple[float, ...] = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    unbounded: bool = True
    geometry_feature_dim: int = 64
    base_mlp_layer_width: int = 64
    head_mlp_layer_width: int = 64
    enable_cam_embedding: bool = False
    enable_img_embedding: bool = False
    num_cams: int = 3
    appearance_embedding_dim: int = 16
    semantic_feature_dim: int = 64  # forced to 0 by the builder when no feature head
    feature_mlp_layer_width: int = 64
    feature_embedding_dim: int = 64
    enable_sky_head: bool = False
    enable_shadow_head: bool = False
    enable_feature_head: bool = False
    enable_learnable_pe: bool = True
    num_train_timesteps: int = 0
    time_diff: float = 0.0
    pe_map_hw: Tuple[int, int] = (80, 120)
    table_dtype: jnp.dtype = jnp.float32
    # table STORAGE dtype (params + Adam moments); bf16 at flagship scale
    table_param_dtype: jnp.dtype = jnp.float32
    # MLP/head COMPUTE dtype (params stay fp32); bf16 halves the dense
    # activation residuals saved for the backward and doubles MXU rate
    mlp_dtype: jnp.dtype = jnp.float32
    # direction encoder for the rgb/sky heads: "sinusoidal" (reference
    # default, radiance_field.py:126-128) or "sh" (tcnn SphericalHarmonics
    # equivalent, ops/sh.py)
    direction_encoding: str = "sinusoidal"
    # eval-time temporal interpolation of the flow field at the top-2
    # nearest training timesteps (off by default; the reference enables it
    # only for the flow branch, radiance_field.py:372-387)
    enable_temporal_interpolation: bool = False
    interpolate_xyz_encoding: bool = True
    training_timesteps: Optional[Tuple[float, ...]] = None

    # ------------------------------------------------------------------ #
    def setup(self):
        gf, sf = self.geometry_feature_dim, self.semantic_feature_dim
        self.xyz_table = self.param(
            "xyz_table", _table_init(self.static_spec, self.table_param_dtype)
        )
        self.base_mlp = Sequential64(
            widths=(self.base_mlp_layer_width, gf + sf), dtype=self.mlp_dtype
        )

        if self.dynamic_spec is not None:
            if self.fused:
                import dataclasses as _dc

                fused_spec = _dc.replace(
                    self.dynamic_spec,
                    n_features_per_level=(
                        self.dynamic_spec.n_features_per_level
                        + self.flow_spec.n_features_per_level
                    ),
                )
                self.dynflow_spec = fused_spec
                self.dynflow_table = self.param(
                    "dynflow_table",
                    _table_init(fused_spec, self.table_param_dtype),
                )
            else:
                self.dynamic_table = self.param(
                    "dynamic_table",
                    _table_init(self.dynamic_spec, self.table_param_dtype),
                )
            self.dynamic_base_mlp = Sequential64(
                widths=(self.base_mlp_layer_width, gf + sf),
                dtype=self.mlp_dtype,
            )

        if self.flow_spec is not None:
            if not self.fused:
                self.flow_table = self.param(
                    "flow_table",
                    _table_init(self.flow_spec, self.table_param_dtype),
                )
            # 3 layers of base width -> 6 (fwd + bwd flow), no final activation
            self.flow_mlp = Sequential64(
                widths=(self.base_mlp_layer_width, self.base_mlp_layer_width, 6),
                dtype=self.mlp_dtype,
            )

        if self.use_appearance_embedding:
            n_embeds = (
                self.num_cams
                if self.enable_cam_embedding
                else self.num_train_timesteps * self.num_cams
            )
            self.appearance_embedding = nn.Embed(
                max(n_embeds, 1),
                self.appearance_embedding_dim,
                embedding_init=torch_embedding_init,
            )

        self.rgb_head = MLP(
            out_dims=3,
            num_layers=3,
            hidden_dims=self.head_mlp_layer_width,
            skip_connections=(1,),
            dtype=self.mlp_dtype,
        )

        if self.enable_shadow_head:
            self.shadow_head = Sequential64(
                widths=(self.base_mlp_layer_width, 1), final_sigmoid=True,
                dtype=self.mlp_dtype,
            )

        if self.enable_sky_head:
            self.sky_head = MLP(
                out_dims=3,
                num_layers=3,
                hidden_dims=self.head_mlp_layer_width,
                skip_connections=(1,),
                dtype=self.mlp_dtype,
            )
            if self.enable_feature_head:
                self.dino_sky_head = Sequential64(
                    widths=(
                        self.feature_mlp_layer_width,
                        self.feature_mlp_layer_width,
                        self.feature_embedding_dim,
                    ),
                    dtype=self.mlp_dtype,
                )

        if self.enable_feature_head:
            self.dino_head = Sequential64(
                widths=(
                    self.feature_mlp_layer_width,
                    self.feature_mlp_layer_width,
                    self.feature_embedding_dim,
                ),
                dtype=self.mlp_dtype,
            )
            if self.enable_learnable_pe:
                h, w = self.pe_map_hw
                half = self.feature_embedding_dim // 2
                self.learnable_pe_map = self.param(
                    "learnable_pe_map",
                    lambda key, *_: 0.05 * jax.random.normal(key, (h, w, half)),
                )
                self.pe_head = Sequential64(widths=(self.feature_embedding_dim,))

    # ------------------------------------------------------------------ #
    def _encode_dirs(self, directions01):
        """Direction encoding on [0,1]-remapped directions: NeRF sinusoidal
        PE with identity (reference default) or spherical harmonics."""
        if self.direction_encoding == "sh":
            return sh_encode(directions01, degree=4)
        return sinusoidal_encode(directions01, min_deg=0, max_deg=4)

    @property
    def use_appearance_embedding(self) -> bool:
        return self.enable_cam_embedding or self.enable_img_embedding

    @property
    def has_dynamic(self) -> bool:
        return self.dynamic_spec is not None

    @property
    def has_flow(self) -> bool:
        return self.flow_spec is not None

    @property
    def fused(self) -> bool:
        return (
            self.fuse_flow_grid
            and self.dynamic_spec is not None
            and self.flow_spec is not None
        )

    # ------------------------------------------------------------------ #
    def contract_points(self, positions):
        """World -> [0,1]^3, out-of-box points zeroed (radiance_field.py:278-300)."""
        aabb = jnp.asarray(self.aabb, dtype=jnp.float32)
        if self.unbounded:
            normed = contract_merf(positions, aabb)
        else:
            normed = normalize_aabb(positions, aabb)
        return normed * inside_unit_cube_selector(normed)[..., None]

    def forward_static_hash(self, positions):
        normed = self.contract_points(positions)
        # sampled positions carry no gradient -> skip d/dpos in the VJP
        enc = grid_encode(
            self.xyz_table.astype(self.table_dtype), normed,
            self.static_spec, needs_pos_grad=False,
        )
        return self.base_mlp(enc.astype(jnp.float32)), normed

    def _dynflow_encode(self, normed_positions, normed_timestamps,
                        needs_pos_grad=False):
        """ONE fused grid query -> (dynamic_enc (..., L*dyn_F),
        flow_enc (..., L*flow_F)).  Both fields live in the same table
        rows (dyn = level-lanes [:dyn_F], flow = [dyn_F:]), so every 4D
        query site pays one gather instead of two."""
        xyzt = jnp.concatenate(
            [normed_positions, normed_timestamps[..., None]], axis=-1
        )
        enc = grid_encode(
            self.dynflow_table.astype(self.table_dtype), xyzt,
            self.dynflow_spec, needs_pos_grad=needs_pos_grad,
        ).astype(jnp.float32)
        df = self.dynamic_spec.n_features_per_level
        ff = self.flow_spec.n_features_per_level
        lvls = self.dynflow_spec.n_levels
        # split the interleaved (level, dyn|flow) lanes with constant 0/1
        # selection matmuls: the equivalent reshape to (..., lvls, df+ff)
        # pads its tiny minor dims 8x on TPU (a 320 MB HLO temp at the
        # flagship batch) while an MXU contraction stays lane-major
        sd, sf = _lane_split_matrices(lvls, df, ff)
        # cast the 0/1 selection matrices to enc's dtype so the split
        # preserves the encoding dtype (ADVICE r3 #4: fp32 constants would
        # silently promote a bf16 encoding path)
        dyn = enc @ jnp.asarray(sd, enc.dtype)
        flw = enc @ jnp.asarray(sf, enc.dtype)
        return dyn, flw

    def forward_dynamic_hash(self, normed_positions, normed_timestamps,
                             needs_pos_grad=False):
        """4D (xyz, t) hash encode + dynamic base MLP. Returns (feats, enc).
        ``needs_pos_grad`` is True only for flow-warped queries (their
        positions depend on the flow field)."""
        if self.fused:
            enc, _ = self._dynflow_encode(
                normed_positions, normed_timestamps, needs_pos_grad
            )
            return self.dynamic_base_mlp(enc), enc
        xyzt = jnp.concatenate(
            [normed_positions, normed_timestamps[..., None]], axis=-1
        )
        enc = grid_encode(
            self.dynamic_table.astype(self.table_dtype), xyzt,
            self.dynamic_spec, needs_pos_grad=needs_pos_grad,
        ).astype(jnp.float32)
        return self.dynamic_base_mlp(enc), enc

    def _flow_encode(self, normed_positions, normed_timestamps,
                     needs_pos_grad=False):
        if self.fused:
            _, flw = self._dynflow_encode(
                normed_positions, normed_timestamps, needs_pos_grad
            )
            return flw
        xyzt = jnp.concatenate(
            [normed_positions, normed_timestamps[..., None]], axis=-1
        )
        return grid_encode(
            self.flow_table.astype(self.table_dtype), xyzt, self.flow_spec,
            needs_pos_grad=needs_pos_grad,
        ).astype(jnp.float32)

    def forward_flow_hash(self, normed_positions, normed_timestamps,
                          needs_pos_grad=False, train=True):
        """Flow field query -> (..., 6) = (forward_flow, backward_flow).

        At eval with ``enable_temporal_interpolation``, the flow encoding
        is lerped between the two nearest TRAINING timesteps (reference
        radiance_field.py:372-387 + nerf_utils temporal_interpolation) —
        queries at unseen timesteps otherwise hit hash cells the field
        never trained."""
        if (
            not train
            and self.enable_temporal_interpolation
            and self.training_timesteps
        ):
            ts = jnp.asarray(self.training_timesteps, jnp.float32)
            t_ray = normed_timestamps[..., 0]  # per-ray timestep
            near2 = find_topk_nearby_timesteps(ts, t_ray)  # (..., 2)
            left, right = near2[..., 0], near2[..., 1]
            denom = right - left
            offset = jnp.where(
                jnp.abs(denom) > 1e-8, (t_ray - left) / denom, 0.0
            )[..., None, None]
            expand = normed_timestamps.shape[-1]
            left_t = jnp.repeat(left[..., None], expand, axis=-1)
            right_t = jnp.repeat(right[..., None], expand, axis=-1)
            enc_l = self._flow_encode(
                normed_positions, left_t, needs_pos_grad
            )
            enc_r = self._flow_encode(
                normed_positions, right_t, needs_pos_grad
            )
            if self.interpolate_xyz_encoding:
                return self.flow_mlp(enc_l * (1 - offset) + enc_r * offset)
            return (
                self.flow_mlp(enc_l) * (1 - offset)
                + self.flow_mlp(enc_r) * offset
            )
        enc = self._flow_encode(
            normed_positions, normed_timestamps, needs_pos_grad
        )
        return self.flow_mlp(enc)

    # ------------------------------------------------------------------ #
    def _appearance(self, shape_prefix, data: Dict[str, jnp.ndarray]):
        """Appearance embedding per (ray, sample); mean embedding fallback at
        eval when indices are missing (radiance_field.py:633-645)."""
        if not self.use_appearance_embedding:
            return None
        if self.enable_cam_embedding and "cam_idx" in data:
            return self.appearance_embedding(data["cam_idx"])
        if self.enable_img_embedding and "img_idx" in data:
            return self.appearance_embedding(data["img_idx"])
        mean = self.appearance_embedding.embedding.mean(axis=0)
        return jnp.broadcast_to(
            mean, (*shape_prefix, self.appearance_embedding_dim)
        )

    def query_rgb(self, directions, geo_feats, dynamic_geo_feats=None, data=None):
        """Shared RGB head over static (and dynamic) geometry features
        (radiance_field.py:622-658)."""
        data = data or {}
        directions = (directions + 1.0) / 2.0
        h = self._encode_dirs(directions)
        app = self._appearance(directions.shape[:-1], data)
        if app is not None:
            h = jnp.concatenate([h, app], axis=-1)
        results = {"rgb": nn.sigmoid(self.rgb_head(jnp.concatenate([h, geo_feats], -1)))}
        if dynamic_geo_feats is not None:
            results["dynamic_rgb"] = nn.sigmoid(
                self.rgb_head(jnp.concatenate([h, dynamic_geo_feats], -1))
            )
        return results

    def query_sky(self, directions_per_ray, data=None):
        """Sky color (and sky feature) from per-ray directions
        (radiance_field.py:660-686)."""
        data = data or {}
        # NOTE: the reference feeds RAW directions to the sky encoder (no
        # (d+1)/2 remap, radiance_field.py:663-666) — reproduced here
        dd = self._encode_dirs(directions_per_ray)
        app = self._appearance(directions_per_ray.shape[:-1], data)
        if app is not None:
            dd = jnp.concatenate([dd, app], axis=-1)
        results = {"rgb_sky": nn.sigmoid(self.sky_head(dd))}
        if self.enable_feature_head:
            results["dino_sky_feat"] = self.dino_sky_head(dd)
        return results

    def temporal_aggregation(
        self, positions, normed_positions, normed_timestamps, forward_flow,
        backward_flow, train: bool, cur_feats=None,
    ):
        """Scene-flow-warped feature aggregation, Eq. (8)
        (radiance_field.py:553-620). Re-queries the dynamic field at the
        +/- flow-warped positions and the flow field for cycle consistency.

        TPU shape notes: with the fused dyn+flow grid, ``cur_feats`` (the
        current-time dynamic features) comes from the caller's fused query
        and the two warped points are ONE batched 2N fused encode — one
        gather per (point, level) covers dynamic features AND cycle flow.
        Unfused, the current + two warped dynamic queries are ONE batched
        3N encode and the two warped flow queries ONE 2N encode."""
        if train:
            noise = jax.random.uniform(
                self.make_rng("aggregation"), (*forward_flow.shape[:-1], 1)
            )
        else:
            noise = jnp.ones((*forward_flow.shape[:-1], 1), forward_flow.dtype)

        fwd_pos = self.contract_points(positions + forward_flow * noise)
        bwd_pos = self.contract_points(positions + backward_flow * noise)
        noise_t = noise[..., 0]
        fwd_time = jnp.clip(normed_timestamps + self.time_diff * noise_t, 0.0, 1.0)
        bwd_time = jnp.clip(normed_timestamps - self.time_diff * noise_t, 0.0, 1.0)

        k = self.temporal_agg_topk
        use_topk = (
            self.fused
            and cur_feats is not None
            and k > 0
            and positions.ndim == 3
            and k < positions.shape[1]
        )
        if use_topk:
            return self._topk_aggregation(
                positions, normed_timestamps, forward_flow, backward_flow,
                cur_feats, noise, k, train=train,
            )

        pos2 = jnp.stack([fwd_pos, bwd_pos])
        t2 = jnp.stack([fwd_time, bwd_time])
        if self.fused and cur_feats is not None:
            # warped positions depend on the flow field -> position grads
            dyn2, flow2 = self._dynflow_encode(pos2, t2, needs_pos_grad=True)
            feats2 = self.dynamic_base_mlp(dyn2)
            fwd_feats, bwd_feats = feats2[0], feats2[1]
            pred2 = self._cycle_flow_pred(pos2, t2, flow2, train)
        else:
            # batched dynamic query: (cur, +warp, -warp) stacked on axis 0.
            # warped positions depend on the flow field, so the whole batch
            # takes position grads (the cur slice's extra d/dpos is unused).
            pos3 = jnp.stack([normed_positions, fwd_pos, bwd_pos])
            t3 = jnp.stack([normed_timestamps, fwd_time, bwd_time])
            feats3, _ = self.forward_dynamic_hash(
                pos3, t3, needs_pos_grad=True
            )
            cur_feats, fwd_feats, bwd_feats = feats3[0], feats3[1], feats3[2]
            # batched cycle-consistency flow query at the warped points
            pred2 = self.forward_flow_hash(
                pos2, t2, needs_pos_grad=True, train=train
            )

        aggregated = (cur_feats + 0.5 * fwd_feats + 0.5 * bwd_feats) / 2.0
        return {
            "dynamic_feats": aggregated,
            "forward_pred_backward_flow": pred2[0][..., 3:],
            "backward_pred_forward_flow": pred2[1][..., :3],
        }

    def _cycle_flow_pred(self, pos2, t2, flow2, train: bool):
        """Cycle-consistency flow predictions at the warped points.

        In the fused-grid fast path the flow encoding (``flow2``) falls out
        of the same gather as the dynamic features.  At eval with
        ``enable_temporal_interpolation`` the direct ``flow_mlp(flow2)``
        would bypass the nearest-training-timestep lerp that the unfused
        path applies (reference radiance_field.py:372-387), so route the
        query through :meth:`forward_flow_hash` there (extra encodes at
        eval only)."""
        if (
            not train
            and self.enable_temporal_interpolation
            and self.training_timesteps
        ):
            return self.forward_flow_hash(
                pos2, t2, needs_pos_grad=False, train=False
            )
        return self.flow_mlp(flow2)

    def _topk_aggregation(
        self, positions, normed_timestamps, forward_flow, backward_flow,
        cur_feats, noise, k: int, train: bool = True,
    ):
        """Temporal aggregation restricted to the K most-dynamic samples
        per ray (by current-time dynamic density).  Non-selected samples
        keep their un-aggregated current-time features; the cycle
        predictions are scattered back full-size with an ``agg_mask`` so
        the cycle loss averages only over selected samples."""
        r, s = positions.shape[:2]
        cur_density = density_activation(cur_feats[..., 0])  # (R, S)
        _, idx = jax.lax.top_k(cur_density, k)  # (R, K)

        # gathers/scatters over the S axis via one-hot contractions:
        # fancy-index .at[].set / take_along_axis at (R, K) lower to
        # scatters with SMEM-serialized index lists (~5.7M rows/s,
        # measured 137 ms/step across these six ops); the (R, K, S)
        # one-hot einsums are a few MXU/VPU ms
        onehot = (
            idx[:, :, None] == jnp.arange(s, dtype=idx.dtype)[None, None, :]
        ).astype(jnp.float32)  # (R, K, S)

        def sel(x):
            if x.ndim == 2:
                return jnp.einsum("rks,rs->rk", onehot, x)
            return jnp.einsum("rks,rsf->rkf", onehot, x)

        pos_k = sel(positions)
        t_k = sel(normed_timestamps)
        ff_k, bf_k = sel(forward_flow), sel(backward_flow)
        noise_k = sel(noise)
        fwd_pos = self.contract_points(pos_k + ff_k * noise_k)
        bwd_pos = self.contract_points(pos_k + bf_k * noise_k)
        nt = noise_k[..., 0]
        fwd_time = jnp.clip(t_k + self.time_diff * nt, 0.0, 1.0)
        bwd_time = jnp.clip(t_k - self.time_diff * nt, 0.0, 1.0)

        pos2 = jnp.stack([fwd_pos, bwd_pos])
        t2 = jnp.stack([fwd_time, bwd_time])
        dyn2, flow2 = self._dynflow_encode(pos2, t2, needs_pos_grad=True)
        feats2 = self.dynamic_base_mlp(dyn2)  # (2, R, K, gf+sf)
        pred2 = self._cycle_flow_pred(pos2, t2, flow2, train)  # (2, R, K, 6)

        def unsel(vals_k):  # (R, K, F) -> (R, S, F), zeros off-mask
            return jnp.einsum("rks,rkf->rsf", onehot, vals_k)

        mask = onehot.sum(axis=1)  # (R, S), exactly K ones per ray
        cur_k = sel(cur_feats)
        agg_k = (cur_k + 0.5 * feats2[0] + 0.5 * feats2[1]) / 2.0
        aggregated = (
            cur_feats * (1.0 - mask)[..., None] + unsel(agg_k)
        )

        fwd_pred_bwd = unsel(pred2[0][..., 3:])
        bwd_pred_fwd = unsel(pred2[1][..., :3])
        return {
            "dynamic_feats": aggregated,
            "forward_pred_backward_flow": fwd_pred_bwd,
            "backward_pred_forward_flow": bwd_pred_fwd,
            "agg_mask": mask,
        }

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        positions: jnp.ndarray,  # (R, S, 3)
        directions: Optional[jnp.ndarray] = None,  # (R, S, 3)
        data: Optional[Dict[str, jnp.ndarray]] = None,
        return_density_only: bool = False,
        combine_static_dynamic: bool = False,
        query_feature_head: bool = True,
        query_pe_head: bool = True,
        query_sky_head: bool = True,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """One field query (radiance_field.py:391-551). All flags static."""
        data = data or {}
        results: Dict[str, jnp.ndarray] = {}

        encoded, normed_positions = self.forward_static_hash(positions)
        geo_feats = encoded[..., : self.geometry_feature_dim]
        semantic_feats = encoded[..., self.geometry_feature_dim :]
        static_density = density_activation(geo_feats[..., 0])

        has_timestamps = "normed_timestamps" in data
        dynamic_geo_feats = None
        dynamic_semantic_feats = None
        if self.has_dynamic and has_timestamps:
            t = data["normed_timestamps"]
            if self.has_flow:
                cur_feats = None
                if self.fused:
                    # ONE fused query yields the current-time dynamic
                    # features AND the flow encoding
                    dyn_enc, flow_enc = self._dynflow_encode(
                        normed_positions, t
                    )
                    cur_feats = self.dynamic_base_mlp(dyn_enc)
                    use_interp = (
                        not train
                        and self.enable_temporal_interpolation
                        and self.training_timesteps
                    )
                    if use_interp:
                        flow = self.forward_flow_hash(
                            normed_positions, t, train=train
                        )
                    else:
                        flow = self.flow_mlp(flow_enc)
                else:
                    # the current-time dynamic query is batched INSIDE
                    # temporal_aggregation with the two warped queries
                    flow = self.forward_flow_hash(
                        normed_positions, t, train=train
                    )
                forward_flow, backward_flow = flow[..., :3], flow[..., 3:]
                results["forward_flow"] = forward_flow
                results["backward_flow"] = backward_flow
                agg = self.temporal_aggregation(
                    positions, normed_positions, t, forward_flow,
                    backward_flow, train=train, cur_feats=cur_feats,
                )
                dynamic_feats = agg.pop("dynamic_feats")
                results.update(agg)
            else:
                dynamic_feats, _ = self.forward_dynamic_hash(
                    normed_positions, t
                )

            dynamic_geo_feats = dynamic_feats[..., : self.geometry_feature_dim]
            dynamic_semantic_feats = dynamic_feats[..., self.geometry_feature_dim :]
            dynamic_density = density_activation(dynamic_geo_feats[..., 0])
            density = static_density + dynamic_density
            results.update(
                density=density,
                static_density=static_density,
                dynamic_density=dynamic_density,
            )
            if return_density_only:
                return results

            if directions is not None:
                rgb_results = self.query_rgb(
                    directions, geo_feats, dynamic_geo_feats, data=data
                )
                results["static_rgb"] = rgb_results["rgb"]
                results["dynamic_rgb"] = rgb_results["dynamic_rgb"]
                if combine_static_dynamic:
                    s_ratio = static_density / (density + 1e-6)
                    d_ratio = dynamic_density / (density + 1e-6)
                    results["rgb"] = (
                        s_ratio[..., None] * results["static_rgb"]
                        + d_ratio[..., None] * results["dynamic_rgb"]
                    )
            if self.enable_shadow_head:
                shadow_ratio = self.shadow_head(dynamic_geo_feats)
                results["shadow_ratio"] = shadow_ratio
                if combine_static_dynamic and "rgb" in results:
                    results["rgb"] = (
                        s_ratio[..., None] * results["rgb"] * (1 - shadow_ratio)
                        + d_ratio[..., None] * results["dynamic_rgb"]
                    )
        else:
            results["density"] = static_density
            results["static_density"] = static_density
            if return_density_only:
                return results
            if directions is not None:
                results["rgb"] = self.query_rgb(directions, geo_feats, data=data)["rgb"]

        if self.enable_feature_head and query_feature_head:
            if self.enable_learnable_pe and query_pe_head and "pixel_coords" in data:
                # pixel_coords is (y/H, x/W); the reference feeds it to
                # grid_sample as-is, so coord 0 indexes the map's width axis
                # and coord 1 its height axis (radiance_field.py:509-521).
                pc = data["pixel_coords"] * 2.0 - 1.0
                pe = grid_sample_2d(self.learnable_pe_map, pc[..., 0], pc[..., 1])
                results["dino_pe"] = self.pe_head(pe)
            dino_feats = self.dino_head(semantic_feats)
            if dynamic_semantic_feats is not None:
                dynamic_dino_feats = self.dino_head(dynamic_semantic_feats)
                results["static_dino_feat"] = dino_feats
                results["dynamic_dino_feat"] = dynamic_dino_feats
                if combine_static_dynamic:
                    s_ratio = static_density / (results["density"] + 1e-6)
                    d_ratio = results["dynamic_density"] / (results["density"] + 1e-6)
                    results["dino_feat"] = (
                        s_ratio[..., None] * dino_feats
                        + d_ratio[..., None] * dynamic_dino_feats
                    )
            else:
                results["dino_feat"] = dino_feats

        if self.enable_sky_head and query_sky_head and directions is not None:
            per_ray_dirs = directions[:, 0]
            per_ray_data = {
                k: v[:, 0] for k, v in data.items() if v.ndim >= 2 and k != "pixel_coords"
            }
            results.update(self.query_sky(per_ray_dirs, data=per_ray_data))

        return results

    # ------------------------------------------------------------------ #
    def query_flow(self, positions, normed_timestamps, query_density: bool = True):
        """Point query of the flow field (radiance_field.py:688-713)."""
        normed = self.contract_points(positions)
        flow = self.forward_flow_hash(normed, normed_timestamps, train=False)
        results = {"forward_flow": flow[..., :3], "backward_flow": flow[..., 3:]}
        if query_density:
            dynamic_feats, _ = self.forward_dynamic_hash(normed, normed_timestamps)
            geo = dynamic_feats[..., : self.geometry_feature_dim]
            results["dynamic_density"] = density_activation(geo[..., 0])
        return results

    def query_attributes(
        self, positions, normed_timestamps=None, query_feature_head: bool = True
    ):
        """Point query of densities / features for voxel vis and occupancy
        eval (radiance_field.py:715-785)."""
        results: Dict[str, jnp.ndarray] = {}
        encoded, normed = self.forward_static_hash(positions)
        geo_feats = encoded[..., : self.geometry_feature_dim]
        semantic_feats = encoded[..., self.geometry_feature_dim :]
        static_density = density_activation(geo_feats[..., 0])

        dynamic_semantic_feats = None
        if self.has_dynamic and normed_timestamps is not None:
            if self.has_flow:
                flow = self.forward_flow_hash(
                    normed, normed_timestamps, train=False
                )
                results["forward_flow"] = flow[..., :3]
                results["backward_flow"] = flow[..., 3:]
                agg = self.temporal_aggregation(
                    positions, normed, normed_timestamps, flow[..., :3],
                    flow[..., 3:], train=False,
                )
                dynamic_feats = agg.pop("dynamic_feats")
            else:
                dynamic_feats, _ = self.forward_dynamic_hash(
                    normed, normed_timestamps
                )
            dynamic_geo_feats = dynamic_feats[..., : self.geometry_feature_dim]
            dynamic_semantic_feats = dynamic_feats[..., self.geometry_feature_dim :]
            dynamic_density = density_activation(dynamic_geo_feats[..., 0])
            density = static_density + dynamic_density
            results.update(
                density=density,
                static_density=static_density,
                dynamic_density=dynamic_density,
            )
        else:
            results["density"] = static_density

        if self.enable_feature_head and query_feature_head:
            dino_feats = self.dino_head(semantic_feats)
            if dynamic_semantic_feats is not None:
                dynamic_dino = self.dino_head(dynamic_semantic_feats)
                results["static_dino_feat"] = dino_feats
                results["dynamic_dino_feat"] = dynamic_dino
                results["dino_feat"] = (
                    results["static_density"][..., None] * dino_feats
                    + results["dynamic_density"][..., None] * dynamic_dino
                ) / (results["density"][..., None] + 1e-6)
            else:
                results["dino_feat"] = dino_feats
        return results

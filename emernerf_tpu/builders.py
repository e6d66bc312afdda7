"""Factories: config + dataset -> models, train-step config, state.

Counterpart of /root/reference/builders.py, including the dataset-derived
hyperparameter injection (aabb, num_train_timesteps, num_cams) and the
img->cam embedding override when a test split exists (builders.py:26-32).
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax.numpy as jnp

from emernerf_tpu.config import ConfigNode
from emernerf_tpu.data.dataset import SceneDataset
from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.ops.brickgrid import BrickGridSpec
from emernerf_tpu.ops.hashgrid import HashGridSpec
from emernerf_tpu.train.step import TrainStepConfig


def make_grid_spec(
    backend: str,
    n_input_dims: int,
    n_levels: int,
    base_resolution: int,
    max_resolution: int,
    log2_hashmap_size: int,
    n_features_per_level: int,
    perf: dict | None = None,
):
    """Grid spec for the configured backend.

    "brick" (default, TPU-fast): cell capacity matches the hash table —
    a brick covers 2^3 spatial cells, so log2_bricks = log2_hashmap_size - 3.
    "hash": the exact tcnn layout (for parity checks / tiny models).
    ``perf``: measured-formulation knobs from ``cfg.nerf.model.perf``
    (scatter_mode/reduce_mode/posgrad_mode/gather_mode) — spec fields so a
    run's numerics are reproducible from its config snapshot."""
    perf = perf or {}
    if backend == "hash":
        return HashGridSpec(
            n_input_dims=n_input_dims,
            n_levels=n_levels,
            base_resolution=base_resolution,
            max_resolution=max_resolution,
            log2_hashmap_size=log2_hashmap_size,
            n_features_per_level=n_features_per_level,
            gather_mode=perf.get("gather_mode", "2d"),
        )
    if backend == "mx":
        from emernerf_tpu.ops.mxgrid import MXGridSpec

        return MXGridSpec(
            n_input_dims=n_input_dims,
            n_levels=n_levels,
            base_resolution=base_resolution,
            max_resolution=max_resolution,
            n_features_per_level=n_features_per_level,
            rank=int(perf.get("mx_rank", 16)),
            time_resolution=int(perf.get("mx_time_resolution", 64)),
            chunk=int(perf.get("mx_chunk", 8192)),
            max_line_resolution=int(perf.get("mx_max_line_resolution", 4096)),
            line_block=int(perf.get("mx_line_block", 128)),
        )
    if backend == "brick":
        # F=1 grids (proposal nets) use 4^3-cell bricks: the 125-corner row
        # fills the 128-lane tile (a 27-corner F=1 row wastes 4.7x HBM on
        # lane padding) and cell capacity per row is 64 -> log2_bricks - 6.
        bs = 2 if n_features_per_level == 1 and n_input_dims == 3 else 1
        return BrickGridSpec(
            n_input_dims=n_input_dims,
            n_levels=n_levels,
            base_resolution=base_resolution,
            max_resolution=max_resolution,
            log2_bricks=max(log2_hashmap_size - 3 * bs, 4),
            n_features_per_level=n_features_per_level,
            log2_brick_size=bs,
            # 4D rows store both time corners: ONE gather per (point, level)
            # instead of two — gathers are row-rate-bound on TPU.  The
            # reference-semantics profile turns this off via
            # nerf.model.perf.time_pair=false (unpaired rows, two gathers —
            # the reference's tcnn table layout has no pairing either,
            # encodings.py:130-146).
            time_pair=n_input_dims == 4 and bool(perf.get("time_pair", True)),
            scatter_mode=perf.get("scatter_mode", "wide"),
            reduce_mode=perf.get("reduce_mode", "unroll"),
            posgrad_mode=perf.get("posgrad_mode", "fwd"),
            onehot_budget=int(perf.get("onehot_budget", 1 << 19)),
            grad_subsample=int(perf.get("grad_subsample", 1)),
        )
    raise ValueError(f"Unknown grid backend: {backend}")


def _grid_backend(cfg: ConfigNode) -> str:
    return cfg.nerf.model.get("grid_backend", "brick")


def _perf_cfg(cfg: ConfigNode) -> dict:
    """nerf.model.perf.* measured-formulation knobs as a plain dict."""
    perf = cfg.nerf.model.get("perf", None)
    if perf is None:
        return {}
    return {k: perf[k] for k in perf.keys()}


def _table_dtype(cfg: ConfigNode):
    name = cfg.nerf.model.get("table_dtype", "float32")
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _table_param_dtype(cfg: ConfigNode):
    name = cfg.nerf.model.get("table_param_dtype", "float32")
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _mlp_dtype(cfg: ConfigNode):
    name = cfg.nerf.model.get("mlp_dtype", "float32")
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _enc_spec(enc_cfg: ConfigNode, backend: str, perf: dict | None = None):
    return make_grid_spec(
        backend,
        n_input_dims=enc_cfg.n_input_dims,
        n_levels=enc_cfg.n_levels,
        base_resolution=enc_cfg.base_resolution,
        max_resolution=enc_cfg.max_resolution,
        log2_hashmap_size=enc_cfg.log2_hashmap_size,
        n_features_per_level=enc_cfg.n_features_per_level,
        perf=perf,
    )


def _flow_spec(backend: str, perf: dict | None = None):
    """Flow encoder structure is hardcoded in the reference
    (radiance_field.py:916-923)."""
    return make_grid_spec(
        backend, n_input_dims=4, n_levels=10, base_resolution=16,
        max_resolution=4096, log2_hashmap_size=18, n_features_per_level=4,
        perf=perf,
    )


# kept for backward compatibility with existing tests/tools
FLOW_SPEC = _flow_spec("hash")


def build_model_from_cfg(cfg: ConfigNode, dataset: SceneDataset) -> RadianceField:
    """cfg is the full config; consumes cfg.nerf.model + cfg.data."""
    model_cfg = cfg.nerf.model
    head = model_cfg.head
    enable_cam = head.enable_cam_embedding
    enable_img = head.enable_img_embedding
    if dataset.has_test_split and enable_img:
        # per-image embeddings can't generalize to held-out images
        # (reference builders.py:26-32)
        enable_cam, enable_img = True, False

    enable_feature = head.enable_feature_head
    semantic_dim = model_cfg.neck.semantic_feature_dim if enable_feature else 0
    feature_dim = head.feature_embedding_dim
    if enable_feature and dataset.features is not None:
        feature_dim = int(dataset.features.shape[-1])

    backend = _grid_backend(cfg)
    perf = _perf_cfg(cfg)
    dynamic_spec = (
        _enc_spec(model_cfg.dynamic_xyz_encoder, backend, perf)
        if head.enable_dynamic_branch
        else None
    )
    flow_spec = (
        _flow_spec(backend, perf) if head.enable_flow_branch else None
    )
    # fuse the dynamic + flow grids into one F=8 table by default on the
    # brick backend (halves 4D gather/scatter rows — the dominant train
    # cost); the exact-hash backend keeps the reference's separate grids
    fuse_flow = bool(
        model_cfg.get("fuse_flow_grid", backend in ("brick", "mx"))
        and dynamic_spec is not None
        and flow_spec is not None
    )

    return RadianceField(
        static_spec=_enc_spec(model_cfg.xyz_encoder, backend, perf),
        dynamic_spec=dynamic_spec,
        flow_spec=flow_spec,
        fuse_flow_grid=fuse_flow,
        temporal_agg_topk=(
            int(head.get("temporal_agg_topk", 0)) if fuse_flow else 0
        ),
        aabb=tuple(float(v) for v in dataset.aabb),
        unbounded=cfg.nerf.unbounded,
        geometry_feature_dim=model_cfg.neck.geometry_feature_dim,
        base_mlp_layer_width=model_cfg.neck.base_mlp_layer_width,
        head_mlp_layer_width=head.head_mlp_layer_width,
        enable_cam_embedding=enable_cam,
        enable_img_embedding=enable_img,
        num_cams=dataset.num_cams,
        appearance_embedding_dim=head.appearance_embedding_dim,
        semantic_feature_dim=semantic_dim,
        feature_mlp_layer_width=head.feature_mlp_layer_width,
        feature_embedding_dim=feature_dim,
        enable_sky_head=head.enable_sky_head,
        enable_shadow_head=head.enable_shadow_head,
        enable_feature_head=enable_feature,
        enable_learnable_pe=head.enable_learnable_pe,
        num_train_timesteps=dataset.num_img_timesteps,
        time_diff=dataset.time_diff,
        table_dtype=_table_dtype(cfg),
        table_param_dtype=_table_param_dtype(cfg),
        mlp_dtype=_mlp_dtype(cfg),
        direction_encoding=head.get("direction_encoding", "sinusoidal"),
        enable_temporal_interpolation=head.get(
            "enable_temporal_interpolation", False
        ),
        interpolate_xyz_encoding=head.get("interpolate_xyz_encoding", True),
        training_timesteps=tuple(
            float(t)
            for t in dataset.unique_normalized_training_timestamps
        ),
    )


def build_propnets_from_cfg(
    cfg: ConfigNode, dataset: SceneDataset
) -> List[DensityField]:
    """Two proposal density fields (reference builders.py:92-110)."""
    pcfg = cfg.nerf.propnet
    enc = pcfg.xyz_encoder
    backend = _grid_backend(cfg)
    perf = _perf_cfg(cfg)
    nets = []
    for i in range(len(pcfg.num_samples_per_prop)):
        spec = make_grid_spec(
            backend,
            n_input_dims=enc.n_input_dims,
            n_levels=enc.n_levels_per_prop[i],
            base_resolution=enc.base_resolutions_per_prop[i],
            max_resolution=enc.max_resolution_per_prop[i],
            log2_hashmap_size=enc.lgo2_hashmap_size_per_prop[i],
            n_features_per_level=enc.n_features_per_level,
            perf=perf,
        )
        # footprint-based fine-level skipping (brick backend only; the
        # hash/mx specs have no coarse-view support).  Misconfiguration
        # ERRORS instead of silently measuring nothing (round-4 review):
        # a quality gate must never pass because the knob never engaged.
        skip = int(pcfg.get("fine_level_skip", 0))
        if skip > 0 and backend != "brick":
            raise ValueError(
                f"nerf.propnet.fine_level_skip={skip} requires "
                f"grid_backend=brick (got {backend!r}): the hash/mx specs "
                "have no coarse-view support")
        if skip > 0 and skip >= int(enc.n_levels_per_prop[i]):
            raise ValueError(
                f"nerf.propnet.fine_level_skip={skip} must be < the prop "
                f"grid's n_levels ({int(enc.n_levels_per_prop[i])} for "
                f"prop {i}): at least one coarse level must remain")
        nets.append(
            DensityField(
                spec=spec,
                aabb=tuple(float(v) for v in dataset.aabb),
                unbounded=cfg.nerf.unbounded,
                table_dtype=_table_dtype(cfg),
                table_param_dtype=_table_param_dtype(cfg),
                mlp_dtype=_mlp_dtype(cfg),
                fine_level_skip=skip,
                fine_level_frac=float(pcfg.get("fine_level_frac", 0.5)),
            )
        )
    return nets


def build_train_step_config(cfg: ConfigNode, dataset: SceneDataset) -> TrainStepConfig:
    sup = cfg.supervision
    head = cfg.nerf.model.head
    has_lidar = (
        dataset.lidar is not None
        and cfg.data.lidar_source.load_lidar
        and sup.depth.enable
    )
    lidar_prop = cfg.nerf.propnet.get("lidar_num_samples_per_prop", None)
    if lidar_prop:
        n_props = len(cfg.nerf.propnet.num_samples_per_prop)
        if len(lidar_prop) != n_props:
            raise ValueError(
                "nerf.propnet.lidar_num_samples_per_prop must have one entry "
                f"per proposal model ({n_props}), got {list(lidar_prop)} — "
                "the lidar branch shares the proposal networks, only the "
                "per-level sample counts may differ"
            )
        if cfg.optim.get("fused_lidar_branch", False):
            raise ValueError(
                "nerf.propnet.lidar_num_samples_per_prop has no effect with "
                "optim.fused_lidar_branch=true (one combined render has one "
                "proposal hierarchy); unset one of the two"
            )
    return TrainStepConfig(
        num_samples=cfg.nerf.sampling.num_samples,
        prop_samples=tuple(cfg.nerf.propnet.num_samples_per_prop),
        lidar_prop_samples=(
            tuple(int(v) for v in lidar_prop) if lidar_prop else None
        ),
        near_plane=cfg.nerf.propnet.near_plane,
        far_plane=cfg.nerf.propnet.far_plane,
        sampling_type=cfg.nerf.propnet.sampling_type,
        sample_topk=int(cfg.nerf.sampling.get("sample_topk", 0)),
        sample_topk_temp=float(cfg.nerf.sampling.get("sample_topk_temp", 0.0)),
        lidar_sample_topk=int(cfg.nerf.sampling.get("lidar_sample_topk", -1)),
        lidar_topk_until=float(
            cfg.nerf.sampling.get("lidar_topk_until", 1.0)
        ),
        enable_anti_aliasing=cfg.nerf.propnet.enable_anti_aliasing_level_loss,
        pulse_widths=tuple(cfg.nerf.propnet.anti_aliasing_pulse_width),
        rgb_loss_type=sup.rgb.loss_type,
        rgb_coef=sup.rgb.loss_coef,
        use_sky_loss=bool(
            cfg.data.pixel_source.load_sky_mask and head.enable_sky_head
            and dataset.sky_masks is not None
        ),
        sky_loss_type=sup.sky.loss_type,
        sky_coef=sup.sky.loss_coef,
        use_feature_loss=bool(
            cfg.data.pixel_source.load_features and head.enable_feature_head
            and dataset.features is not None
        ),
        feature_loss_type=sup.feature.loss_type,
        feature_coef=sup.feature.loss_coef,
        use_dynamic_reg=head.enable_dynamic_branch,
        dynamic_loss_type=sup.dynamic.loss_type,
        dynamic_coef=sup.dynamic.loss_coef,
        entropy_skewness=sup.dynamic.entropy_loss_skewness,
        use_shadow_loss=head.enable_shadow_head,
        shadow_loss_type=sup.shadow.loss_type,
        shadow_coef=sup.shadow.loss_coef,
        has_flow=head.enable_flow_branch,
        has_lidar=has_lidar,
        depth_loss_type=sup.depth.loss_type,
        depth_coef=sup.depth.loss_coef,
        los_enable=sup.depth.line_of_sight.enable,
        los_coef=sup.depth.line_of_sight.loss_coef,
        los_start_iter=sup.depth.line_of_sight.start_iter,
        los_start_epsilon=sup.depth.line_of_sight.start_epsilon,
        los_end_epsilon=sup.depth.line_of_sight.end_epsilon,
        los_decay_steps=sup.depth.line_of_sight.decay_steps,
        los_decay_rate=sup.depth.line_of_sight.decay_rate,
        lr=cfg.optim.lr,
        weight_decay=float(cfg.optim.weight_decay),
        fused_branches=bool(cfg.optim.get("fused_lidar_branch", False)),
        remat=bool(cfg.optim.get("remat", False)),
        num_iters=cfg.optim.num_iters,
    )


def build_dataset_from_cfg(cfg: ConfigNode) -> SceneDataset:
    """Dataset dispatch (train_emernerf.py:441-448 + synthetic)."""
    name = cfg.data.dataset
    if name == "synthetic":
        from emernerf_tpu.data.synthetic import make_synthetic_scene

        syn = cfg.data.synthetic
        s = make_synthetic_scene(
            num_frames=syn.num_frames,
            num_cams=cfg.data.pixel_source.num_cams,
            hw=(syn.image_height, syn.image_width),
            dynamic=syn.dynamic,
        )
        n_cams = s["num_cams"]
        lidar = None
        if cfg.data.lidar_source.load_lidar:
            frame_idx = np.round(
                s["lidar_normed_timestamps"] * (s["num_frames"] - 1)
            ).astype(np.int64)
            lidar = dict(
                origins=s["lidar_origins"],
                viewdirs=s["lidar_viewdirs"],
                ranges=s["lidar_ranges"],
                frame_idx=frame_idx,
                flows=s["lidar_flows"],
                flow_classes=s["lidar_flow_classes"],
                ground=s["lidar_ground"],
            )
        return SceneDataset(
            images=s["images"],
            c2w=s["c2w"],
            intrinsics=s["intrinsics"],
            frame_idx=np.repeat(np.arange(s["num_frames"]), n_cams),
            cam_ids=s["cam_ids"],
            sky_masks=s["sky_masks"]
            if cfg.data.pixel_source.load_sky_mask
            else None,
            dynamic_masks=s["dynamic_masks"]
            if cfg.data.pixel_source.load_dynamic_mask
            else None,
            lidar=lidar,
            aabb=s["aabb"],
            test_image_stride=cfg.data.pixel_source.test_image_stride,
            buffer_downscale=cfg.data.pixel_source.sampler.buffer_downscale,
            buffer_ratio=cfg.data.pixel_source.sampler.buffer_ratio,
        )
    if name == "waymo":
        from emernerf_tpu.data.waymo import load_waymo_dataset

        return load_waymo_dataset(cfg)
    if name == "nuscenes":
        from emernerf_tpu.data.nuscenes import load_nuscenes_dataset

        return load_nuscenes_dataset(cfg)
    raise ValueError(f"Unknown dataset: {name}")

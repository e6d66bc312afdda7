"""Flagship model setup shared by bench.py and __graft_entry__.py:
the full EmerNeRF configuration (static + dynamic + flow fields, sky +
shadow heads, reference-scale hash grids) on a synthetic scene."""

from __future__ import annotations

import os

import numpy as np

from emernerf_tpu.builders import (
    build_dataset_from_cfg,
    build_model_from_cfg,
    build_propnets_from_cfg,
    build_train_step_config,
)
from emernerf_tpu.config import (
    from_dotlist,
    load_config,
    normalize_default_interactions,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG = os.path.join(_REPO_ROOT, "configs", "default_config.yaml")


def flagship_config(tiny: bool = False, overrides=()):
    """Full-feature config (dynamic + flow). ``tiny=True`` shrinks hash
    tables and sample counts for CPU dry runs while keeping every branch
    enabled."""
    cfg = load_config(DEFAULT_CONFIG)
    dot = [
        "data.dataset=synthetic",
        "data.synthetic.dynamic=true",
        "data.pixel_source.num_cams=1",
        "nerf.model.head.enable_dynamic_branch=true",
        "nerf.model.head.enable_shadow_head=true",
        "nerf.model.head.enable_flow_branch=true",
    ]
    if tiny:
        dot += [
            "data.ray_batch_size=64",
            "data.synthetic.num_frames=3",
            "data.synthetic.image_height=16",
            "data.synthetic.image_width=24",
            "nerf.model.xyz_encoder.n_levels=4",
            "nerf.model.xyz_encoder.log2_hashmap_size=10",
            "nerf.model.xyz_encoder.max_resolution=64",
            "nerf.model.dynamic_xyz_encoder.n_levels=4",
            "nerf.model.dynamic_xyz_encoder.log2_hashmap_size=10",
            "nerf.model.dynamic_xyz_encoder.max_resolution=64",
            "nerf.propnet.num_samples_per_prop=[8,4]",
            # tiny prop grids have 2 levels / <=8 samples: fine-level
            # skipping can neither engage nor validate there (it ERRORS
            # loudly by design); explicit overrides still win over this
            "nerf.propnet.fine_level_skip=0",
            "nerf.propnet.xyz_encoder.n_levels_per_prop=[2,2]",
            "nerf.propnet.xyz_encoder.max_resolution_per_prop=[32,64]",
            "nerf.propnet.xyz_encoder.lgo2_hashmap_size_per_prop=[10,10]",
            "nerf.sampling.num_samples=4",
            "nerf.model.neck.geometry_feature_dim=16",
            "nerf.model.neck.base_mlp_layer_width=16",
            "nerf.model.head.head_mlp_layer_width=16",
            # keep the top-k aggregation path exercised at tiny scale
            "nerf.model.head.temporal_agg_topk=2",
        ]
    user = from_dotlist(list(dot) + list(overrides))
    cfg.merge_(user)
    normalize_default_interactions(cfg, user)
    return cfg


def build_flagship(tiny: bool = False, overrides=()):
    """Returns (cfg, dataset, model, prop_models, step_cfg)."""
    cfg = flagship_config(tiny=tiny, overrides=overrides)
    dataset = build_dataset_from_cfg(cfg)
    model = build_model_from_cfg(cfg, dataset)
    prop_models = build_propnets_from_cfg(cfg, dataset)
    step_cfg = build_train_step_config(cfg, dataset)
    # tiny mode keeps the flow branch but shrinks its (hardcoded) spec
    if tiny and model.flow_spec is not None:
        from emernerf_tpu.builders import _perf_cfg, make_grid_spec

        backend = cfg.nerf.model.get("grid_backend", "brick")
        model = model.clone(
            flow_spec=make_grid_spec(
                backend, n_input_dims=4, n_levels=4, base_resolution=8,
                max_resolution=64, log2_hashmap_size=10,
                n_features_per_level=2, perf=_perf_cfg(cfg),
            )
        )
    return cfg, dataset, model, prop_models, step_cfg

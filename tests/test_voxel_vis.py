"""Voxel / scene-flow visualization export tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.eval.points import PointQueryEngine
from emernerf_tpu.eval.voxel_vis import visualize_scene_flow, visualize_voxels
from emernerf_tpu.models.fields import RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec

TINY3 = HashGridSpec(3, 3, 4, 16, 8, 2)
TINY4 = HashGridSpec(4, 3, 4, 16, 8, 2)
AABB = (-5.0, -5.0, -5.0, 5.0, 5.0, 5.0)


def test_visualize_voxels_static(tmp_path):
    model = RadianceField(
        static_spec=TINY3, aabb=AABB, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=8, enable_feature_head=True,
        feature_embedding_dim=8, feature_mlp_layer_width=8,
        enable_learnable_pe=False,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)), {}
    )["params"]
    engine = PointQueryEngine(model, chunk_size=4096)
    out = visualize_voxels(
        engine, params, AABB, str(tmp_path / "vox"),
        voxel_size=1.0, density_threshold=0.0, save_html=True,
    )
    assert os.path.exists(out)
    assert os.path.exists(out.replace(".npz", ".html"))
    data = np.load(out)
    assert "frame0_xyz" in data and "frame0_rgb" in data
    assert data["frame0_xyz"].shape[0] > 0


@pytest.mark.slow
def test_visualize_scene_flow(tmp_path):
    from emernerf_tpu.builders import build_dataset_from_cfg
    from emernerf_tpu.config import from_dotlist, load_config

    DEFAULT = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "default_config.yaml",
    )
    cfg = load_config(DEFAULT)
    cfg.merge_(from_dotlist([
        "data.dataset=synthetic", "data.synthetic.dynamic=true",
        "data.synthetic.num_frames=3", "data.synthetic.image_height=12",
        "data.synthetic.image_width=18", "data.pixel_source.num_cams=1",
    ]))
    dataset = build_dataset_from_cfg(cfg)
    model = RadianceField(
        static_spec=TINY3, dynamic_spec=TINY4, flow_spec=TINY4,
        aabb=tuple(float(v) for v in dataset.aabb),
        geometry_feature_dim=8, base_mlp_layer_width=16,
        head_mlp_layer_width=16, semantic_feature_dim=0, time_diff=0.5,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)),
        {"normed_timestamps": jnp.zeros((2, 2))},
    )["params"]
    engine = PointQueryEngine(model, chunk_size=1024)
    out = visualize_scene_flow(
        engine, params, dataset, str(tmp_path / "flow"), max_frames=2
    )
    assert os.path.exists(out + ".npz") or os.path.exists(out)

"""Tests for eval metrics, chunked rendering, checkpointing, and video IO."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emernerf_tpu.eval.metrics import (
    compute_psnr,
    compute_scene_flow_metrics,
    compute_ssim,
    compute_valid_depth_rmse,
    knn_predict,
)
from emernerf_tpu.eval.renderer import ImageRenderer
from emernerf_tpu.eval.video import save_videos
from emernerf_tpu.models.fields import DensityField, RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec
from emernerf_tpu.utils.visualization import (
    depth_visualizer,
    get_robust_pca,
    scene_flow_to_rgb,
)

TINY3 = HashGridSpec(3, 4, 4, 32, 8, 2)
AABB = (-10.0, -10.0, -10.0, 10.0, 10.0, 10.0)


def test_psnr_and_depth_rmse():
    x = np.full((8, 8, 3), 0.5)
    assert compute_psnr(x, x) > 100
    assert np.isclose(compute_psnr(x, x + 0.1), 20.0, atol=0.01)
    pred = np.array([1.0, 2.0, 5.0])
    gt = np.array([2.0, 0.0, 5.0])  # middle one invalid
    assert np.isclose(compute_valid_depth_rmse(pred, gt), np.sqrt(0.5))


def test_ssim_properties():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3))
    assert compute_ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = compute_ssim(noisy, img)
    assert 0.0 < s < 0.9
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(0, 0.5, img.shape), 0, 1)
    assert compute_ssim(noisier, img) < s


def test_scene_flow_metrics():
    flow = np.random.default_rng(0).normal(size=(100, 3))
    m = compute_scene_flow_metrics(flow, flow)
    assert m["EPE3D"] == 0.0
    assert m["acc3d_strict"] == 100.0
    assert m["outlier"] == 0.0
    m2 = compute_scene_flow_metrics(flow + 1.0, flow)
    assert m2["EPE3D"] > 1.0


def test_knn_predict():
    bank = np.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]])
    labels = np.array([0, 0, 1, 1])
    queries = np.array([[1.0, 0.05], [0.05, 1.0]])
    pred = knn_predict(queries, bank, labels, n_classes=2, knn_k=2)
    np.testing.assert_array_equal(pred, [0, 1])


def test_chunked_render_matches_single():
    """Padding + chunking must not change results."""
    model = RadianceField(
        static_spec=TINY3, aabb=AABB, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=0,
    )
    prop = DensityField(spec=TINY3, aabb=AABB, base_mlp_layer_width=16)
    r = 50  # deliberately not a multiple of the chunk size
    rays = {
        "origins": np.zeros((r, 3), np.float32),
        "viewdirs": np.tile(np.asarray([[1.0, 0, 0]], np.float32), (r, 1)),
    }
    pos0 = jnp.zeros((r, 8, 3))
    params = model.init(jax.random.PRNGKey(0), pos0, jnp.ones((r, 8, 3)), {})[
        "params"
    ]
    pp = (prop.init(jax.random.PRNGKey(1), pos0)["params"],)

    kw = dict(num_samples=8, prop_samples=(16,))
    big = ImageRenderer(model, [prop], chunk_size=64, **kw)
    small = ImageRenderer(model, [prop], chunk_size=16, **kw)
    out_big = big.render_rays_chunked(params, pp, rays)
    out_small = small.render_rays_chunked(params, pp, rays)
    np.testing.assert_allclose(out_big["rgb"], out_small["rgb"], atol=1e-5)
    assert out_big["rgb"].shape == (r, 3)


def test_visualizers():
    depth = np.random.default_rng(0).uniform(1, 50, (16, 16))
    rgb = depth_visualizer(depth)
    assert rgb.shape == (16, 16, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1

    flow = np.random.default_rng(1).normal(size=(16, 16, 3))
    frgb = scene_flow_to_rgb(flow)
    assert frgb.shape == (16, 16, 3)

    feats = np.random.default_rng(2).normal(size=(100, 16))
    mat, cmin, cmax = get_robust_pca(feats)
    assert mat.shape == (16, 3)
    assert np.all(cmax >= cmin)


def test_save_videos(tmp_path):
    frames = [
        {
            "rgb": np.random.default_rng(i).uniform(0, 1, (8, 12, 3)),
            "depth": np.random.default_rng(i).uniform(1, 50, (8, 12)),
            "opacity": np.ones((8, 12)),
        }
        for i in range(4)
    ]
    out = save_videos(
        frames, str(tmp_path / "test.mp4"), keys=["rgb", "depth"],
        num_timestamps=2, fps=2, num_cams=2,
    )
    assert os.path.exists(out)


def test_checkpoint_roundtrip(tmp_path):
    from emernerf_tpu.train.checkpoints import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from emernerf_tpu.train.state import TrainState

    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.arange(4.0)},
        prop_params=({"t": jnp.ones((2, 2))},),
        opt_state={"m": jnp.zeros(4)},
        prop_opt_state={"m": jnp.zeros(2)},
    )
    save_checkpoint(str(tmp_path), state)
    path = latest_checkpoint(str(tmp_path))
    assert path is not None and path.endswith("checkpoint_00007")

    zero_state = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(path, zero_state)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  [0.0, 1.0, 2.0, 3.0])


@pytest.mark.slow
def test_lidar_flow_eval_machinery():
    """Flow eval runs end-to-end on the synthetic scene with GT flows."""
    from emernerf_tpu.builders import build_dataset_from_cfg
    from emernerf_tpu.config import from_dotlist, load_config
    from emernerf_tpu.eval.flow import evaluate_lidar_flow
    from emernerf_tpu.eval.points import PointQueryEngine

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
    assert "flows" in dataset.lidar
    # dynamic sphere points must have nonzero gt flow
    dyn = dataset.lidar["flow_classes"] == 1
    if dyn.sum():
        assert np.abs(dataset.lidar["flows"][dyn]).max() > 0.1

    TINY4 = HashGridSpec(4, 3, 4, 16, 8, 2)
    model = RadianceField(
        static_spec=TINY3, dynamic_spec=TINY4, flow_spec=TINY4,
        aabb=tuple(float(v) for v in dataset.aabb),
        geometry_feature_dim=8, base_mlp_layer_width=16,
        head_mlp_layer_width=16, semantic_feature_dim=0, time_diff=0.5,
    )
    import jax.numpy as jnp
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)),
        {"normed_timestamps": jnp.zeros((2, 2))},
    )["params"]
    engine = PointQueryEngine(model, chunk_size=512)
    m = evaluate_lidar_flow(engine, params, dataset)
    assert set(m) == {"EPE3D", "acc3d_strict", "acc3d_relax", "angle_error",
                      "outlier"}
    assert all(np.isfinite(v) for v in m.values())


def test_data_preview_video(tmp_path):
    from emernerf_tpu.builders import build_dataset_from_cfg
    from emernerf_tpu.config import from_dotlist, load_config
    from emernerf_tpu.eval.data_preview import render_data_video

    DEFAULT = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "default_config.yaml",
    )
    cfg = load_config(DEFAULT)
    cfg.merge_(from_dotlist([
        "data.dataset=synthetic", "data.synthetic.dynamic=true",
        "data.synthetic.num_frames=3", "data.synthetic.image_height=16",
        "data.synthetic.image_width=24", "data.pixel_source.num_cams=1",
    ]))
    dataset = build_dataset_from_cfg(cfg)
    out = render_data_video(dataset, str(tmp_path / "data.mp4"), fps=2)
    assert os.path.exists(out)


def test_novel_trajectory_generation_and_rays():
    """Novel-path cameras interpolate the training trajectory and yield
    well-formed rays (reference left this as a TODO,
    train_emernerf.py:431)."""
    from types import SimpleNamespace

    from emernerf_tpu.eval.novel import (
        _rays_for_camera,
        generate_novel_trajectory,
    )

    n = 4
    c2w = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    c2w[:, 0, 3] = np.arange(n)  # move along +x
    ds = SimpleNamespace(
        cam_ids=np.zeros(n, np.int32),
        c2w=c2w,
        intrinsics=np.tile(
            np.array([[20.0, 0, 12], [0, 20.0, 8], [0, 0, 1]], np.float32),
            (n, 1, 1),
        ),
        normed_timestamps=np.linspace(0, 1, n).astype(np.float32),
    )
    frames = generate_novel_trajectory(ds, upsample=2, lateral_amplitude=0.0)
    assert len(frames) == (n - 1) * 2 + 1
    # midpoint between frame 0 and 1 is at x = 0.5
    np.testing.assert_allclose(frames[1]["c2w"][0, 3], 0.5, atol=1e-6)
    # timestamps interpolate monotonically in [0, 1]
    ts = [f["normed_timestamp"] for f in frames]
    assert ts[0] == 0.0 and abs(ts[-1] - 1.0) < 1e-6
    assert all(b >= a for a, b in zip(ts, ts[1:]))

    rays = _rays_for_camera(
        frames[0]["c2w"], frames[0]["intrinsics"], (8, 12),
        frames[0]["normed_timestamp"],
    )
    assert rays["origins"].shape == (96, 3)
    np.testing.assert_allclose(
        np.linalg.norm(rays["viewdirs"], axis=-1), 1.0, atol=1e-5
    )


def test_ssim_full_map_matches_image_size():
    from emernerf_tpu.eval.metrics import compute_ssim

    rng = np.random.default_rng(0)
    a = rng.random((20, 30, 3))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    mean, smap = compute_ssim(a, b, full=True)
    assert smap.shape == (20, 30)
    assert np.isfinite(mean)
    mask = rng.random((20, 30)) > 0.5
    assert np.isfinite(smap[mask].mean())

"""Few-shot occupancy evaluation machinery test with a synthetic occ_fn."""

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.eval.occ import collect_centroids, eval_few_shot_occ
from emernerf_tpu.eval.points import PointQueryEngine
from emernerf_tpu.models.fields import RadianceField
from emernerf_tpu.ops.hashgrid import HashGridSpec

TINY3 = HashGridSpec(3, 4, 4, 32, 8, 2)
AABB = (-10.0, -10.0, -10.0, 10.0, 10.0, 10.0)
LABELS = {0: "a", 1: "b", 2: "c"}


def _occ_fn(i):
    rng = np.random.default_rng(i)
    n = 256
    coords = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    # deterministic labels from position so train/test frames agree
    labels = (coords[:, 0] > 0).astype(np.int64)
    times = np.full(n, 0.5, np.float32)
    return coords, labels, times


def test_occ_eval_machinery():
    model = RadianceField(
        static_spec=TINY3, aabb=AABB, geometry_feature_dim=8,
        base_mlp_layer_width=16, head_mlp_layer_width=16,
        semantic_feature_dim=8, enable_feature_head=True,
        feature_embedding_dim=16, feature_mlp_layer_width=16,
        enable_learnable_pe=False,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)), {}
    )["params"]
    engine = PointQueryEngine(model, chunk_size=512)

    centroids, labels = collect_centroids(
        [0, 1], _occ_fn, engine, params, n_classes=3, feature_dim=16,
        density_threshold=0.0,
    )
    assert centroids.shape == (3, 16)
    assert list(labels) == [0, 1, 2]

    metrics = eval_few_shot_occ(
        [2, 3], _occ_fn, engine, params, centroids, labels,
        label_mapping=LABELS, density_threshold=0.0,
    )
    assert 0.0 <= metrics["micro_accuracy"] <= 1.0
    assert set(metrics["per_class_accuracy"]) == {"a", "b", "c"}
    assert metrics["num_total_points"] == 512
    assert metrics["cover_rate"] > 0.99  # no density filtering


def test_run_occ_eval_from_disk(tmp_path):
    """End-to-end occ eval path: Occ3D npz files on disk -> load_occ3d_frame
    -> centroids -> few-shot metrics (the wiring used by Trainer.evaluate
    when eval.eval_occ=True)."""
    from types import SimpleNamespace

    from emernerf_tpu.eval.occ import load_occ3d_frame, run_occ_eval

    num_frames = 4
    occ_dir = tmp_path / "occ3d"
    occ_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(num_frames):
        # full 0.4 m grid is (200, 200, 16); the loader keeps the front half
        voxel_label = np.full((200, 200, 16), 23, np.uint8)  # 23 = free
        xs = rng.integers(100, 200, 300)
        ys = rng.integers(0, 200, 300)
        zs = rng.integers(0, 16, 300)
        voxel_label[xs, ys, zs] = rng.integers(0, 15, 300).astype(np.uint8)
        final_voxel_state = np.ones((200, 200, 16), np.uint8)
        np.savez(
            occ_dir / f"{i:03d}_04.npz",
            voxel_label=voxel_label,
            final_voxel_state=final_voxel_state,
        )

    coords, labels, times = load_occ3d_frame(
        str(tmp_path), np.eye(4), 0, num_frames, voxel_size=0.4
    )
    assert len(coords) > 0 and len(coords) == len(labels) == len(times)
    assert coords[:, 0].min() >= 0.0  # front half only
    assert (labels < 15).all()

    model = RadianceField(
        static_spec=TINY3, aabb=(0.0, -40.0, -1.0, 40.0, 40.0, 5.4),
        geometry_feature_dim=8, base_mlp_layer_width=16,
        head_mlp_layer_width=16, semantic_feature_dim=8,
        enable_feature_head=True, feature_embedding_dim=16,
        feature_mlp_layer_width=16, enable_learnable_pe=False,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 2, 3)), jnp.ones((2, 2, 3)), {}
    )["params"]
    dataset = SimpleNamespace(
        data_path=str(tmp_path),
        ego_to_worlds=np.stack([np.eye(4)] * num_frames),
        num_frames=num_frames,
        occ_voxel_size=0.4,
    )
    metrics = run_occ_eval(
        dataset, PointQueryEngine(model, chunk_size=2048), params,
        annotation_stride=2, density_threshold=0.0,
    )
    assert 0.0 <= metrics["micro_accuracy"] <= 1.0
    assert metrics["num_total_points"] > 0
    assert metrics["cover_rate"] > 0.99

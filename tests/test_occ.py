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

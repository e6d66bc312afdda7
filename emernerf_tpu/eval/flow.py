"""Lidar scene-flow evaluation (NSFP protocol).

Counterpart of the flow-eval block in the reference
(/root/reference/train_emernerf.py:234-288): per lidar frame, query the
emergent flow field at the lidar returns, zero flows on points the dynamic
field considers static (density < 0.2), and accumulate EPE3D /
acc3d-strict / acc3d-relax / angle / outlier metrics against the dataset's
flow annotations.  Ground points are optionally removed, following scene
-flow-estimation conventions.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from emernerf_tpu.eval.metrics import compute_scene_flow_metrics
from emernerf_tpu.eval.points import PointQueryEngine

logger = logging.getLogger("emernerf_tpu")


def evaluate_lidar_flow(
    engine: PointQueryEngine,
    params,
    dataset,
    remove_ground: bool = True,
    density_threshold: float = 0.2,
) -> Dict[str, float]:
    assert dataset.lidar is not None and "flows" in dataset.lidar, (
        "flow evaluation needs lidar flow annotations"
    )
    lidar = dataset.lidar
    all_metrics: Dict[str, list] = {
        "EPE3D": [], "acc3d_strict": [], "acc3d_relax": [],
        "angle_error": [], "outlier": [],
    }
    for frame in range(dataset.num_frames):
        mask = lidar["frame_idx"] == frame
        if "flow_classes" in lidar:
            mask = mask & (lidar["flow_classes"] != -1)
        if remove_ground and "ground" in lidar:
            mask = mask & (~lidar["ground"])
        if mask.sum() == 0:
            continue
        points = (
            lidar["origins"][mask]
            + lidar["viewdirs"][mask] * lidar["ranges"][mask][:, None]
        )
        times = dataset.lidar_normed_timestamps[mask]
        pred = engine.query_flow(params, points.astype(np.float32),
                                 times.astype(np.float32))
        pred_flow = pred["forward_flow"]
        pred_flow = np.where(
            pred["dynamic_density"][:, None] < density_threshold, 0.0, pred_flow
        )
        m = compute_scene_flow_metrics(pred_flow, lidar["flows"][mask])
        for k, v in m.items():
            all_metrics[k].append(v)
    return {k: float(np.mean(v)) if v else 0.0 for k, v in all_metrics.items()}

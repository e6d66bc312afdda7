"""End-to-end CLI test: the reference-compatible trainer entry point on the
synthetic dataset (the CPU-runnable PR1 slice from BASELINE.json)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_OVERRIDES = [
    "data.dataset=synthetic",
    "data.ray_batch_size=256",
    "data.synthetic.num_frames=3",
    "data.synthetic.image_height=20",
    "data.synthetic.image_width=30",
    "nerf.model.xyz_encoder.n_levels=4",
    "nerf.model.xyz_encoder.log2_hashmap_size=12",
    "nerf.model.xyz_encoder.max_resolution=128",
    "nerf.propnet.num_samples_per_prop=[16]",
    "nerf.propnet.xyz_encoder.n_levels_per_prop=[3]",
    "nerf.propnet.xyz_encoder.max_resolution_per_prop=[64]",
    "nerf.propnet.xyz_encoder.lgo2_hashmap_size_per_prop=[12]",
    "nerf.propnet.xyz_encoder.base_resolutions_per_prop=[8]",
    "nerf.sampling.num_samples=8",
    "nerf.model.neck.geometry_feature_dim=16",
    "nerf.model.neck.base_mlp_layer_width=16",
    "nerf.model.head.head_mlp_layer_width=16",
    "optim.num_iters=25",
    "optim.cache_rgb_freq=1000",
    "logging.print_freq=10",
    "logging.saveckpt_freq=0",
    "render.render_chunk_size=600",
    "render.render_full=false",
    "render.render_test=false",
    "render.low_res_downscale=2",
]


@pytest.mark.slow
def test_cli_train_eval(tmp_path):
    from train_emernerf import get_args_parser, main

    args = get_args_parser().parse_args(
        ["--output_root", str(tmp_path), "--project", "p", "--run_name", "r"]
        + TINY_OVERRIDES
    )
    main(args)

    run_dir = tmp_path / "p" / "r"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "metrics.json").exists()
    metric_files = list(run_dir.glob("metrics_all_*.json"))
    assert metric_files, "evaluation metrics json missing"
    results = json.loads(metric_files[0].read_text())
    assert "lowres/psnr" in results
    assert np.isfinite(results["lowres/psnr"])
    # checkpoint written at end of training
    assert list(run_dir.glob("checkpoint_*")), "final checkpoint missing"


def test_cli_dotlist_overrides(tmp_path):
    from train_emernerf import get_args_parser, setup

    args = get_args_parser().parse_args(
        [
            "--output_root", str(tmp_path), "--project", "p2",
            "--run_name", "r2", "optim.lr=0.123", "data.scene_idx=42",
        ]
    )
    cfg = setup(args)
    assert cfg.optim.lr == 0.123
    assert cfg.data.scene_idx == 42
    assert (tmp_path / "p2" / "r2" / "config.yaml").exists()


@pytest.mark.slow
def test_cli_train_data_parallel(tmp_path):
    """The parallel.num_devices config drives the whole CLI path on the
    8-device virtual mesh: sharded train steps + sharded eval chunks.

    Slow tier (44 s — the single heaviest default-tier test): the sharded
    step/eval math stays default-covered by tests/test_parallel.py and the
    driver's dryrun_multichip; this adds only the CLI plumbing on top."""
    from train_emernerf import get_args_parser, main

    args = get_args_parser().parse_args(
        ["--output_root", str(tmp_path), "--project", "p", "--run_name", "dp"]
        + TINY_OVERRIDES
        + [
            "parallel.num_devices=8",
            "render.render_chunk_size=608",  # divisible by 8
            "optim.num_iters=12",
        ]
    )
    main(args)
    run_dir = tmp_path / "p" / "dp"
    metric_files = list(run_dir.glob("metrics_all_*.json"))
    assert metric_files
    results = json.loads(metric_files[0].read_text())
    assert np.isfinite(results["lowres/psnr"])


def test_cli_rejects_indivisible_dp_batch(tmp_path):
    from train_emernerf import get_args_parser, main

    args = get_args_parser().parse_args(
        ["--output_root", str(tmp_path), "--project", "p", "--run_name", "bad"]
        + TINY_OVERRIDES
        + ["parallel.num_devices=8", "data.ray_batch_size=250"]
    )
    import pytest

    with pytest.raises(ValueError, match="must divide"):
        main(args)


def test_reference_semantics_profile_merges():
    """configs/reference_semantics.yaml turns off every default-on TPU
    divergence (VERDICT r2 #3: named reference/fast profiles)."""
    from emernerf_tpu.config import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(root, "configs", "default_config.yaml"),
        os.path.join(root, "configs", "reference_semantics.yaml"),
        [],
    )
    assert cfg.nerf.sampling.sample_topk == 0
    assert cfg.nerf.sampling.lidar_sample_topk == 0
    assert cfg.nerf.model.head.temporal_agg_topk == 0
    assert not cfg.nerf.model.fuse_flow_grid
    assert not cfg.nerf.model.perf.time_pair
    # defaults unchanged: pruning stays ON without the profile
    base = load_config(
        os.path.join(root, "configs", "default_config.yaml"), None, []
    )
    assert base.nerf.sampling.sample_topk == 32
    assert base.nerf.model.perf.get("time_pair", True)


def test_time_pair_knob_reaches_specs():
    """nerf.model.perf.time_pair=false must unpair BOTH 4D grids (dynamic
    and the hardcoded flow spec), in tiny mode too (flagship.py rebuild)."""
    from emernerf_tpu.flagship import build_flagship

    _, _, model, _, _ = build_flagship(
        tiny=True, overrides=["nerf.model.perf.time_pair=false"]
    )
    assert model.dynamic_spec is not None and not model.dynamic_spec.time_pair
    assert model.flow_spec is not None and not model.flow_spec.time_pair
    _, _, m2, _, _ = build_flagship(tiny=True)
    assert m2.dynamic_spec.time_pair and m2.flow_spec.time_pair


@pytest.mark.slow
def test_cli_auto_resume_continues_and_keeps_checkpointing(tmp_path):
    """--auto_resume picks up the newest checkpoint in the run dir and —
    unlike a hand-set resume_from (reference quirk: resumed runs never
    save, train_emernerf.py:864) — keeps periodic checkpointing enabled,
    so preempt/restart cycles persist progress."""
    from train_emernerf import get_args_parser, main

    base = (
        ["--output_root", str(tmp_path), "--project", "p", "--run_name", "ar"]
        + TINY_OVERRIDES
        + ["render.render_low_res=false"]
    )
    # first run: completes 12 iters, saves its final checkpoint
    main(get_args_parser().parse_args(base + ["optim.num_iters=12"]))
    run_dir = tmp_path / "p" / "ar"
    # inclusive loop (0..num_iters) + post-increment naming: final
    # checkpoint is num_iters+1, matching the flagship's checkpoint_20001
    first = sorted(run_dir.glob("checkpoint_*"))
    assert first and first[-1].name == "checkpoint_00013"

    # second run, SAME command + --auto_resume + longer schedule: resumes
    # at 13, periodic save at loop step 16 still fires despite
    # resume_from being set
    # flags must precede the positional dotlist (REMAINDER semantics)
    main(get_args_parser().parse_args(
        base[:6] + ["--auto_resume"] + base[6:]
        + ["optim.num_iters=20", "logging.saveckpt_freq=16"]
    ))
    names = {p.name for p in run_dir.glob("checkpoint_*")}
    assert "checkpoint_00017" in names, (
        "periodic checkpoint did not fire on the auto-resumed run: "
        f"{sorted(names)}"
    )
    assert "checkpoint_00021" in names

#!/usr/bin/env python
"""xprof composition probe for the flagship train step.

Traces a few steady-state steps with jax.profiler, converts the xplane
with xprof's raw_to_tool_data, and prints the top HLO ops / op categories
by self time — the round-4 methodology (PERF_NOTES "xprof-guided step
surgery") as a turnkey script instead of a notebook ritual.

Usage (chip):
    BENCH_OVERRIDES="nerf.model.grid_backend=mx" python perf/profile_step.py
Env:
    PROF_STEPS   traced steps (default 3)
    PROF_RG      "1" to trace the prop-grad variant (default no-rg)
    PROF_DIR     trace output dir (default /tmp/emernerf_prof)
    BENCH_OVERRIDES / BENCH_PROFILE   same semantics as bench.py

Writes perf/PROFILE_<tag>.json {op_categories: {...}, top_ops: [...]}
where tag = PROF_TAG or "default".
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

from emernerf_tpu.utils.cache import enable_compilation_cache


def build_step():
    from emernerf_tpu.data.scene import sample_lidar_batch, sample_pixel_batch
    from emernerf_tpu.flagship import build_flagship
    from emernerf_tpu.train.step import build_train_step, init_train_state

    raw = os.environ.get("BENCH_OVERRIDES", "")
    sep = ";" if ";" in raw else ","
    overrides = [s for s in raw.split(sep) if s]
    if os.environ.get("BENCH_PROFILE", "default") == "reference":
        overrides = [
            "nerf.sampling.sample_topk=0",
            "nerf.sampling.lidar_sample_topk=0",
            "nerf.model.head.temporal_agg_topk=0",
            *overrides,
        ]
    cfg, dataset, model, prop_models, step_cfg = build_flagship(
        tiny=os.environ.get("BENCH_PRESET") == "tiny", overrides=overrides
    )
    scene = dataset.scene_tensors()
    key = jax.random.PRNGKey(0)
    rb = cfg.data.ray_batch_size

    @jax.jit
    def make_batches(scene, key):
        k1, k2 = jax.random.split(key)
        return (
            sample_pixel_batch(scene, k1, rb, use_timestamps=True),
            sample_lidar_batch(scene, k2, rb),
        )

    pixel_batch, lidar_batch = make_batches(scene, key)
    state = init_train_state(model, prop_models, step_cfg, key, pixel_batch)
    step_fn = build_train_step(model, prop_models, step_cfg)
    return scene, make_batches, state, step_fn


def summarize(prof_dir: str):
    """Parse the newest xplane in prof_dir -> (categories, top_ops)."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no xplane.pb under {prof_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # gviz DataTable JSON: {"cols": [{"id": ...}], "rows": [{"c": [{"v":..}]}]}
    tbl = json.loads(data)
    idx = {c["id"]: i for i, c in enumerate(tbl["cols"])}
    i_cat = idx["category"]
    i_name = idx["hlo_op_name"]
    i_self = idx.get("total_self_time", idx.get("total_self_time_us"))
    i_src = idx.get("source_info")
    i_bound = idx.get("bound_by")
    cats, ops, srcs, bounds = {}, [], {}, {}
    for row in tbl.get("rows", []):
        c = row["c"]

        def v(i):
            return c[i]["v"] if (i is not None and c[i]) else None

        cat = v(i_cat) or "?"
        name = v(i_name) or "?"
        t = float(v(i_self) or 0.0)
        cats[cat] = cats.get(cat, 0.0) + t
        ops.append((name, cat, t))
        # source_info arrives as an HTML cell; strip to the path:line core
        src = v(i_src) or "?"
        if ">" in src:
            src = src.split(">", 1)[1].split("<", 1)[0] or "?"
        srcs[(cat, src)] = srcs.get((cat, src), 0.0) + t
        b = v(i_bound) or "?"
        bounds[(cat, b)] = bounds.get((cat, b), 0.0) + t
    ops.sort(key=lambda x: -x[2])
    top_srcs = [
        {"category": c, "source": s, "self_us": round(t, 1)}
        for (c, s), t in sorted(srcs.items(), key=lambda kv: -kv[1])[:20]
    ]
    bound_by = [
        {"category": c, "bound_by": b, "self_us": round(t, 1)}
        for (c, b), t in sorted(bounds.items(), key=lambda kv: -kv[1])[:12]
    ]
    return cats, ops[:25], top_srcs, bound_by


def main():
    enable_compilation_cache()
    prof_dir = os.environ.get("PROF_DIR", "/tmp/emernerf_prof")
    steps = int(os.environ.get("PROF_STEPS", "3"))
    rg = os.environ.get("PROF_RG", "0") == "1"
    tag = os.environ.get("PROF_TAG", "default")

    scene, make_batches, state, step_fn = build_step()
    key = jax.random.PRNGKey(1)

    # compile + warm OUTSIDE the trace
    pixel_batch, lidar_batch = make_batches(scene, key)
    t0 = time.time()
    state, m = step_fn(state, pixel_batch, lidar_batch, key,
                       pixel_rg=rg, lidar_rg=rg)
    float(m["psnr"])
    print(f"compile+first step {time.time() - t0:.1f}s", file=sys.stderr)

    jax.profiler.start_trace(prof_dir)
    t0 = time.time()
    for _ in range(steps):
        key, k_b, k_s = jax.random.split(key, 3)
        pixel_batch, lidar_batch = make_batches(scene, k_b)
        state, m = step_fn(state, pixel_batch, lidar_batch, k_s,
                           pixel_rg=rg, lidar_rg=rg)
    psnr = float(m["psnr"])  # sync
    wall = (time.time() - t0) / steps
    jax.profiler.stop_trace()
    print(f"traced {steps} steps, {wall*1e3:.1f} ms/step, psnr {psnr:.2f}",
          file=sys.stderr)

    cats, top, top_srcs, bound_by = summarize(prof_dir)
    total = sum(cats.values()) or 1.0
    out = {
        "tag": tag,
        "rg": rg,
        "wall_ms_per_step": round(wall * 1e3, 1),
        "traced_steps": steps,
        "op_categories_us": {
            k: round(v, 1)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "op_categories_pct": {
            k: round(100 * v / total, 1)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {"name": n, "category": c, "self_us": round(t, 1)}
            for n, c, t in top
        ],
        # (category, python source line) hot spots + engine attribution:
        # bound_by distinguishes the VMEM-write-serialized scatters from
        # HBM-bound gathers/reduces (the two distinct walls)
        "top_sources": top_srcs,
        "bound_by": bound_by,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROFILE_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("tag", "wall_ms_per_step", "op_categories_pct")}))


if __name__ == "__main__":
    main()
    os._exit(0)

"""Waymo scene-flow TFRecord downloader.

Counterpart of /root/reference/datasets/download_waymo.py: fetches scene
TFRecords from the gs://waymo_open_dataset_scene_flow bucket with gsutil, in
parallel, driven by the NOTR split files (data/waymo_splits/*.txt) or an
explicit scene-id list.  Requires gsutil credentials (registered Waymo Open
Dataset account); no-ops with a clear message otherwise.
"""

from __future__ import annotations

import argparse
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor

BUCKET = "gs://waymo_open_dataset_scene_flow/train"


def read_scene_list(path: str):
    """waymo_train_list.txt: one TFRecord basename per line, index = scene id."""
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def read_split_file(path: str):
    """NOTR split csv: 'scene_id,seg_name,start,end,type' per line."""
    ids = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ids.append(int(line.split(",")[0]))
    return ids


def download_one(scene_name: str, target_dir: str) -> bool:
    os.makedirs(target_dir, exist_ok=True)
    result = subprocess.run(
        ["gsutil", "cp", "-n", f"{BUCKET}/{scene_name}.tfrecord", target_dir],
        capture_output=True, text=True,
    )
    if result.returncode != 0:
        print(f"FAILED {scene_name}: {result.stderr.strip()[:200]}")
        return False
    return True


def main():
    p = argparse.ArgumentParser("Download Waymo scene-flow TFRecords")
    p.add_argument("--target_dir", default="data/waymo/raw")
    p.add_argument("--scene_ids", type=int, nargs="+", default=None)
    p.add_argument("--split_file", type=str, default=None,
                   help="NOTR split file (static32/dynamic32/diverse56)")
    p.add_argument("--scene_list_file", type=str,
                   default="data/waymo_train_list.txt")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    names = read_scene_list(args.scene_list_file)
    if args.split_file:
        ids = read_split_file(args.split_file)
    elif args.scene_ids is not None:
        ids = args.scene_ids
    else:
        raise SystemExit("Provide --scene_ids or --split_file")

    todo = [names[i] for i in ids]
    print(f"Downloading {len(todo)} scenes to {args.target_dir}")
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        results = list(ex.map(lambda n: download_one(n, args.target_dir), todo))
    print(f"Done: {sum(results)}/{len(todo)} succeeded")


if __name__ == "__main__":
    main()

"""Minimal, dependency-free reader for the nuScenes table layout.

The real ``nuscenes-devkit`` is only used by this repo to walk tokens when
building the meta cache (emernerf_tpu/data/nuscenes.py:148-162, mirroring
/root/reference/datasets/nuscenes.py:53-160).  This module reimplements the
tiny slice of ``nuscenes.nuscenes.NuScenes`` that walk touches, against the
*on-disk* dataset schema (``{dataroot}/{version}/{table}.json``):

* tables loaded: scene, sample, sample_data, calibrated_sensor, ego_pose,
  sensor;
* ``get(table, token)`` token lookup;
* the devkit's reverse index: raw ``sample`` records carry no ``data``
  field — the devkit fills ``sample["data"][channel] = sample_data.token``
  for key frames in ``__make_reverse_index__``; reproduced here, including
  the ``channel`` / ``sensor_modality`` attributes stamped onto
  sample_data records.

Because the fixture tests drive the SAME meta-building code through this
reader over a devkit-layout directory, a wrong field name in the token walk
(e.g. ``file_name`` vs ``filename``) fails the tests instead of passing
silently.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

TABLES = (
    "scene", "sample", "sample_data", "calibrated_sensor", "ego_pose",
    "sensor",
)


class NuScenesLite:
    """Drop-in for the devkit's ``NuScenes`` for token-walk purposes."""

    def __init__(self, version: str, dataroot: str, verbose: bool = False):
        self.version = version
        self.dataroot = dataroot
        table_dir = os.path.join(dataroot, version)
        if not os.path.isdir(table_dir):
            raise FileNotFoundError(
                f"nuScenes table directory not found: {table_dir}"
            )
        self._tables: Dict[str, List[dict]] = {}
        self._index: Dict[str, Dict[str, dict]] = {}
        for table in TABLES:
            with open(os.path.join(table_dir, f"{table}.json")) as f:
                records = json.load(f)
            self._tables[table] = records
            self._index[table] = {r["token"]: r for r in records}
        self.__make_reverse_index__()

    # devkit-compatible surface ---------------------------------------- #
    @property
    def scene(self) -> List[dict]:
        return self._tables["scene"]

    def get(self, table: str, token: str) -> dict:
        return self._index[table][token]

    # ------------------------------------------------------------------ #
    def __make_reverse_index__(self) -> None:
        """sample['data'][channel] -> key-frame sample_data token, plus
        channel/modality stamps, as the devkit does."""
        for sample in self._tables["sample"]:
            sample.setdefault("data", {})
        for sd in self._tables["sample_data"]:
            calib = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
            sensor = self.get("sensor", calib["sensor_token"])
            sd["channel"] = sensor["channel"]
            sd["sensor_modality"] = sensor["modality"]
            if sd["is_key_frame"]:
                sample = self.get("sample", sd["sample_token"])
                sample["data"][sd["channel"]] = sd["token"]

"""Chunked point queries against the radiance field (fixed-shape jit).

Used by flow eval, occupancy eval, and voxel visualization — the TPU
equivalent of the reference's ad-hoc 2^18-point chunks
(/root/reference/utils/visualization_tools.py:613)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emernerf_tpu.models.fields import RadianceField


class PointQueryEngine:
    """jit-compiled chunked access to query_flow / query_attributes."""

    def __init__(self, model: RadianceField, chunk_size: int = 65536):
        self.model = model
        self.chunk_size = chunk_size

        def _flow(params, positions, timestamps):
            return model.apply(
                {"params": params}, positions, timestamps,
                method=RadianceField.query_flow,
            )

        def _attrs(params, positions, timestamps):
            return model.apply(
                {"params": params}, positions, timestamps,
                method=RadianceField.query_attributes,
            )

        def _attrs_static(params, positions):
            return model.apply(
                {"params": params}, positions, None,
                method=RadianceField.query_attributes,
            )

        self._flow = jax.jit(_flow)
        self._attrs = jax.jit(_attrs)
        self._attrs_static = jax.jit(_attrs_static)

    def _run(self, fn, params, positions, timestamps) -> Dict[str, np.ndarray]:
        n = len(positions)
        chunk = self.chunk_size
        n_chunks = max((n + chunk - 1) // chunk, 1)
        pad = n_chunks * chunk - n
        pos = np.concatenate(
            [positions, np.repeat(positions[-1:], pad, 0)]
        ) if pad else positions
        if timestamps is not None and pad:
            timestamps = np.concatenate(
                [timestamps, np.repeat(timestamps[-1:], pad, 0)]
            )
        outs = []
        for i in range(n_chunks):
            sl = slice(i * chunk, (i + 1) * chunk)
            args = (params, jnp.asarray(pos[sl]))
            if timestamps is not None:
                args += (jnp.asarray(timestamps[sl]),)
            outs.append(jax.tree.map(np.asarray, fn(*args)))
        return {k: np.concatenate([o[k] for o in outs])[:n] for k in outs[0]}

    def query_flow(self, params, positions, timestamps):
        return self._run(self._flow, params, positions, timestamps)

    def query_attributes(self, params, positions, timestamps=None):
        fn = self._attrs if timestamps is not None else self._attrs_static
        return self._run(fn, params, positions, timestamps)

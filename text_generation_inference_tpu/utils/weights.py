"""Lazy safetensors checkpoint reader.

Counterpart of the reference's `Weights` loader (reference:
server/.../utils/weights.py:14-113): multi-file routing via the index file
(or by scanning shards), alias fallback for tied tensors, and slice-on-load.
Sharded loading for tensor parallelism happens at a different level here:
families build full host arrays and `parallel/` places them onto the mesh
with `jax.device_put` + NamedSharding, letting the runtime scatter only the
local shard bytes per device.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
from safetensors import safe_open


class Weights:
    def __init__(self, model_dir: str | os.PathLike, aliases: dict[str, list[str]] | None = None):
        self.model_dir = Path(model_dir)
        self.aliases = aliases or {}
        files = sorted(self.model_dir.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no .safetensors files under {self.model_dir}")
        self._routing: dict[str, Path] = {}
        index_file = self.model_dir / "model.safetensors.index.json"
        if index_file.exists():
            index = json.loads(index_file.read_text())
            for name, fname in index["weight_map"].items():
                self._routing[name] = self.model_dir / fname
        else:
            for f in files:
                with safe_open(f, framework="np") as sf:
                    for name in sf.keys():
                        self._routing[name] = f
        self._handles: dict[Path, object] = {}

    def _handle(self, path: Path):
        h = self._handles.get(path)
        if h is None:
            h = safe_open(path, framework="np")
            self._handles[path] = h
        return h

    def has(self, name: str) -> bool:
        return self._resolve(name) is not None

    def _resolve(self, name: str) -> str | None:
        if name in self._routing:
            return name
        for alias in self.aliases.get(name, []):
            if alias in self._routing:
                return alias
        return None

    def get(self, name: str) -> np.ndarray:
        resolved = self._resolve(name)
        if resolved is None:
            raise KeyError(f"tensor {name!r} not found in {self.model_dir}")
        return self._handle(self._routing[resolved]).get_tensor(resolved)

    def names(self) -> list[str]:
        return sorted(self._routing)

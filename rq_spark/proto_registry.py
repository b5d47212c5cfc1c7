"""Protobuf schema registry — the reference's `rq protobuf add` UX
(src/proto_index.rs:10-28, doc/protobuf.md:12-34) as a thin catalog:

* ``add(path, base=None)`` copies the .proto under <data>/proto/
  preserving the --base-relative layout;
* ``compile()`` shells out to protoc to produce a cached
  FileDescriptorSet, with mtime staleness checks
  (proto_index.rs:30-94); without protoc on PATH this raises
  MissingToolError — same failure mode as the reference;
* ``add_descriptor_set(path)`` side-loads a pre-compiled descriptor
  set, which is how protoc-less environments (like this one) register
  schemas;
* ``RQ_SYSTEM_DIR`` overrides the data dir (config.rs:15-36 parity).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

from .errors import MissingToolError, ProtobufSchemaError
from .formats.protobuf import parse_descriptor_set

_CACHE_NAME = "descriptor-cache.pb"


def default_dir() -> Path:
    root = os.environ.get("RQ_SYSTEM_DIR")
    if root:
        return Path(root)
    return Path(os.environ.get("XDG_DATA_HOME", Path.home() / ".local/share")) / "rq_spark"


class ProtoRegistry:
    def __init__(self, data_dir: str | os.PathLike | None = None):
        self.data_dir = Path(data_dir) if data_dir else default_dir()
        self.proto_dir = self.data_dir / "proto"
        self._types: dict | None = None

    # ---------------------------------------------------------- mutation

    def add(self, proto_path: str | os.PathLike, base: str | os.PathLike | None = None) -> Path:
        """Copy a .proto into the registry, keeping its path relative to
        --base (doc/protobuf.md:21-34)."""
        src = Path(proto_path).resolve()
        rel = src.relative_to(Path(base).resolve()) if base else Path(src.name)
        dst = self.proto_dir / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)
        self._types = None
        return dst

    def add_descriptor_set(self, path: str | os.PathLike) -> None:
        """Side-load a pre-compiled FileDescriptorSet (protoc -o ...)."""
        self.proto_dir.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(path, self.data_dir / _CACHE_NAME)
        self._types = None

    # ---------------------------------------------------------- compile

    def _cache_path(self) -> Path:
        return self.data_dir / _CACHE_NAME

    def _cache_stale(self) -> bool:
        cache = self._cache_path()
        if not cache.exists():
            return True
        cache_mtime = cache.stat().st_mtime
        return any(
            p.stat().st_mtime > cache_mtime for p in self.proto_dir.rglob("*.proto")
        )

    def compile(self) -> Path:
        """protoc -o cache.pb over all registered .proto files, with
        mtime staleness (proto_index.rs:41-94)."""
        protos = sorted(self.proto_dir.rglob("*.proto"))
        if protos and self._cache_stale():
            protoc = shutil.which("protoc")
            if protoc is None:
                raise MissingToolError(
                    "protoc not found on PATH; register a pre-compiled "
                    "descriptor set with add_descriptor_set() instead"
                )
            cache = self._cache_path()
            cache.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                [protoc, f"-I{self.proto_dir}", "-o", str(cache), *map(str, protos)],
                check=True,
            )
        return self._cache_path()

    # ---------------------------------------------------------- lookup

    def types(self) -> dict:
        if self._types is None:
            cache = self._cache_path()
            if self.proto_dir.exists() and any(self.proto_dir.rglob("*.proto")):
                cache = self.compile()
            if not cache.exists():
                raise ProtobufSchemaError(
                    "no schemas registered (use `protobuf add` or add_descriptor_set)"
                )
            self._types = parse_descriptor_set(cache.read_bytes())
        return self._types

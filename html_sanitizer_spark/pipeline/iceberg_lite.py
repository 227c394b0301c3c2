"""Iceberg-style table format over plain parquet (sandbox stand-in).

Production targets real Iceberg (`df.writeTo(...).append()` with catalog
snapshot isolation); this runtime ships no Iceberg jar, so we keep the
*semantics* that matter to the pipeline — atomic snapshot commits, append /
overwrite isolation, time travel, and manifest-listed data files — with a
self-owned metadata layout:

    table_dir/
      data/<uuid>-<n>.parquet           immutable data files
      metadata/
        v<N>.metadata.json              snapshot: schema, parent, data files
        version-hint.text               pointer to current N (atomic rename)

Commit protocol (single-writer, which is what the batch driver is):
1. write new data files under data/ (never overwriting existing ones),
2. write v<N+1>.metadata.json listing the snapshot's full file set,
3. atomically rename a temp version-hint over version-hint.text.
A reader always resolves version-hint -> metadata -> exact file list, so a
crash between any steps leaves the previous snapshot intact (orphan data
files are harmless and GC-able).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["IcebergLiteTable"]


class IcebergLiteTable:
    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")

    # --- metadata plumbing ---

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def _metadata(self, version: int) -> dict:
        with open(os.path.join(self.meta_dir, f"v{version}.metadata.json")) as fh:
            return json.load(fh)

    def snapshots(self) -> list[dict]:
        out = []
        v = self.current_version()
        while v > 0:
            m = self._metadata(v)
            out.append(m)
            v = m.get("parent") or 0
        return list(reversed(out))

    # --- write path ---

    def _write_data_files(self, df: DataFrame) -> list[str]:
        os.makedirs(self.data_dir, exist_ok=True)
        staging = tempfile.mkdtemp(prefix="icelite-")
        df.write.mode("overwrite").parquet(staging)
        files = []
        prefix = uuid.uuid4().hex[:12]
        n = 0
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            dest = f"{prefix}-{n}.parquet"
            shutil.move(os.path.join(staging, name),
                        os.path.join(self.data_dir, dest))
            files.append(dest)
            n += 1
        shutil.rmtree(staging, ignore_errors=True)
        return files

    def _commit(self, files: list[str], schema_json: str, operation: str,
                summary: dict | None = None) -> int:
        os.makedirs(self.meta_dir, exist_ok=True)
        parent = self.current_version()
        version = parent + 1
        meta = {
            "format": "iceberg-lite/1",
            "version": version,
            "parent": parent or None,
            "operation": operation,
            "schema": json.loads(schema_json),
            "data_files": files,
            "summary": summary or {},
        }
        meta_path = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        with open(meta_path, "w") as fh:
            json.dump(meta, fh, indent=1)
        fd, tmp = tempfile.mkstemp(dir=self.meta_dir, prefix=".hint")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._hint_path())  # the atomic commit point
        return version

    def append(self, df: DataFrame, summary: dict | None = None) -> int:
        new_files = self._write_data_files(df)
        prev = (
            self._metadata(self.current_version())["data_files"]
            if self.current_version()
            else []
        )
        return self._commit(prev + new_files, df.schema.json(), "append", summary)

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> int:
        new_files = self._write_data_files(df)
        return self._commit(new_files, df.schema.json(), "overwrite", summary)

    # --- read path ---

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v == 0:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        files = self._metadata(v)["data_files"]
        if not files:
            raise FileNotFoundError(f"snapshot v{v} is empty")
        return spark.read.parquet(
            *[os.path.join(self.data_dir, f) for f in files]
        )

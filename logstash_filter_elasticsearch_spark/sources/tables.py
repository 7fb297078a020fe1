"""Source resolution: the reference's index-name semantics over tables.

The plugin targets indices as a comma-list with wildcards, ``""``/
``_all`` meaning everything, and per-event ``%{[field]}`` interpolation
(elasticsearch.rb:26-28; dsl_executor.rb:31; spec
elasticsearch_dsl_spec.rb:83-98). Here an index is a registered table
(parquet dir / file; Iceberg table when a catalog is configured), and
resolution happens at plan time.

Scale note: a multi-table wildcard resolves to a ``unionByName`` of
scans — Catalyst pushes filters/pruning into EACH scan, which is the
honest analog of ES fanning a query out to matching indices. A
date-partitioned layout (``logs/date=.../``) should instead be ONE
table with partition pruning; this catalog supports both by letting a
registered name point at a partitioned root.
"""

from __future__ import annotations

import os
import re
from fnmatch import fnmatch

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, str] = {}

    def register(self, name: str, path: str) -> None:
        self._tables[name] = path

    def register_dir(self, root: str, suffix: str = ".parquet") -> None:
        """Register every <name>.parquet under a directory (the driver's
        sf dirs have exactly this layout)."""
        for f in sorted(os.listdir(root)):
            if f.endswith(suffix):
                self.register(f[: -len(suffix)], os.path.join(root, f))

    @property
    def names(self) -> list[str]:
        return sorted(self._tables)

    def resolve(self, index_spec: str) -> list[str]:
        """Comma-list + wildcard + _all/empty resolution (B1)."""
        names: list[str] = []
        for part in (p.strip() for p in index_spec.split(",")):
            if part in ("", "_all"):
                names.extend(self.names)
            elif "*" in part or "?" in part:
                hits = [n for n in self.names if fnmatch(n, part)]
                if not hits:
                    raise KeyError(f"no tables match {part!r}")
                names.extend(hits)
            else:
                if part not in self._tables:
                    raise KeyError(f"unknown table {part!r}")
                names.append(part)
        seen: dict[str, None] = {}
        for n in names:
            seen.setdefault(n)
        return list(seen)

    def read(self, index_spec: str) -> DataFrame:
        names = self.resolve(index_spec)
        dfs = [self.spark.read.parquet(self._tables[n]) for n in names]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def dataframes(self) -> dict[str, DataFrame]:
        """Registry for plans.esql.run_esql(tables=...)."""
        return {n: self.spark.read.parquet(p) for n, p in self._tables.items()}

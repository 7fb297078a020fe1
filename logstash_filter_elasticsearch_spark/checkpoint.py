"""Checkpoint manifest: idempotent, resumable multi-sink commits.

The reference retries failed requests client-side
(elasticsearch.rb:139-143, client.rb:49-50) and never loses events —
failures are tagged and the event continues (dsl_executor.rb:79-87).
At 100 TB batch scale the equivalent durability contract is an
idempotent commit protocol: a JSON manifest records, per committed
route sink, the input lineage (files + row counts), per-sink metrics,
and the engine/config fingerprint. A re-run with the same manifest
skips committed sinks; a killed run resumes exactly where it stopped.
Writes go to a staging directory and are published with an atomic
rename, so readers never observe partial sinks.

Writer model: ONE writer per out_dir at a time (the same assumption a
Hive table makes without a lock service) — flush() rewrites the whole
file, so two interleaved writers would clobber each other's route
entries. Retries/resumes are sequential re-runs, which is the
reference's own model (one pipeline instance owns its outputs).
Snapshot-mode GC is nonetheless defensive about a concurrent STARTER:
it re-reads the manifest from disk after listing, so a run that
began after this run loaded its copy is never mistaken for debris.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from logstash_filter_elasticsearch_spark.fsio import LocalFS


class Manifest:
    VERSION = 1

    def __init__(self, path: str, fs=None):
        self.path = path
        self.fs = fs or LocalFS()
        self.data = {"version": self.VERSION, "routes": {}, "runs": []}
        if self.fs.exists(path):
            self.data = json.loads(self.fs.read_text(path))
        elif self.fs.exists(path + ".prev"):
            # torn publish on a filesystem without overwrite-rename
            # (fsio.HadoopFS fallback parks the old manifest at .prev
            # before swapping the new one in): resume from the previous
            # manifest rather than forgetting every committed route
            self.data = json.loads(self.fs.read_text(path + ".prev"))

    @property
    def committed_routes(self) -> set[str]:
        return set(self.data["routes"])

    def route_entry(self, route: str) -> dict | None:
        return self.data["routes"].get(route)

    def begin_run(self, run_info: dict) -> str:
        run_id = uuid.uuid4().hex[:12]
        self.data["runs"].append({"run_id": run_id, "started_at": time.time(), **run_info})
        self.flush()  # run history must survive even no-op resume runs
        return run_id

    def finish_run(self, run_id: str) -> None:
        """Mark a run completed. Snapshot-mode GC uses the absence of
        ``finished_at`` to tell an in-flight concurrent run (protected
        until a grace period expires) from a completed one whose
        superseded dirs are reclaimable."""
        for entry in self.data["runs"]:
            if entry["run_id"] == run_id:
                entry["finished_at"] = time.time()
        self.flush()

    def commit_route(
        self,
        route: str,
        run_id: str,
        metrics: dict,
        lineage: dict,
        path: str | None = None,
    ) -> None:
        """``path`` is the route's sink location RELATIVE to the
        manifest's directory. In snapshot publish mode the manifest
        pointer IS the commit (data dirs are immutable, per-run); in
        rename mode it is recorded for uniform reader resolution."""
        self.data["routes"][route] = {
            "run_id": run_id,
            "committed_at": time.time(),
            "metrics": metrics,
            "lineage": lineage,
            **({"path": path} if path else {}),
        }
        self.flush()

    def flush(self) -> None:
        self.fs.write_text_atomic(
            self.path, json.dumps(self.data, indent=2, sort_keys=True)
        )


def publish_atomic(staging_dir: str, final_dir: str, fs=None) -> None:
    """Per-sink publish: stage fully, then one rename (atomic on POSIX/
    HDFS; copy+delete on object stores — see fsio module docstring)."""
    fs = fs or LocalFS()
    if fs.exists(final_dir):
        fs.delete(final_dir)
    fs.makedirs(os.path.dirname(final_dir))
    fs.rename(staging_dir, final_dir)

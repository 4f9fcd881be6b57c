"""Per-partition lineage manifest → checkpoint resume (SURVEY.md §2.1 S5, §4).

Layout per stage output directory::

    <out>/<stage>/part_id=<k>/*.parquet     # hive-partitioned data
    <out>/_manifest/<stage>/part-<k>.json   # one commit record per partition

A partition is COMPLETE iff its manifest record exists; records are written
AFTER the partition's data lands (write-then-commit), so a killed run leaves
missing/partial partitions uncommitted. Resume = the anti-join of the
partition universe against committed records (driver-side set difference —
the manifest is tiny, SURVEY.md §2.4 J4): stale uncommitted dirs are deleted,
only pending part_ids are recomputed, and the pipeline filters its INPUT by
part_id so the recompute is proportional to lost work. Exercised by
tests/test_resume.py.
"""

from __future__ import annotations

import json
import os
import shutil


class Manifest:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.dir, stage)

    def completed(self, stage: str) -> dict[int, dict]:
        d = self._stage_dir(stage)
        if not os.path.isdir(d):
            return {}
        out = {}
        for f in os.listdir(d):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    rec = json.load(fh)
                out[int(rec["partition_id"])] = rec
        return out

    def pending(self, stage: str, num_parts: int,
                input_fingerprint: str | None = None) -> list[int]:
        """Partitions to (re)compute. A committed record only counts as done
        if its recorded input_fingerprint matches the current run's (when
        one is provided) — rerunning against a DIFFERENT corpus must not
        silently return stale checkpointed results."""
        done = self.completed(stage)

        def ok(rec: dict) -> bool:
            return (input_fingerprint is None
                    or rec.get("input_fingerprint", "") == input_fingerprint)

        return [p for p in range(num_parts)
                if p not in done or not ok(done[p])]

    def has_records(self) -> bool:
        """True if ANY stage has committed partitions (used by the CLI to
        require an explicit --resume before reusing an output dir)."""
        if not os.path.isdir(self.dir):
            return False
        return any(f.startswith("part-") and f.endswith(".json")
                   for stage in os.listdir(self.dir)
                   if os.path.isdir(self._stage_dir(stage))
                   for f in os.listdir(self._stage_dir(stage)))

    def commit(self, stage: str, partition_id: int, *, n_rows: int,
               wall_s: float, output_path: str,
               input_fingerprint: str) -> None:
        d = self._stage_dir(stage)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".part-{partition_id}.tmp")
        rec = {"partition_id": partition_id, "stage": stage,
               "n_rows": n_rows, "wall_s": round(wall_s, 3),
               "output_path": output_path,
               "input_fingerprint": input_fingerprint}
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(d, f"part-{partition_id}.json"))

    def clean_uncommitted(self, stage: str, num_parts: int, data_dir: str,
                          input_fingerprint: str | None = None) -> list[int]:
        """Delete partition dirs whose commit record is missing (or whose
        recorded input fingerprint is stale); return the list of pending
        partition ids to recompute."""
        pend = self.pending(stage, num_parts, input_fingerprint)
        for p in pend:
            d = os.path.join(data_dir, f"part_id={p}")
            if os.path.isdir(d):
                shutil.rmtree(d)
            rec = os.path.join(self._stage_dir(stage), f"part-{p}.json")
            if os.path.exists(rec):       # stale-fingerprint record
                os.remove(rec)
        return pend

    def stage_stats(self, stage: str) -> dict:
        recs = self.completed(stage).values()
        rows = sum(r["n_rows"] for r in recs)
        wall = sum(r["wall_s"] for r in recs)
        return {"stage": stage, "partitions": len(list(recs)) or len(recs),
                "n_rows": rows, "wall_s": round(wall, 3),
                "rows_per_s": round(rows / wall, 1) if wall else None}


def corpus_fingerprint(path: str | None = None, *,
                       synth_n: int | None = None,
                       n_entities: int | None = None) -> str:
    """Cheap, deterministic fingerprint of the INPUT corpus: sha256 over the
    sorted (relative name, byte size) of its parquet files — no data scan,
    changes whenever the input file set changes. For synthetic corpora the
    generator is deterministic, so the page count (plus the entity-universe
    size, which changes the generated pages) IS the fingerprint."""
    import hashlib

    if synth_n is not None:
        return f"synth:{synth_n}" if n_entities is None \
            else f"synth:{synth_n}:ents{n_entities}"
    if path is None:
        return ""
    h = hashlib.sha256()
    if os.path.isfile(path):
        files = [(os.path.basename(path), os.path.getsize(path))]
    else:
        files = sorted(
            (os.path.relpath(os.path.join(root, f), path),
             os.path.getsize(os.path.join(root, f)))
            for root, _, fs in os.walk(path)
            for f in fs if f.endswith(".parquet"))
    for name, size in files:
        h.update(f"{name}:{size}\n".encode())
    return h.hexdigest()[:16]


def commit_partitions_from_dir(manifest: Manifest, stage: str, data_dir: str,
                               *, wall_s: float, input_fingerprint: str,
                               part_ids: list[int]) -> None:
    """Commit each written hive partition dir, reading row counts from
    parquet footers only (no data scan)."""
    import pyarrow.parquet as pq

    per_part_wall = wall_s / max(1, len(part_ids))
    for p in part_ids:
        d = os.path.join(data_dir, f"part_id={p}")
        n = 0
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    n += pq.read_metadata(os.path.join(d, f)).num_rows
        manifest.commit(stage, p, n_rows=n, wall_s=per_part_wall,
                        output_path=d, input_fingerprint=input_fingerprint)

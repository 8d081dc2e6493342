"""Manifest-committed segment store: the append-only state layout
shared by the continuous-ingest dedup sink (streaming/ingest.py) and
the incremental rollup sink (streaming/windows.py).

Why it exists: a foreachBatch sink that rewrites its whole state every
epoch does O(|state|) IO per batch — total IO over a stream's life is
quadratic, which at a 100 TB corpus with hourly batches means
rewriting 100 TB per hour. The fix is the commit discipline of every
transactional table format (and of the reference's own commitlog —
segments are appended, never rewritten, commitlog/commitlog.go:170-183;
hourly compaction merges old segments, commitlog/compactor.go:35-116):

- data lives in immutable parquet SEGMENT directories under
  ``base/segments/<name>/``;
- a tiny ``MANIFEST.json`` names the live segments per table and the
  last applied epoch; it becomes current via one atomic
  ``os.replace`` — per-epoch IO is the new segments plus one small
  file, never the standing state;
- segments dropped by a commit (compaction, keyed remap) are retained
  for ONE more commit before deletion, so a lazy DataFrame or
  concurrent reader that resolved paths from the previous manifest
  never hits FileNotFoundException mid-action;
- segment dirs present on disk but referenced by no manifest (a crash
  between segment write and manifest commit) are garbage-collected by
  the same delayed mechanism.

Two table shapes:

- LIST tables (``tables``): an ordered list of segments whose union is
  the table — the append-only corpus/index shape. Append = write one
  segment, commit the extended list.
- KEYED tables (``keyed``): a mapping ``key -> segment`` where each
  key's CURRENT rows live in the mapped segment (the segment may also
  hold stale rows for keys since remapped — readers filter by the
  materialized ``_seg_key`` column). This is the delta-merge shape:
  a batch touching k keys reads only the segments those k keys map to
  and writes one segment holding only those keys' merged rows.

Single-writer by contract (one streaming query owns a state dir —
Spark's own checkpoint guarantees this); readers are lock-free.
On object stores swap the whole layout for Delta/Iceberg — the sink
batch functions' outputs are the exact MERGE/APPEND sources either way.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"
SEGMENTS = "segments"
SEG_KEY = "_seg_key"


class SegmentStore:
    """Filesystem-backed manifest + segment layout (see module doc)."""

    def __init__(self, base: str):
        self.base = base.rstrip("/")

    # -- paths ----------------------------------------------------------
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.base, MANIFEST)

    def seg_path(self, name: str) -> str:
        return os.path.join(self.base, SEGMENTS, name)

    def fresh_name(self, stem: str) -> str:
        """A segment name not yet on disk (compaction retries must not
        overwrite a directory a lazy reader may be consuming)."""
        name, i = stem, 0
        while os.path.exists(self.seg_path(name)):
            i += 1
            name = f"{stem}.{i}"
        return name

    # -- manifest -------------------------------------------------------
    def manifest(self) -> Optional[dict]:
        try:
            with open(self.manifest_path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def last_epoch(self) -> Optional[int]:
        m = self.manifest()
        return None if m is None else int(m["epoch"])

    def epoch_already_applied(self, epoch_id: int) -> bool:
        """Replay check shared by every sink. Spark's foreachBatch
        re-delivers at most the LAST uncommitted epoch under the SAME
        id (same checkpoint ⇒ monotone ids), so ``epoch_id == last`` is
        a legitimate replay → skip. ``epoch_id < last`` can only mean
        the epoch counter restarted (checkpoint deleted or a different
        query pointed at this state) — silently skipping would discard
        GENUINELY NEW data until the counter caught up, so that raises
        instead: resume with the original checkpoint, or start a fresh
        state dir."""
        last = self.last_epoch()
        if last is None or epoch_id > last:
            return False
        if epoch_id == last:
            return True
        raise ValueError(
            f"epoch counter went backwards at {self.base}: got epoch "
            f"{epoch_id} but state is at {last}. This sink's state is "
            "bound to one streaming checkpoint; restarting with a fresh "
            "checkpoint against existing state would silently drop new "
            "batches. Keep the original checkpointLocation, or point "
            "the query at a new state dir."
        )

    # -- list tables ----------------------------------------------------
    def table_segments(self, table: str) -> List[str]:
        m = self.manifest() or {}
        return list(m.get("tables", {}).get(table, []))

    def table_paths(self, table: str) -> List[str]:
        return [self.seg_path(s) for s in self.table_segments(table)]

    def read(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        """Union of a list table's live segments (None when absent)."""
        paths = self.table_paths(table)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    # -- keyed tables ---------------------------------------------------
    def keyed_mapping(self, table: str) -> Dict[str, str]:
        m = self.manifest() or {}
        return dict(m.get("keyed", {}).get(table, {}))

    def keyed_paths(
        self, table: str, keys: Optional[Sequence[str]] = None
    ) -> Dict[str, List[str]]:
        """segment name -> the requested keys currently mapped to it.
        Segments holding none of the requested keys are absent — this
        IS the pruning: a reader touches only mapped segments."""
        mapping = self.keyed_mapping(table)
        wanted = set(mapping) if keys is None else set(keys) & set(mapping)
        by_seg: Dict[str, List[str]] = {}
        for k in sorted(wanted):
            by_seg.setdefault(mapping[k], []).append(k)
        return by_seg

    def read_keyed(
        self,
        spark: SparkSession,
        table: str,
        keys: Optional[Sequence[str]] = None,
    ) -> Optional[DataFrame]:
        """CURRENT rows for the requested keys (all keys when None).
        Each segment is filtered to the keys still mapped to it, so
        stale rows (keys remapped by a later delta-merge) never
        surface. Retains the ``_seg_key`` column."""
        by_seg = self.keyed_paths(table, keys)
        if not by_seg:
            return None
        parts = [
            spark.read.parquet(self.seg_path(seg)).filter(
                F.col(SEG_KEY).isin(ks)
            )
            for seg, ks in sorted(by_seg.items())
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- commit ---------------------------------------------------------
    def meta(self) -> dict:
        m = self.manifest() or {}
        return dict(m.get("meta", {}))

    def commit(
        self,
        epoch: int,
        tables: Optional[Dict[str, List[str]]] = None,
        keyed: Optional[Dict[str, Dict[str, str]]] = None,
        meta: Optional[dict] = None,
    ) -> None:
        """Make (tables, keyed) the current state at ``epoch`` via one
        atomic manifest replace. Complete-dict semantics: callers pass
        the full new segment lists/mappings (a table omitted from BOTH
        arguments keeps its previous entry).

        ``meta`` carries small reader-facing parameters (e.g. the CDC
        key columns) — merged over the previous meta, committed in the
        same atomic replace.

        GC discipline (one-commit delay): the PREVIOUS manifest's
        ``gc`` list is purged first — those dirs were already
        unreferenced by the manifest readers currently see, so deleting
        them is safe at any crash point. Then every on-disk segment the
        NEW manifest does not reference (just-dropped segments AND
        orphans from crashed commits) goes on the new ``gc`` list, to
        be purged by the commit after this one.
        """
        prev = self.manifest() or {}
        for name in prev.get("gc", []):
            shutil.rmtree(self.seg_path(name), ignore_errors=True)

        new_tables = dict(prev.get("tables", {}))
        if tables:
            new_tables.update(tables)
        new_keyed = dict(prev.get("keyed", {}))
        if keyed:
            new_keyed.update(keyed)
        new_meta = dict(prev.get("meta", {}))
        if meta:
            new_meta.update(meta)

        referenced = {s for segs in new_tables.values() for s in segs}
        referenced |= {s for m in new_keyed.values() for s in m.values()}
        seg_root = os.path.join(self.base, SEGMENTS)
        on_disk = set(os.listdir(seg_root)) if os.path.isdir(seg_root) else set()
        gc = sorted(on_disk - referenced)

        manifest = {
            "epoch": int(epoch),
            "tables": new_tables,
            "keyed": new_keyed,
            "meta": new_meta,
            "gc": gc,
        }
        os.makedirs(self.base, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    # -- delta merge ------------------------------------------------------
    def keyed_delta_merge(
        self,
        spark: SparkSession,
        table: str,
        partial: DataFrame,
        remerge,
        epoch_id: int,
        seg_key_format: str,
    ) -> bool:
        """The shared delta-merge step every keyed aggregation sink
        runs (hourly rollup, k-means partials): epoch-replay guard,
        seg_key-format guard, touched-key collect (metadata-sized by
        contract — the partial's SEG_KEY cardinality is the sink's
        delta width), keyed read of ONLY the touched segments,
        re-aggregate via the caller's ``remerge(prev, partial)``
        (which must recompute SEG_KEY on its output), one new segment,
        atomic remap+commit. Returns False when the epoch was already
        applied or the batch was empty.

        Keeping this in ONE place is the point: the replay semantics,
        the loud format-mismatch failure, and the write-then-remap
        commit discipline must never drift between sinks.
        """
        if self.epoch_already_applied(epoch_id):
            return False
        fmt = self.meta().get("seg_key")
        if fmt is not None and fmt != seg_key_format:
            raise ValueError(
                f"{table} state at {self.base!r} uses seg_key format "
                f"{fmt!r}; this engine writes {seg_key_format!r} — "
                "recompute the state (or compact with the writing "
                "version) before merging"
            )
        # consumed twice (key list + merge) — cut lineage once
        partial = partial.localCheckpoint(eager=True)
        touched = [r[0] for r in partial.select(SEG_KEY).distinct().collect()]
        if not touched:  # empty epoch: nothing to merge, replay vacuous
            return False
        prev = self.read_keyed(spark, table, keys=touched)
        merged = partial if prev is None else remerge(prev, partial)
        seg = f"{table}-e{epoch_id}"
        merged.write.mode("overwrite").parquet(self.seg_path(seg))
        mapping = self.keyed_mapping(table)
        for k in touched:
            mapping[k] = seg
        self.commit(
            epoch_id,
            keyed={table: mapping},
            meta={"seg_key": seg_key_format},
        )
        return True

    # -- compaction -----------------------------------------------------
    def compact_table(self, spark: SparkSession, table: str) -> Optional[str]:
        """Merge a LIST table's segments into one (returns the new
        segment name, or None when there is nothing to compact). The
        caller commits; until then nothing changed. Content-preserving
        by construction: the new segment is exactly the union read."""
        segs = self.table_segments(table)
        if len(segs) <= 1:
            return None
        df = self.read(spark, table)
        name = self.fresh_name(f"{table}-compact{self.last_epoch()}")
        df.write.mode("overwrite").parquet(self.seg_path(name))
        return name

    def compact_tables_commit(
        self,
        spark: SparkSession,
        tables: Sequence[str],
        folds: Optional[dict] = None,
    ) -> bool:
        """compact_table over each LIST table + ONE manifest commit —
        the whole compaction for sinks whose state is a tuple of list
        tables (ingest corpus/index/fps, ANN cells/ids, pHash
        fps/ph_ids, fuzzy vars/ids). The fold discipline
        (content-preserving union, atomic manifest swap, replaced
        segments retained until the NEXT commit for concurrent
        readers) lives HERE once, not per sink.

        ``folds`` maps a table name to a DataFrame->DataFrame
        pre-aggregation applied to the merged read before the fold is
        written (the merge-on-read sinks: span-df SUM, vocab-count
        SUM) — content-preserving because their readers aggregate the
        same way, so SUM of the fold == SUM of the parts. Tables
        without a fold concatenate as-is. Returns False when there is
        no committed state or every table is already compact."""
        manifest = self.manifest()
        if manifest is None:
            return False
        folds = folds or {}
        segs = {}
        for table in tables:
            fold = folds.get(table)
            if fold is None:
                name = self.compact_table(spark, table)
            elif len(self.table_segments(table)) <= 1:
                name = None
            else:
                df = fold(self.read(spark, table))
                name = self.fresh_name(
                    f"{table}-compact{self.last_epoch()}"
                )
                df.write.mode("overwrite").parquet(self.seg_path(name))
            if name is not None:
                segs[table] = [name]
        if not segs:
            return False
        self.commit(int(manifest["epoch"]), tables=segs)
        return True

    def compact_keyed(self, spark: SparkSession, table: str) -> Optional[str]:
        """Merge a KEYED table's current rows into one segment,
        dropping stale rows for good. Returns the new segment name (all
        keys remap to it), or None when already a single segment."""
        if len(set(self.keyed_mapping(table).values())) <= 1:
            return None
        df = self.read_keyed(spark, table)
        name = self.fresh_name(f"{table}-compact{self.last_epoch()}")
        df.write.mode("overwrite").parquet(self.seg_path(name))
        return name

    def compact_keyed_commit(self, spark: SparkSession, table: str) -> bool:
        """compact_keyed + remap every key + manifest commit in one
        step — the whole compaction for sinks whose state is a single
        keyed table (rollup hours, kmeans cells, HLL groups). Returns
        False when there is no committed state or it is already
        compact."""
        if self.manifest() is None:
            return False
        name = self.compact_keyed(spark, table)
        if name is None:
            return False
        mapping = {k: name for k in self.keyed_mapping(table)}
        self.commit(self.last_epoch(), keyed={table: mapping})
        return True

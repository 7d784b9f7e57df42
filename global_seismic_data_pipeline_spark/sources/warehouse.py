"""Parquet-backed warehouse: named managed tables without a metastore.

Provides the reference's table surface (ref: saveAsTable/spark.table
everywhere, e.g. 02_ingestion.py:214-217, 03_bronze_processing.py:20) on a
plain directory of parquet tables, including the two semantics vanilla
parquet lacks:

- **atomic overwrite**: Spark writes the new table to a staging directory,
  then a directory rename swaps it in. Readers never observe a half-written
  table, and a mid-write crash leaves the old table intact (the staging dir
  is garbage, cleaned on the next write).
- **MERGE upsert** (ref: 04_silver_transformation.py:194-202
  ``WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *``): expressed as
  ``target ANTI-JOIN updates  UNION ALL  updates`` + atomic overwrite —
  update-wins semantics, idempotent under re-runs.

Scale notes (100 TB): the anti-join shuffles both sides on the merge key —
same cost class as Delta's inner-join + file rewrite, but rewrites the whole
table instead of touched files only. At cluster scale you'd bound the rewrite
by partitioning the table (e.g. by event month) and merging only partitions
that contain update keys; ``merge`` takes ``prune_partition_col`` to do
exactly that when the table is directory-partitioned.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    """A directory of named columnar tables with atomic replacement.

    ``fmt`` selects the storage format: ``parquet`` (default) or ``orc`` —
    both splittable columnar formats with predicate-pushdown/column-pruning
    DataSource implementations built into Spark, so every warehouse
    semantic (append, atomic overwrite, partition-pruned MERGE, bucketed
    tables, views, stats) is format-independent. The DuckDB oracle reads
    parquet only, so driver queries stay on the default; the ORC path is
    pinned by the warehouse test suite running under both formats."""

    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "orc"):
            raise ValueError(f"unsupported format {fmt!r}; use 'parquet' or 'orc'")
        self.spark = spark
        self.root = root
        self.fmt = fmt
        self._ext = f".{fmt}"
        # set by merge() while a schema-evolving rewrite is in flight;
        # the lakehouse backends' commit paths consult it
        self._pending_merge_schema = False
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        for _root, _dirs, files in os.walk(p):
            if any(f.endswith(self._ext) for f in files):
                return True
        return False

    def drop(self, name: str) -> None:
        if os.path.isdir(self.path(name)):
            shutil.rmtree(self.path(name))
        # a dropped table's constraints must not haunt a later CREATE
        cfile = self._constraints_file(name)
        if os.path.isfile(cfile):
            os.remove(cfile)
        # ...nor its COPY INTO ledger (a re-created table reloads fresh)
        lfile = self._copy_ledger_file(name)
        if os.path.isfile(lfile):
            os.remove(lfile)

    # -- COPY INTO (idempotent file-level batch ingest) ---------------------
    def _copy_ledger_file(self, name: str) -> str:
        return os.path.join(self.root, f"_copy_into_{name}.json")

    def copy_into(
        self,
        name: str,
        src: str,
        *,
        fmt: str = "parquet",
        pattern: str | None = None,
        force: bool = False,
    ) -> dict[str, int]:
        """Idempotent FILE-LEVEL batch ingest (Delta's ``COPY INTO``):
        load the source directory's data files into the table, skipping
        every file a previous COPY INTO into this table already loaded —
        re-running after new files land ingests exactly the delta;
        re-running unchanged is a no-op. Per Delta's contract the
        skip keys on the file PATH (a modified already-loaded file stays
        skipped; ``force=True`` reloads everything). The ledger write is
        atomic (tmp + rename) and lands AFTER the data commit, so a
        crash in between re-loads at most the in-flight batch on the
        next run — never silently skips unloaded files.

        Scale shape: the file listing is driver-side metadata work; the
        load itself is ONE distributed columnar read of only the new
        files — a daily re-run over a 100 TB landing zone reads the new
        day, never the zone."""
        import glob as _glob
        import json as _json

        pat = pattern or f"*.{fmt}"
        paths = sorted(
            p
            for p in _glob.glob(
                os.path.join(src, "**", pat), recursive=True
            )
            if os.path.isfile(p)
        )
        if not paths and not os.path.isdir(src) and os.path.isfile(src):
            paths = [src]  # FROM '<one file>'
        ledger_path = self._copy_ledger_file(name)
        loaded: list[str] = []
        if os.path.isfile(ledger_path):
            with open(ledger_path) as fh:
                loaded = _json.load(fh)
        seen = set(loaded)
        todo = list(paths) if force else [p for p in paths if p not in seen]
        if not todo:
            return {"files_loaded": 0, "rows_loaded": 0}
        df = self.spark.read.format(fmt).load(todo)
        n = df.count()
        self.append(df, name)
        new_loaded = loaded + [p for p in todo if p not in seen]
        tmp = ledger_path + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(new_loaded, fh)
        os.replace(tmp, ledger_path)
        return {"files_loaded": len(todo), "rows_loaded": n}

    # -- read / write -----------------------------------------------------
    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    def append(
        self, df: DataFrame, name: str, partition_by: Sequence[str] = ()
    ) -> None:
        """Append-only write (bronze semantics, ref: 02_ingestion.py:214-217).

        STAGED: the batch is written to a private staging directory, then
        its data files rename into the table (same filesystem — atomic
        per-file moves; Spark part names embed a per-job UUID, so names
        never collide). A direct ``mode("append")`` into the table would
        share Hadoop's ``_temporary/0`` committer scratch across
        concurrent jobs — one writer's commit deletes the other's attempt
        directory mid-flight (observed as a chmod-on-vanished-path task
        failure). With staging, concurrent appends from one session or
        many are safe, existing files are never touched, and readers stay
        consistent per-file."""
        if not partition_by and self.exists(name):
            # same auto-fill as overwrite(): a flat append into a hive-
            # partitioned table writes files partition discovery DROPS —
            # silent row loss (caught by the façade INSERT test)
            partition_by = self.partition_columns(name)
        staging = os.path.join(self.root, f".staging-{name}-{uuid.uuid4().hex}")
        df, obs, cons = self._observe_constraints(df, name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(self.fmt).save(staging)
        self._abort_staging_if_violated(obs, cons, staging)
        final = self.path(name)
        os.makedirs(final, exist_ok=True)
        for root_, _dirs, files in os.walk(staging):
            rel = os.path.relpath(root_, staging)
            for f in files:
                if not f.endswith(self._ext):
                    continue  # _SUCCESS markers stay behind
                dst_dir = final if rel == "." else os.path.join(final, rel)
                os.makedirs(dst_dir, exist_ok=True)
                os.rename(os.path.join(root_, f), os.path.join(dst_dir, f))
        shutil.rmtree(staging)

    def overwrite(
        self, df: DataFrame, name: str, partition_by: Sequence[str] = ()
    ) -> None:
        """Atomic full replace (gold semantics, ref: 05_gold_aggregation.py:79).

        The plan is fully executed into a staging dir before the swap, so
        ``df`` may be derived from the current contents of ``name``.

        An existing table's hive partition layout is preserved by default
        (flattening it would corrupt later partition-pruned merges); pass
        ``partition_by`` explicitly to change the layout.
        """
        if not partition_by and self.exists(name):
            partition_by = self.partition_columns(name)
        final = self.path(name)
        staging = os.path.join(self.root, f".staging-{name}-{uuid.uuid4().hex}")
        trash = os.path.join(self.root, f".trash-{name}-{uuid.uuid4().hex}")
        df, obs, cons = self._observe_constraints(df, name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(self.fmt).save(staging)
        self._abort_staging_if_violated(obs, cons, staging)
        if os.path.isdir(final):
            os.rename(final, trash)
        os.rename(staging, final)
        if os.path.isdir(trash):
            shutil.rmtree(trash)

    # -- MERGE ------------------------------------------------------------
    def overwrite_dynamic(self, df: DataFrame, name: str) -> dict[str, int]:
        """Dynamic partition overwrite (Spark's
        ``partitionOverwriteMode=dynamic`` / Iceberg's
        ``overwritePartitions``): replace exactly the partitions PRESENT
        IN THE BATCH; every other partition survives untouched —
        reprocessing one day of a 100 TB table swaps one day's
        directories. Unpartitioned tables degrade to the plain atomic
        overwrite. The touched set is the staged write's own directory
        layout (no hive-escape reimplementation), each partition dir
        swaps whole; a crash between swaps leaves a replaced prefix and
        re-running the same batch is idempotent — the same contract as
        the partition-pruned MERGE."""
        pcols = (
            self.partition_columns(name) if self.exists(name) else []
        )
        if not pcols:
            self.overwrite(df, name)
            return {"partitions_replaced": 0}
        df, obs, cons = self._observe_constraints(df, name)
        staging = os.path.join(
            self.root, f".staging-{name}-{uuid.uuid4().hex}"
        )
        df.write.mode("overwrite").partitionBy(*pcols).format(
            self.fmt
        ).save(staging)
        self._abort_staging_if_violated(obs, cons, staging)
        final = self.path(name)
        leaves = [
            root_
            for root_, _dirs, files in os.walk(staging)
            if any(f.endswith(self._ext) for f in files)
        ]
        # rename-to-trash, never rmtree-then-rename: a crash mid-swap
        # must leave every partition's data in EITHER the table or the
        # trash dir — recoverable, not deleted (same discipline as
        # overwrite()'s whole-table swap)
        trash = staging + ".trash"
        for i, root_ in enumerate(leaves):
            rel = os.path.relpath(root_, staging)
            dst = os.path.join(final, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.isdir(dst):
                tr = os.path.join(trash, str(i))
                os.makedirs(trash, exist_ok=True)
                os.rename(dst, tr)
            os.rename(root_, dst)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        return {"partitions_replaced": len(leaves)}

    def show_partitions(self, name: str) -> DataFrame:
        """Partition inventory (Spark's ``SHOW PARTITIONS``), METADATA
        ONLY — the hive directory names here, the log's partitionValues
        on the Delta backend, the manifests on Iceberg; no data file
        opens at any size. One row per partition: the spec string
        (``a=1/b=x``) plus its data-file count. Unpartitioned tables
        return zero rows."""
        pcols = self.partition_columns(name)
        if not pcols:
            return self.spark.createDataFrame(
                [], "partition string, num_files long"
            )
        counts: dict[str, int] = {}
        base = self.path(name)
        for root_, _dirs, files in os.walk(base):
            n = sum(1 for f in files if f.endswith(self._ext))
            if not n:
                continue
            rel = os.path.relpath(root_, base)
            counts[rel] = counts.get(rel, 0) + n
        from .. import session as _session

        return _session.tiny_df(
            self.spark,
            sorted(counts.items()),
            "partition string, num_files long",
        )

    def _merge_read_target(self, name: str) -> DataFrame:
        """The target frame MERGE rewrites against — a hook so a backend
        can attach carry-through columns (the Delta backend reads row
        ids here when rowTracking is enabled)."""
        return self.read(name)

    # True on backends whose metadata separates schema from files, so a
    # PRUNED (partial) rewrite may carry a widened schema while untouched
    # files keep the old one and read the new columns as NULL. The plain
    # backend would leave mixed-schema parquet behind a schema-inferring
    # reader — refuse there.
    _evolves_partial_rewrites = False

    def merge(
        self,
        updates: DataFrame,
        name: str,
        keys: Sequence[str],
        *,
        prune_partition_col: str | None = None,
        merge_schema: bool = False,
    ) -> None:
        """Upsert: matched target rows are replaced by update rows, unmatched
        update rows are inserted (ref MERGE, 04_silver_transformation.py:196-202).

        ``updates`` must be key-unique (the silver flow dedups upstream).
        First call creates the table (ref: 04_silver_transformation.py:204-205).

        With ``prune_partition_col`` (a column of both sides; the table is
        stored directory-partitioned by it) only the partitions containing
        update rows are read, merged, and swapped — at 100 TB this bounds
        the rewrite to the touched slice (e.g. event month) instead of the
        whole table, the same file-pruning idea as Delta's MERGE. Each
        partition swap is atomic; a crash between swaps leaves a prefix
        updated, and re-running the same merge is a no-op for them
        (idempotent by keys).

        A source carrying columns the table lacks REFUSES by default (the
        alternative — ``.select(*target.columns)`` — would silently drop
        them). ``merge_schema=True`` evolves instead (Delta
        ``withSchemaEvolution``): the new columns enter the table schema
        in the same commit, surviving target rows backfill NULL.
        """
        pcol = prune_partition_col
        if not self.exists(name):
            self.overwrite(updates, name, partition_by=[pcol] if pcol else ())
            return
        target = self._merge_read_target(name)
        # case-INSENSITIVE drift detection: Spark resolves column
        # references case-insensitively, so 'Depth_KM' vs table
        # 'depth_km' is the same column — treating it as new would
        # refuse falsely (or, evolving, mint a case-duplicate field
        # that makes every later read ambiguous)
        tset = {c.lower() for c in target.columns}
        new_cols = [c for c in updates.columns if c.lower() not in tset]
        if new_cols and not merge_schema:
            raise ValueError(
                f"MERGE source carries columns {new_cols} the table "
                f"{name!r} lacks — pass merge_schema=True to evolve "
                "(new columns append, existing rows read NULL); refusing "
                "to silently drop them"
            )
        if new_cols and pcol is not None and not self._evolves_partial_rewrites:
            raise ValueError(
                f"pruned MERGE with schema evolution ({new_cols}) on the "
                "plain backend would leave mixed-schema parquet files — "
                "use the delta/iceberg backend or merge without "
                "prune_partition_col"
            )
        for c in new_cols:
            target = target.withColumn(
                c, F.lit(None).cast(updates.schema[c].dataType)
            )
        self._pending_merge_schema = bool(new_cols)
        try:
            if pcol is None:
                kept = target.join(
                    updates.select(*keys), on=list(keys), how="left_anti"
                )
                merged = kept.unionByName(updates.select(*target.columns))
                self.overwrite(merged, name)
                return

            # compare partition values in string form: hive-style directory
            # reads type-infer the partition column (e.g. "2025" → int), and a
            # typed isin against differently-typed literals silently mismatches.
            # NULL partition values map to hive's default-partition sentinel so
            # isin / movers logic is null-safe (plain isin never matches NULL).
            null_dir = "__HIVE_DEFAULT_PARTITION__"
            pstr = F.coalesce(F.col(pcol).cast("string"), F.lit(null_dir))
            touched = [r[0] for r in updates.select(pstr).distinct().collect()]
            # a key may have MOVED partitions (e.g. a revised event time crosses
            # a year boundary): find update keys living in untouched partitions
            # via a column-pruned scan of (pcol, keys) only — cheap on parquet —
            # and pull those partitions into the rewrite so the old copy dies
            movers = (
                target.filter(~pstr.isin(touched))
                .select(pstr.alias("__p"), *keys)
                .join(updates.select(*keys), on=list(keys), how="inner")
                .select("__p")
                .distinct()
                .collect()
            )
            touched = touched + [r[0] for r in movers]
            pruned = target.filter(pstr.isin(touched))
            kept = pruned.join(
                updates.select(*keys), on=list(keys), how="left_anti"
            )
            merged = kept.unionByName(updates.select(*target.columns))
            self._rewrite_partitions(name, pcol, merged, touched)
        finally:
            self._pending_merge_schema = False

    def _rewrite_partitions(
        self, name: str, pcol: str, merged: DataFrame, touched: Sequence
    ) -> None:
        """Replace exactly the ``touched`` partitions (string-form values
        of ``pcol``) of ``name`` with ``merged``'s rows: stage the write,
        atomically swap each staged directory in, and remove touched
        directories that staged EMPTY (all their rows gone). Untouched
        partition directories — and their files — are never opened or
        replaced. The partition-bounded rewrite primitive behind pruned
        MERGE / UPDATE / DELETE."""
        staging = os.path.join(self.root, f".staging-{name}-{uuid.uuid4().hex}")
        merged, obs, cons = self._observe_constraints(merged, name)
        merged.write.mode("overwrite").partitionBy(pcol).format(self.fmt).save(staging)
        self._abort_staging_if_violated(obs, cons, staging)
        final = self.path(name)
        swapped = set()
        for d in os.listdir(staging):
            if not d.startswith(f"{pcol}="):
                continue
            trash = os.path.join(self.root, f".trash-{name}-{uuid.uuid4().hex}")
            dst = os.path.join(final, d)
            if os.path.isdir(dst):
                os.rename(dst, trash)
            os.rename(os.path.join(staging, d), dst)
            swapped.add(d)
            if os.path.isdir(trash):
                shutil.rmtree(trash)
        shutil.rmtree(staging)
        # a touched partition with NO staged dir ended up empty (its only
        # rows moved elsewhere or were all deleted) — its directory goes too
        from urllib.parse import unquote

        touched_set = {str(v) for v in touched}
        for d in os.listdir(final):
            if not d.startswith(f"{pcol}=") or d in swapped:
                continue
            if unquote(d.split("=", 1)[1]) in touched_set:
                shutil.rmtree(os.path.join(final, d))

    # -- persistent CHECK constraints -------------------------------------
    #
    # Delta's ALTER TABLE … ADD CONSTRAINT … CHECK, persisted beside the
    # data (one JSON per table under .constraints/) and enforced on EVERY
    # staged write path (append / overwrite / partition rewrite) with
    # ZERO extra passes: the violation counts ride the staging write as
    # an Observation, and a violated batch aborts BEFORE the publish
    # step — the table never sees a row that fails a constraint.

    def _constraints_file(self, name: str) -> str:
        return os.path.join(self.root, ".constraints", f"{name}.json")

    def _sidecar_constraints(self, name: str) -> dict[str, str]:
        """The constraints stored in THIS warehouse's sidecar file only —
        mutation paths operate on this, because ``constraints()`` may be
        overridden to merge in externally-declared sets (the Delta
        backend merges the log's delta.constraints.*)."""
        p = self._constraints_file(name)
        if not os.path.isfile(p):
            return {}
        with open(p) as fh:
            return json.load(fh)

    def constraints(self, name: str) -> dict[str, str]:
        """The table's persistent CHECK constraints, {name: boolean SQL}."""
        return self._sidecar_constraints(name)

    def add_constraint(self, name: str, cname: str, expr: str) -> None:
        """Persist a CHECK constraint (Delta ALTER TABLE ADD CONSTRAINT):
        existing rows must already satisfy it (validated in one aggregate
        pass, like Delta), and every later write through this warehouse
        enforces it at the staging boundary."""
        if cname in self.constraints(name):
            raise ValueError(f"{name}: constraint {cname!r} already exists")
        cons = self._sidecar_constraints(name)
        if self.exists(name):
            enforce_constraints(self.read(name), {cname: expr})
        cons[cname] = expr
        os.makedirs(os.path.dirname(self._constraints_file(name)), exist_ok=True)
        tmp = self._constraints_file(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cons, fh)
        os.replace(tmp, self._constraints_file(name))

    def drop_constraint(self, name: str, cname: str) -> bool:
        cons = self._sidecar_constraints(name)
        if cname not in cons:
            return False
        del cons[cname]
        if cons:
            tmp = self._constraints_file(name) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(cons, fh)
            os.replace(tmp, self._constraints_file(name))
        else:
            os.remove(self._constraints_file(name))
        return True

    # ------------------------------------------------------------------
    # column evolution (ALTER TABLE ADD/RENAME/DROP COLUMN)
    #
    # The plain parquet backend has no table metadata separating logical
    # from physical column names — every file IS the schema. Any column
    # change therefore means rewriting all data, which a metadata-shaped
    # verb must never do silently; the lakehouse backends (Delta column
    # mapping / Iceberg field ids) override these with metadata-only
    # commits.

    def _ddl_type(self, type_str: str):
        """Parse a DDL type string (``bigint``, ``decimal(12,2)``,
        ``array<string>``) into a Spark DataType via the engine's own
        parser — the single source of type-name truth. Refuses a string
        that parses as MORE than one field ("int, b string") — taking
        field[0] would silently drop the rest."""
        from pyspark.sql.types import StructType as _St

        st = _St.fromDDL(f"__c {type_str}")
        if len(st.fields) != 1:
            raise ValueError(
                f"expected ONE column type, got {type_str!r} (parses as "
                f"{len(st.fields)} fields)"
            )
        return st.fields[0].dataType

    def add_column(self, name: str, column: str, type_str: str) -> None:
        raise ValueError(
            f"ADD COLUMN on {name!r}: the plain parquet backend stores "
            "no table schema — adding a column would require rewriting "
            "every file; use the delta/iceberg backend"
        )

    def add_columns(
        self, name: str, entries: Sequence[tuple[str, str]]
    ) -> None:
        raise ValueError(
            f"ADD COLUMNS on {name!r}: the plain parquet backend stores "
            "no table schema — adding columns would require rewriting "
            "every file; use the delta/iceberg backend"
        )

    def rename_column(self, name: str, old: str, new: str) -> None:
        raise ValueError(
            f"RENAME COLUMN on {name!r}: files are keyed by column name "
            "on the plain backend — a rename would require rewriting "
            "every file; use the delta/iceberg backend"
        )

    def drop_column(self, name: str, column: str) -> None:
        raise ValueError(
            f"DROP COLUMN on {name!r}: the plain backend cannot drop a "
            "column without rewriting every file (and a later same-name "
            "re-add would resurrect old values); use the delta/iceberg "
            "backend"
        )

    def widen_column(self, name: str, column: str, type_str: str) -> None:
        raise ValueError(
            f"ALTER COLUMN TYPE on {name!r}: the plain parquet backend "
            "stores no table schema to widen against — use the "
            "delta/iceberg backend"
        )

    def enable_column_mapping(self, name: str) -> int:
        raise ValueError(
            f"column mapping on {name!r} is a delta-backend feature "
            "(Iceberg renames are metadata-only already; plain parquet "
            "has no table metadata to map through)"
        )

    def set_table_properties(self, name: str, props: dict[str, str]) -> None:
        raise ValueError(
            f"SET TBLPROPERTIES on {name!r}: the plain parquet backend "
            "has no table metadata store; use the delta/iceberg backend"
        )

    def _observe_constraints(self, df: DataFrame, name: str):
        """(observed df, observation, constraints) — or (df, None, None)
        when the table has no constraints (the common case costs one
        os.path check, no Spark work)."""
        cons = self.constraints(name)
        if not cons:
            return df, None, None
        from pyspark.sql import Observation

        obs = Observation()
        observed = df.observe(
            obs,
            *[
                F.sum(
                    (~F.coalesce(F.expr(expr), F.lit(True))).cast("long")
                ).alias(cname)
                for cname, expr in cons.items()
            ],
        )
        return observed, obs, cons

    def _abort_staging_if_violated(self, obs, cons, staging: str) -> None:
        if obs is None:
            return
        row = obs.get
        bad = {n: int(row[n]) for n in cons if row[n]}
        if bad:
            shutil.rmtree(staging, ignore_errors=True)
            raise ConstraintViolation(bad)

    # -- bucketing --------------------------------------------------------
    def save_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: Sequence[str],
        *,
        num_buckets: int = 8,
        sort_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """Write ``name`` hash-bucketed on ``bucket_cols`` (catalog-backed;
        files live under the warehouse root as an external table).

        Two tables bucketed on the same keys with the same bucket count
        join WITHOUT a shuffle — Spark reads matching buckets pairwise
        (SortMergeJoin with no Exchange; ``sort_cols`` also drops the
        per-task Sort). This is the co-located-join path for repeated big
        joins at 100 TB: pay one shuffle at write time, none per query.
        Unlike the plain tables, bucketed tables go through
        ``saveAsTable`` (bucket metadata needs the session catalog).

        The batch is repartitioned on the bucket columns first:
        ``repartition(num_buckets, cols)`` uses the SAME HashPartitioning
        expression that assigns bucket ids, so every write task holds
        exactly one bucket and the table lands as ONE file per bucket.
        Without it each input partition emits a file per bucket it
        touches — measured 512 files for a 16-bucket table written from
        32 scan partitions, and every probe pays the per-file open cost
        (guide: small files hurt twice). num_buckets is the scale knob:
        size it to the cluster so the one-shuffle write is parallel
        enough AND files land in the 128 MB–1 GB band.
        """
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self.drop(name)
        writer = (
            df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
            .write.mode("overwrite")
            .format(self.fmt)
            .option("path", self.path(name))
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(name)
        return self.spark.table(name)

    def append_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: Sequence[str],
        *,
        num_buckets: int = 8,
        sort_cols: Sequence[str] | None = None,
    ) -> DataFrame:
        """Append to a table created by :meth:`save_bucketed` with the SAME
        bucket spec. Each append writes its own bucketed file set (one more
        file per bucket — compact periodically via maintenance), and the
        table keeps its shuffle-free join property: this is the
        incremental-index write path (a daily batch adds its signatures
        without rewriting the corpus index). Same bucket-aligned
        repartition as :meth:`save_bucketed`, so each append adds exactly
        one file per bucket instead of one per (task × bucket)."""
        writer = (
            df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
            .write.mode("append")
            .format(self.fmt)
            .option("path", self.path(name))
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(name)
        return self.spark.table(name)

    # -- SQL surface ------------------------------------------------------
    def register_views(self, names: Sequence[str] | None = None) -> list[str]:
        """Register every table as a temp view so spark.sql sees the same
        names the reference's SQL uses (SURVEY.md §3 E3)."""
        if names is None:
            names = [
                d
                for d in sorted(os.listdir(self.root))
                if not d.startswith(".") and self.exists(d)
            ]
        for n in names:
            self.read(n).createOrReplaceTempView(n)
        return list(names)

    def table_stats(self, name: str) -> dict[str, int]:
        """File count + total bytes (ref: DESCRIBE DETAIL,
        TABLE OPTIMIZATION.py:24-26) from the filesystem directly
        (recursive — partitioned tables keep files under key=value dirs)."""
        files = []
        for root_, _dirs, fnames in os.walk(self.path(name)):
            files += [os.path.join(root_, f) for f in fnames if f.endswith(self._ext)]
        return {
            "num_files": len(files),
            "size_bytes": sum(os.path.getsize(f) for f in files),
        }

    def partition_columns(self, name: str) -> list[str]:
        """Directory-partition columns of ``name`` (outermost first), from
        the key=value directory layout; [] for flat tables."""
        cols: list[str] = []
        p = self.path(name)
        while True:
            sub = [
                d for d in os.listdir(p)
                if "=" in d and os.path.isdir(os.path.join(p, d))
            ]
            if not sub:
                return cols
            cols.append(sub[0].split("=", 1)[0])
            p = os.path.join(p, sub[0])


class ConstraintViolation(ValueError):
    """Raised by :func:`enforce_constraints`; carries per-constraint
    violation counts in ``violations``."""

    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(
            "CHECK constraint violation: "
            + ", ".join(f"{k}={v} rows" for k, v in violations.items())
        )


def enforce_constraints(df: DataFrame, constraints: dict[str, str]) -> DataFrame:
    """Delta CHECK-constraint analogue at the write boundary: evaluate
    every named boolean SQL expression over ``df`` in ONE aggregate pass
    and raise :class:`ConstraintViolation` (with per-constraint counts)
    if any row makes any expression strictly FALSE — SQL CHECK
    semantics: NULL passes, only FALSE violates. Returns ``df`` for
    fluent chaining::

        wh.append(enforce_constraints(df, {"mag_range": "mag BETWEEN 0 AND 10"}), "t")

    One job, map-side-combined counts — the validation never rescans per
    constraint. Validation-as-filter (quarantine instead of abort) stays
    in ``functions/cleaning.py``; this is the ABORT path a warehouse
    table contract wants."""
    if not constraints:
        raise ValueError("no constraints given")
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(expr), F.lit(True))).cast("long")
        ).alias(name)
        for name, expr in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {n: int(row[n]) for n in constraints if row[n]}
    if bad:
        raise ConstraintViolation(bad)
    return df

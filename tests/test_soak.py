"""Sustained-run soak test: the full medallion loop (append → dedup →
silver MERGE → gold → maintenance → incremental near-dup store) driven
for ten incremental batches, asserting the cross-batch invariants the
per-feature tests cannot see — watermark monotonicity, file-count
boundedness under compaction, incremental (not re-scanning) index
refreshes, and stable plans/schemas. The closest local[32] can get to a
week of daily 100 TB runs.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from global_seismic_data_pipeline_spark.operators import skipping
from global_seismic_data_pipeline_spark.pipeline import bronze as bz
from global_seismic_data_pipeline_spark.pipeline import gold, maintenance, silver
from global_seismic_data_pipeline_spark.sources.geojson import (
    feature_rows,
    rows_to_bronze,
)
from global_seismic_data_pipeline_spark.sources.warehouse import Warehouse
from global_seismic_data_pipeline_spark.state import WatermarkStore

CLOCK = datetime(2025, 6, 1, 12, 0, 0)
ROUNDS = 10
NEW_PER_ROUND = 12
UPD_PER_ROUND = 3  # even rounds revise events of the previous round


def _ms(dt: datetime) -> int:
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)


def _feature(fid: str, t: datetime, mag: float):
    return {
        "type": "Feature",
        "id": fid,
        "properties": {
            "time": _ms(t), "mag": mag, "magType": "mb",
            "place": f"near {fid}", "type": "earthquake",
            "status": "reviewed", "net": "us",
        },
        "geometry": {
            "type": "Point",
            "coordinates": [139.0 + (hash(fid) % 7) * 0.5, 35.0, 30.0],
        },
    }


def _batch(spark, r: int):
    """Round r's feature batch: NEW events on day 4+r plus (even rounds)
    revisions of round r-1 events with a later event time — the update
    path the MERGE must take."""
    day = datetime(2025, 5, 4 + r)
    feats = [
        _feature(f"r{r}e{i}", day + timedelta(hours=1 + i), 4.0 + (i % 40) / 10)
        for i in range(NEW_PER_ROUND)
    ]
    if r % 2 == 0 and r > 0:
        feats += [
            _feature(f"r{r-1}e{i}", day + timedelta(minutes=i), 6.5)
            for i in range(UPD_PER_ROUND)
        ]
    return rows_to_bronze(
        spark,
        feature_rows(feats, ingestion_ts=CLOCK + timedelta(minutes=r),
                     batch_id=f"b{r}"),
    ).coalesce(1)


def _doc_batch(spark, r: int):
    """Round r's document batch for the incremental near-dup store: ids
    disjoint per round (the CDC contract); one planted near-copy of a
    round-0 doc every round after the first."""
    rows = [
        (
            r * 100 + i,
            f"alpha beta gamma delta {r} {i} epsilon zeta eta theta "
            f"iota kappa lambda mu nu xi omicron pi {r*31+i}",
        )
        for i in range(8)
    ]
    if r > 0:
        rows.append(
            (
                r * 100 + 99,
                "alpha beta gamma delta 0 0 epsilon zeta eta theta "
                "iota kappa lambda mu nu xi omicron pi 0 tail",
            )
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_soak_ten_incremental_batches(spark, tmp_path):
    from global_seismic_data_pipeline_spark.operators import (
        neardup_incremental as ninc,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = WatermarkStore(wh)

    ninc.build_minhash_index(
        wh, _doc_batch(spark, 0), id_col="doc_id", text_col="text",
        n=3, num_hashes=32, bands=8, seed=7, hasher="md5", name="soak_idx",
    )
    meta = ninc._load_meta(wh, "soak_idx")

    expected_ids: set[str] = set()
    prev_bronze_wm = prev_silver_wm = None
    silver_plan_len = None
    stats_initialized = False

    for r in range(ROUNDS):
        batch = _batch(spark, r)
        n_in = bz.ingest_batch(wh, store, batch)
        assert n_in == NEW_PER_ROUND + (
            UPD_PER_ROUND if (r % 2 == 0 and r > 0) else 0
        )
        expected_ids |= {f"r{r}e{i}" for i in range(NEW_PER_ROUND)}

        # -- bronze stats sidecar BEFORE any rewrite: appends must scan
        # incrementally (exactly the one file this round added)
        if not stats_initialized:
            assert skipping.refresh_file_stats(wh, bz.BRONZE_TABLE, ["mag"]) >= 1
            stats_initialized = True
        elif r % 2 == 1:  # odd rounds: append-only since last refresh
            assert skipping.refresh_file_stats(wh, bz.BRONZE_TABLE, ["mag"]) == 1

        # -- dedup rewrite only when revisions created duplicates
        rep = bz.quality_report(wh.read(bz.BRONZE_TABLE))
        if r % 2 == 0 and r > 0:
            assert rep["duplicate_records"] == UPD_PER_ROUND
            assert bz.dedup_rewrite(wh) == len(expected_ids)
            # the rewrite replaced every file — refresh drops+rescans all
            n_files = len(
                skipping._list_parquet_files(wh.path(bz.BRONZE_TABLE))
            )
            assert skipping.refresh_file_stats(
                wh, bz.BRONZE_TABLE, ["mag"]
            ) == n_files
        else:
            assert rep["duplicate_records"] == 0
        assert wh.read(bz.BRONZE_TABLE).count() == len(expected_ids)

        # -- silver MERGE + gold
        n_s = silver.run_silver(wh, store, clock=CLOCK)
        assert n_s == n_in  # the increment is exactly this round's rows
        assert wh.read(silver.SILVER_TABLE).count() == len(expected_ids)
        if r % 2 == 0 or r == ROUNDS - 1:  # keep the loop in CI budget
            counts = gold.run_gold(wh, clock=CLOCK)
            kpi = wh.read("gold_kpi_summary").collect()[0]
            assert kpi.total_earthquakes == len(expected_ids)
            assert counts["gold_physics_analysis"] == len(expected_ids)

        # -- watermarks: monotone, never regressing, exactly 2 entries
        b_wm = store.get(bz.BRONZE_TABLE).watermark_value
        s_wm = store.get(silver.SILVER_TABLE).watermark_value
        if prev_bronze_wm is not None:
            assert b_wm >= prev_bronze_wm and s_wm >= prev_silver_wm
        prev_bronze_wm, prev_silver_wm = b_wm, s_wm
        assert wh.read("control_watermark").count() == 2

        # -- plans stable: reading silver must not accumulate lineage
        # (normalize the session-global expression ids #NNN, which grow
        # over the session without changing the plan's shape)
        import re as _re

        plan_len = len(
            _re.sub(
                r"#\d+",
                "#",
                wh.read(silver.SILVER_TABLE)
                ._jdf.queryExecution().analyzed().toString(),
            )
        )
        if silver_plan_len is None:
            silver_plan_len = plan_len
        assert plan_len == silver_plan_len

        # -- incremental near-dup store: probe + append this round's docs
        if r > 0:
            pairs = ninc.incremental_minhash_pairs(
                wh, _doc_batch(spark, r), text_col="text",
                threshold=0.3, name="soak_idx",
            )
            planted = r * 100 + 99
            assert planted in {x for p in pairs.collect() for x in (p.id_a, p.id_b)}

        # -- maintenance every 3rd round: compaction bounds file growth,
        # bucketed store keeps its co-location, vacuum stays clean
        if r % 3 == 2:
            maintenance.compact(wh, silver.SILVER_TABLE, sort_cols=["event_time"])
            stats = maintenance.compact_bucketed(
                wh, "soak_idx_bands", ("band", "bucket"),
                num_buckets=meta["num_buckets"],
            )
            assert stats["files_after"] <= stats["files_before"]
            assert maintenance.vacuum(wh) == 0

    # -- end state: silver file count is BOUNDED (compaction won), the
    # store still answers probes correctly after compactions, and the
    # processed counters accumulated exactly the increments
    n_silver_files = len(
        skipping._list_parquet_files(wh.path(silver.SILVER_TABLE))
    )
    assert n_silver_files <= 40  # 10 merge rewrites, never unbounded
    total_rows = ROUNDS * NEW_PER_ROUND + 4 * UPD_PER_ROUND  # r=2,4,6,8
    assert store.get(silver.SILVER_TABLE).records_processed == total_rows
    final_mags = {
        r_.event_id: r_.magnitude
        for r_ in wh.read(silver.SILVER_TABLE).collect()
        if r_.event_id.startswith(("r1e", "r3e"))
    }
    # revised events carry the round-(r+1) magnitude 6.5
    for i in range(UPD_PER_ROUND):
        assert final_mags[f"r1e{i}"] == 6.5
        assert final_mags[f"r3e{i}"] == 6.5

"""Schema-evolution tooling: drift detection and safe-union planning.

Long-running ingestion sees upstream schemas change (the reference's
feed added/renamed USGS properties over time; the testdata itself has
shipped three timestamp physical types across rounds). Two primitives:

- :func:`schema_diff` — the drift report between two schemas: columns
  added / removed / type-changed / nullability-changed, as plain rows a
  pipeline can alert on or log next to the batch. Pure metadata — no
  jobs, no scans.
- :func:`evolve_union` — align-and-union a batch whose schema drifted
  against the canonical schema: missing canonical columns become typed
  nulls, extra columns are DROPPED (reported by ``schema_diff``; silent
  column loss is the failure mode this makes explicit), and columns
  whose type differs are cast to the canonical type when Spark allows
  an implicit-safe cast (``canCast``), else the union fails loudly.
  This is `mergeSchema`'s read-time behavior made an explicit,
  auditable write-time step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_diff(old: T.StructType, new: T.StructType) -> list[dict]:
    """Drift rows: {column, change, from, to} — change ∈
    added | removed | type_changed | nullability_changed."""
    o = {f.name: f for f in old.fields}
    n = {f.name: f for f in new.fields}
    out: list[dict] = []
    for name in sorted(o.keys() | n.keys()):
        if name not in o:
            out.append({"column": name, "change": "added",
                        "from": None, "to": n[name].dataType.simpleString()})
        elif name not in n:
            out.append({"column": name, "change": "removed",
                        "from": o[name].dataType.simpleString(), "to": None})
        elif o[name].dataType != n[name].dataType:
            out.append({"column": name, "change": "type_changed",
                        "from": o[name].dataType.simpleString(),
                        "to": n[name].dataType.simpleString()})
        elif o[name].nullable != n[name].nullable:
            out.append({"column": name, "change": "nullability_changed",
                        "from": str(o[name].nullable), "to": str(n[name].nullable)})
    return out


def evolve_union(canonical: DataFrame, batch: DataFrame) -> DataFrame:
    """Union ``batch`` under ``canonical``'s schema (see module
    docstring). Raises ``ValueError`` on an unsafe type change."""
    canon = canonical.schema
    have = {f.name: f for f in batch.schema.fields}
    cols = []
    for f in canon.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name].dataType == f.dataType:
            cols.append(F.col(f.name))
        else:
            src = have[f.name].dataType
            # implicit-safe widening only: int→long, float→double,
            # int→double, and anything→string; other changes must be
            # resolved by the caller (a lossy silent cast hides drift)
            safe = (
                (src, f.dataType)
                in {
                    (T.IntegerType(), T.LongType()),
                    (T.FloatType(), T.DoubleType()),
                    (T.IntegerType(), T.DoubleType()),
                    (T.LongType(), T.DoubleType()),
                }
                or isinstance(f.dataType, T.StringType)
            )
            if not safe:
                raise ValueError(
                    f"unsafe type change for {f.name!r}: "
                    f"{src.simpleString()} -> {f.dataType.simpleString()}"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return canonical.unionByName(batch.select(*cols))

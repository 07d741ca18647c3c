"""Iceberg table adapter (north rule: "Iceberg-backed segments").

This sandbox ships no Iceberg runtime jar, so the engine implements the
Iceberg semantics it needs directly on the filesystem and exposes this
adapter for deployments that have `iceberg-spark-runtime` on the
classpath:

| Iceberg concept | engine stand-in (index/build.py) |
|---|---|
| table snapshot | generation dir `segments/gen=G` + `_index_meta.json` `gens` list (committed atomically by writing the meta file last) |
| manifest file | `_manifests/gen{G}_bucket{B}.json` (row/byte counts, lineage, timing) |
| snapshot isolation / newest-wins | reader resolves doc events across gens (`compute_doc_events`); `compact_index` = `rewrite_data_files` |
| MERGE INTO on re-crawl | new generation + doc-event shadowing + tombstones |
| partition + stats pruning | `bucket=` dirs + parquet row-group min/max on sorted `term_id` |

With a real catalog configured (`spark.sql.catalog.<name>` set to an
Iceberg catalog), `use_iceberg()` is True and the helpers below
read/write through it; the build dataflow is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def use_iceberg(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog implementation is configured and the
    runtime jar is present."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def read_webtext(spark: SparkSession, source: str) -> DataFrame:
    """Read the webtext input: an Iceberg table name (when a catalog is
    configured) or a parquet path (sandbox)."""
    if "/" not in source and use_iceberg(spark):
        return spark.read.table(source)
    return spark.read.parquet(source)


def append_snapshot(df: DataFrame, target: str) -> None:
    """Append a build generation: Iceberg `writeTo(...).append()` when
    available, parquet dir append otherwise."""
    spark = df.sparkSession
    if "/" not in target and use_iceberg(spark):
        df.writeTo(target).append()
    else:
        df.write.mode("append").parquet(target)

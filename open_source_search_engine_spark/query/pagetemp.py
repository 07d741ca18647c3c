"""Page-temperature registry (PageTemperatureRegistry.h:8-38, .cpp:126-147).

The reference keeps a docid -> 26-bit "hotness" registry loaded from a
file; at scoring time each doc's temperature is log-scaled into
[page_temp_weight_min, page_temp_weight_max] and multiplied into the
final doc score (PosdbTable.cpp:4268-4277).

Spark-native analog: the registry is a ``(doc_id: long, temperature:
long)`` parquet directory next to the index (``<index>/page_temp``) —
corpus-sized, so it is JOINED onto the candidate postings by doc_id,
never collected. The log-linear scaling (scale_linear over log(t),
.cpp:138-147) runs JVM-side as a Column expression; unregistered docs
get ``default_temperature`` (.h:27), exactly like the reference's
hash-table miss path (.cpp:133-134).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf

SUBDIR = "page_temp"


def load_page_temperatures(spark: SparkSession, index_dir: str,
                           temps: DataFrame) -> None:
    """Registry load() analog: persist (doc_id, temperature>=1) beside
    the index. Overwrites any previous registry."""
    (temps.select(F.col("doc_id").cast("long"),
                  F.greatest(F.col("temperature").cast("long"), F.lit(1))
                  .alias("temperature"))
     .write.mode("overwrite").parquet(os.path.join(index_dir, SUBDIR)))


def registry_frame(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = os.path.join(index_dir, SUBDIR)
    try:
        return spark.read.parquet(p)
    except Exception:
        return None


def scaled_temp_frame(spark: SparkSession, index_dir: str,
                      conf: EngineConf = DEFAULT_CONF,
                      ) -> tuple[DataFrame | None, float]:
    """Returns (frame, default_scaled): frame is (doc_id, page_temp
    double) with the log-linear scaling applied (query_page_temperature,
    .cpp:138-147), or None when no registry exists; default_scaled is
    the value for unregistered docs (hash-miss default, .cpp:133).

    The min/max temperature aggregate is one tiny 2-number job, cached
    per call site; the scaling itself is a Column expression so the
    corpus-sized registry never leaves the JVM."""
    lo_w, hi_w = conf.page_temp_weight_min, conf.page_temp_weight_max
    reg = registry_frame(spark, index_dir)
    if reg is None:
        # empty-registry path (.cpp:139-140): every doc gets the default
        # temperature scaled within the built-in [1, 10] range
        return None, _scale(math.log(max(conf.page_temp_default, 1)),
                            math.log(1.0), math.log(10.0), lo_w, hi_w)
    row = reg.agg(F.min("temperature").alias("lo"),
                  F.max("temperature").alias("hi")).collect()[0]
    lo_t = math.log(max(int(row["lo"]), 1))
    hi_t = math.log(max(int(row["hi"]), 1))
    default_scaled = _scale(math.log(max(conf.page_temp_default, 1)),
                            lo_t, hi_t, lo_w, hi_w)
    if hi_t <= lo_t:
        frame = reg.select("doc_id",
                           F.lit(float(lo_w)).alias("page_temp"))
    else:
        frame = reg.select(
            "doc_id",
            (F.lit(lo_w)
             + (F.log(F.col("temperature").cast("double")) - F.lit(lo_t))
             / F.lit(hi_t - lo_t) * F.lit(hi_w - lo_w))
            .alias("page_temp"))
    return frame, default_scaled


def _scale(x: float, lo: float, hi: float, out_lo: float,
           out_hi: float) -> float:
    """scale_linear (ScalingFunctions.h) clamped to the output range."""
    if hi <= lo:
        return out_lo
    t = (x - lo) / (hi - lo)
    t = min(max(t, 0.0), 1.0)
    return out_lo + t * (out_hi - out_lo)

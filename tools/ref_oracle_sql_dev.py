"""Differential harness for the reference-scorer DuckDB oracle
(`__spark_entry__._refscore_oracle_sql`): runs the ENGINE
(scorer='reference') and the SQL twin side by side on one or more sf
dirs and reports set/value mismatches — the derivation evidence for
VERDICT r4 item 2 (see also tools/ref_oracle_proto.py, the pure-numpy
model of the body-only reduction the SQL implements, and
tests/test_refscore_oracle.py, the pytest pin).

Usage: python tools/ref_oracle_sql_dev.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01"]
    from pyspark.sql import SparkSession

    import __spark_entry__ as se
    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.query.executor import search_all

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    terms = ["key", "window", "stream"]
    ok = True
    for sf in sf_dirs:
        con = duckdb.connect()
        con.execute("create view documents as select * from "
                    f"read_parquet('{sf}/documents.parquet')")
        d = se._ensure_base_index(spark, sf)
        for qstr, memb, name in [
            ("key window stream",
             "pr.has1 and pr.has2 and pr.has3", "AND"),
            ("key AND (window OR stream)",
             "pr.has1 and (pr.has2 or pr.has3)", "BOOL"),
        ]:
            eng = (search_all(spark, d, qstr,
                              conf=EngineConf(scorer="reference"))
                   .select("doc_id", "score").toPandas())
            eng_map = dict(zip(eng.doc_id.astype(int), eng.score))
            sql = se._refscore_oracle_sql(terms, memb)
            got = con.execute(sql).fetchdf()
            got_map = dict(zip(got.doc_id.astype(int), got.score))
            only_e = set(eng_map) - set(got_map)
            only_s = set(got_map) - set(eng_map)
            bad = [(k, eng_map[k], got_map[k])
                   for k in sorted(set(eng_map) & set(got_map))
                   if eng_map[k] != got_map[k]]
            print(f"{sf} {name}: eng {len(eng_map)} sql {len(got_map)} "
                  f"only-eng {sorted(only_e)[:5]} "
                  f"only-sql {sorted(only_s)[:5]} mismatch {len(bad)}",
                  bad[:3])
            ok = ok and not only_e and not only_s and not bad
    spark.stop()
    print("BIT-EXACT" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

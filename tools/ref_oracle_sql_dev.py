"""Dev harness: build the DuckDB reference-scorer oracle SQL and diff it
against the engine via the bit-exact numpy prototype
(tools/ref_oracle_proto.py).

Every fractional literal uses e0 scientific notation: DuckDB parses bare
decimals as DECIMAL, whose float conversion differs from the engine's
float64-literal -> float32 path (0.33333333 decimal-casts to
0x3eaaaaaa but np.float32(0.33333333) is 0x3eaaaaab).
"""
from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def refscore_oracle_sql(terms: list[str], membership: str) -> str:
    """Body-only reference-scorer twin (see q_search_reference docstring).

    terms: the positive query terms, slot order. membership: SQL boolean
    over pr.has1..has<N> presence flags.
    """
    from open_source_search_engine_spark.functions.gbhash import hash8
    from open_source_search_engine_spark.functions.posdb import (
        site_rank_from_inlinks,
    )
    from open_source_search_engine_spark.functions.stopwords import (
        STOP_WORD_STRINGS,
    )

    n_t = len(terms)
    ixs = list(range(1, n_t + 1))
    pairs = [(i, j) for i in ixs for j in ixs if i < j]

    sr_whens = " ".join(
        f"when {i} then "
        f"{site_rank_from_inlinks(hash8(f'site{i:04d}.example'.encode()) % 200)}"
        for i in range(97))
    term_values = ", ".join(f"({ix}, '{t}')" for ix, t in zip(ixs, terms))
    stops = ", ".join(
        f"'{w}'" for w in sorted(set(STOP_WORD_STRINGS)) if " " not in w)

    ptr_cols = ",\n    ".join(
        f"coalesce(sum(case when term_ix = {i} then 1 else 0 end) "
        f"over w_excl, 0) as p{i}" for i in ixs)
    state_post_joins = "\n".join(
        f"left join postings q{i} on q{i}.doc_id = st.doc_id and "
        f"q{i}.term_ix = {i} and q{i}.j = st.p{i}" for i in ixs)

    def gp(pa, sa, pb, sb):
        # body-body pair score at qdist=2: the f32 op chain of
        # refscore._g_pair; s2 = f32(f32(100*dw)*dw) precomputed/doc
        dist = (f"(greatest(abs({pb} - {pa}), 2) - 2 + "
                f"(case when {pb} < {pa} then 1 else 0 end))")
        s3 = f"cast(d.s2 * cast({sa} * {sb} as float) as float)"
        return f"cast(cast({s3} as double) / ({dist} + 1.0e0) as float)"

    vcols = ",\n    ".join(
        f"case when q{i}.pos is not null and q{j}.pos is not null then "
        f"cast({gp(f'q{i}.pos', f'q{i}.spw', f'q{j}.pos', f'q{j}.spw')}"
        f" * tp{i}{j}.tfw_ij as float) else null end as v{i}{j}"
        for i, j in pairs)
    tp_joins = "\n".join(f"cross join tfwpair{i}{j} tp{i}{j}"
                         for i, j in pairs)
    ssc_args = ", ".join(f"v{i}{j}" for i, j in pairs)
    win_cols = ",\n    ".join(
        f"q{i}.pos as wpos{i}, q{i}.spw as wspw{i}" for i in ixs)
    final_tps = ",\n    ".join(
        f"case when pr.has{i} and pr.has{j} then "
        f"(case when b.wpos{i} is null or b.wpos{j} is null "
        f"then cast(0.0e0 as float) else "
        f"cast(cast({gp(f'b.wpos{i}', f'b.wspw{i}', f'b.wpos{j}', f'b.wspw{j}')}"
        f" * tw{i}.tfw as float) * tw{j}.tfw as float) end) "
        f"else null end as tp{i}{j}" for i, j in pairs)
    tfwpair_ctes = ",\n".join(
        f"tfwpair{i}{j} as (select cast(a.tfw * b.tfw as float) as tfw_ij "
        f"from tfw a, tfw b where a.term_ix = {i} and b.term_ix = {j})"
        for i, j in pairs)
    has_cols = ", ".join(f"bool_or(term_ix = {i}) as has{i}" for i in ixs)
    tp_list = ", ".join(f"tp{i}{j}" for i, j in pairs)
    tw_join_sql = "\n".join(
        f"join tfw tw{i} on tw{i}.term_ix = {i}" for i in ixs)

    return f"""
with
toks as (select doc_id, string_split(text, ' ') as ts from documents),
docmeta as (
  select doc_id, ts, len(ts) as w,
         greatest(31 - (len(ts) - 1), 1) as den,
         2 * len(ts) + 7 as ntok
  from toks),
docw as (
  select doc_id, ts, w, ntok,
         cast(cast(cast(100.0e0 as float) * dw as float) * dw as float)
           as s2
  from (select *,
        cast( (((cast(den as double) / 31) + 1.0e0)
               * ((cast(den as double) / 31) + 1.0e0) - 1.0e0) / 3.0e0
              * (1.0e0 - 0.35e0) + 0.35e0 as float) as dw
        from docmeta)),
srmult as (
  select doc_id,
    cast(cast(cast((case doc_id % 97 {sr_whens} end) as float)
              * cast(0.33333333e0 as float) as float)
         + cast(1.0e0 as float) as float) as srm
  from docmeta),
terms(term_ix, term) as (values {term_values}),
corpus as (select count(*) as n from toks),
tfw as (
  select t.term_ix,
    cast(1.0e0 + ((least(greatest(
        (select count(*) from toks
         where list_contains(ts, t.term)) / greatest(n * 1.0e0, 1.0e0),
        0.0e0), 0.5e0)) - 0.0e0) / (0.5e0 - 0.0e0) * (0.5e0 - 1.0e0)
      as float) as tfw
  from terms t cross join corpus),
{tfwpair_ctes},
-- word-spam runs over EVERY distinct word (the whole-doc >25%% bump
-- needs each word's is_spam verdict, XmlDoc.cpp:19773-20172)
awords as (
  select d.doc_id, u.i - 1 as k, d.ts[u.i] as word
  from docw d, unnest(generate_series(1, len(d.ts))) as u(i)),
aprof as (
  select a.doc_id, a.word, count(*) as plen,
         list_reverse(list_transform(list_sort(list(a.k)),
                                     k -> 5 + 2 * k)) as pr
  from awords a group by a.doc_id, a.word),
aproft as (
  select a.doc_id, a.word, a.plen, a.pr, d.ntok,
         (a.word in ({stops})
          or regexp_matches(a.word, '^[0-9]+$')) as common,
         (d.ntok > 10 and (a.plen * 100) // d.ntok >= 20) as numrep
  from aprof a join docw d using (doc_id)),
combo1 as (
  select doc_id, word, plen, pr,
         unnest(generate_series(1, least(plen // 4, 4))) as step
  from aproft where plen >= 4 and not numrep),
combo2 as (
  select *, unnest(generate_series(0, plen - 4)) as win from combo1),
combo3 as (
  select *, unnest(generate_series(3, plen - win)) as wlen from combo2
  where plen - win >= 3),
combo4 as (
  select doc_id, word, plen, pr, step, win, wlen,
    (list_sum([pr[win + i + 1] - pr[win + i + 2]
               for i in range(0, wlen - 1) if i % step = 0]) * 256)
      // (wlen - 1) as avg
  from combo3 where wlen % step = 0 and step != wlen),
combo5 as (
  select *, list_sum([abs((pr[win + i + 1] - pr[win + i + 2]) * 256 - avg)
                      for i in range(0, wlen - 1) if i % step = 0])
            // (wlen - 1) as dev
  from combo4),
comboprob as (
  select doc_id, word, win, wlen, plen,
         case when dev <= 51 then 100
              else least((3657 * wlen) // dev, 100) end as prob
  from combo5),
isspam as (
  select p.doc_id, p.word, p.plen, p.common,
         p.numrep or coalesce(bool_or(c.prob > 20), false) as is_spam
  from aproft p
  left join comboprob c on c.doc_id = p.doc_id and c.word = p.word
  where p.plen >= 3
  group by p.doc_id, p.word, p.plen, p.common, p.numrep),
doccnt as (
  select a.doc_id,
    count(*) filter (a.plen < 3) +
      count(*) filter (a.plen >= 3 and not a.common
                       and not coalesce(s.is_spam, false)) as goodw,
    count(*) filter (a.plen >= 3 and not a.common
                     and coalesce(s.is_spam, false)) as spamw
  from aproft a
  left join isspam s on s.doc_id = a.doc_id and s.word = a.word
  group by a.doc_id),
bump as (
  select doc_id,
         (goodw + spamw > 10
          and (spamw * 100) // (goodw + spamw) > 25) as bumped
  from doccnt),
-- per query-term occurrence spam%% (desc profile index i)
spam_marks as (
  select c.doc_id, t.term_ix, u.i, max(c.prob) as p
  from comboprob c
  join terms t on t.term = c.word,
       unnest(generate_series(c.win,
              least(c.win + c.wlen, c.plen - 3) - 1)) as u(i)
  where c.prob > 20
  group by 1, 2, 3),
proft as (
  select a.doc_id, t.term_ix, a.plen, a.pr, a.numrep, a.ntok,
         list_reverse(list_transform(a.pr, x -> x + 150)) as poss
  from aproft a join terms t on t.term = a.word),
spam_base as (
  select p.doc_id, p.term_ix, u.i, p.plen,
         case when p.plen < 3 then 0
              when p.numrep
                then (case when u.i = 0 then 0 else 100 end)
              else 0 end as base_pct,
         (p.plen >= 3 and not p.numrep) as scannable
  from proft p, unnest(generate_series(0, p.plen - 1)) as u(i)),
spam_pcts as (
  select b.doc_id, b.term_ix, b.i, b.plen,
         case when b.scannable then coalesce(m.p, 0)
              else b.base_pct end as pct
  from spam_base b
  left join spam_marks m
    on m.doc_id = b.doc_id and m.term_ix = b.term_ix and m.i = b.i),
spam_adj as (
  select doc_id, term_ix, plen - 1 - i as j,
    case when i = 0
          and min(pct) over (partition by doc_id, term_ix) > 0
         then 0 else pct end as pct
  from spam_pcts),
postings as (
  select s.doc_id, s.term_ix, s.j,
         p.poss[s.j + 1] as pos,
         cast((1.0e0 / 15) + (cast((15 * (100 -
              (case when bu.bumped then greatest(s.pct, 99)
                    else s.pct end))) // 100 as double)
              / (15 - 0)) * (1.0e0 - 1.0e0 / 15) as float) as spw,
         p.plen
  from spam_adj s
  join proft p on p.doc_id = s.doc_id and p.term_ix = s.term_ix
  join bump bu on bu.doc_id = s.doc_id),
singles as (
  select po.doc_id, po.term_ix,
    cast(cast(max(cast(cast(d.s2 * po.spw as float) * po.spw as float))
              * any_value(tw.tfw) as float)
         * any_value(tw.tfw) as float) as single
  from postings po
  join docw d on d.doc_id = po.doc_id
  join tfw tw on tw.term_ix = po.term_ix
  group by po.doc_id, po.term_ix),
presence as (
  select doc_id, {has_cols}, min(single) as min_single
  from singles group by doc_id),
events as (
  select doc_id, term_ix, j, pos, plen,
         row_number() over (partition by doc_id
                            order by pos, term_ix) - 1 as k
  from postings),
states as (
  select doc_id, k,
    {ptr_cols},
    (k = 0 or not lag(j = plen - 1) over
       (partition by doc_id order by k)) as evals
  from events
  window w_excl as (partition by doc_id order by k
                    rows between unbounded preceding and 1 preceding)),
statescore as (
  select st.doc_id, st.k, {", ".join(f"st.p{i}" for i in ixs)},
    {vcols}
  from states st
  join docw d on d.doc_id = st.doc_id
  {state_post_joins}
  {tp_joins}
  where st.evals),
beststate as (
  select doc_id, k, {", ".join(f"p{i}" for i in ixs)}
  from (
    select *,
      row_number() over (partition by doc_id
                         order by coalesce(least({ssc_args}),
                                           cast(-1.0e0 as float)) desc,
                         k asc) as rn
    from statescore) where rn = 1),
winners as (
  select st.doc_id, {win_cols}
  from beststate st
  {state_post_joins}),
finals as (
  select b.doc_id,
    {final_tps},
    pr.min_single
  from winners b
  join presence pr on pr.doc_id = b.doc_id
  {tw_join_sql}
  join docw d on d.doc_id = b.doc_id
  where {membership})
select doc_id::bigint as doc_id,
       cast(least({tp_list}, min_single) * srm as float)::double as score
from finals
join srmult using (doc_id)
where least({tp_list}, min_single) > 0
"""


def main():
    import numpy as np  # noqa: F401

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
            got = con.execute(refscore_oracle_sql(terms, memb)).fetchdf()
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
    spark.stop()


if __name__ == "__main__":
    main()

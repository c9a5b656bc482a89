"""Oracle-side SQL for the driver registry (split out of
queries.py, round 15 -- pure relocation, zero behavior change): the
``SQL_*`` DuckDB oracle strings, the helpers that generate them, and
the constants BOTH sides interpolate (rounding decimals, the pinned
query vector / quality model, planted-construction parameters, staging
paths). queries.py imports everything back, so its public surface
(``QUERIES`` / ``ORACLES`` / ``OFF_GATE_*`` and the shared constants)
is unchanged.

Nothing here touches Spark: these strings run on DuckDB inside the
driver's correctness gate (and tools/verify_oracle.py), replaying each
registered query's semantics over the same parquet tables.
"""

from __future__ import annotations

from clustering_spark.operators import textnorm, textops

ROUND = 6  # decimals for per-row arithmetic / averages


ROUND_SUM = 2  # decimals for large-magnitude sums


SQL_NULLDROP = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
"""


SQL_SEGMENT_COUNTS = """
SELECT c_nationkey, c_mktsegment, count(*) AS n_rows,
       count(DISTINCT (c_acctbal, c_custkey)) AS n_distinct_points,
       CAST(count(DISTINCT (c_acctbal, c_custkey)) >= 2 AS INT) AS passes_guard
FROM customer GROUP BY 1, 2
"""


SQL_MINMAX_SCALE = f"""
SELECT c_custkey, c_nationkey, c_mktsegment,
       round(CASE WHEN mx = mn THEN 0.0
                  ELSE (c_acctbal - mn) / (mx - mn) * 100.0 END, {ROUND})
         AS acctbal_scaled
FROM (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         min(c_acctbal) OVER (PARTITION BY c_nationkey, c_mktsegment) AS mn,
         max(c_acctbal) OVER (PARTITION BY c_nationkey, c_mktsegment) AS mx
  FROM customer)
"""


SQL_LIMIT_SCALE = f"""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * 100.0 / p_retailprice, {ROUND}) AS price_pct_of_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


SQL_CLUSTER_ASSIGN = f"""
WITH pts AS (
  SELECT CASE WHEN c_custkey % 6 < 3 THEN 0
              WHEN c_custkey % 6 < 5 THEN 1 ELSE 2 END AS blob,
         (CASE WHEN c_custkey % 6 >= 3 AND c_custkey % 6 < 5
               THEN 10.0 ELSE 0.0 END)
           + ((c_custkey * 2654435761) % 1000 / 1000.0 - 0.5) * 0.2 AS fx,
         (CASE WHEN c_custkey % 6 = 5 THEN 10.0 ELSE 0.0 END)
           + ((c_custkey * 40503) % 1000 / 1000.0 - 0.5) * 0.2 AS fy
  FROM customer WHERE c_custkey <= 60000),
agg AS (
  SELECT blob, count(*) AS cluster_size, avg(fx) AS cfx, avg(fy) AS cfy
  FROM pts GROUP BY blob),
lab AS (
  SELECT blob, cluster_size, cfx, cfy,
         row_number() OVER (ORDER BY cluster_size DESC, blob) - 1
           AS cluster_name
  FROM agg),
per AS (
  SELECT l.cluster_name, l.cluster_size, l.cfx, l.cfy,
         max(power(p.fx - l.cfx, 2) + power(p.fy - l.cfy, 2)) AS max_d2,
         sum(power(p.fx - l.cfx, 2) + power(p.fy - l.cfy, 2)) AS ss
  FROM pts p JOIN lab l ON p.blob = l.blob
  GROUP BY 1, 2, 3, 4)
SELECT cluster_name, cluster_size,
       round(cfx, {ROUND}) + 0.0 AS center_fx,
       round(cfy, {ROUND}) + 0.0 AS center_fy,
       round(sqrt(max_d2), {ROUND}) AS radius,
       round(sum(ss) OVER (), {ROUND}) AS wssse
FROM per
"""


SQL_GROUP_STATS = f"""
SELECT o_orderstatus, count(*) AS n_rows,
       round(min(o_totalprice), {ROUND}) AS price_min,
       round(max(o_totalprice), {ROUND}) AS price_max,
       round(quantile_cont(o_totalprice, 0.5), {ROUND}) AS price_p50,
       round(quantile_cont(o_totalprice, 0.95), {ROUND}) AS price_p95
FROM orders GROUP BY 1
"""


SQL_ENTROPY = f"""
WITH sizes AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2)
SELECT c_mktsegment,
       round(abs(-(sum(n * log2(n)) / sum(n) - log2(sum(n)))), {ROUND}) AS entropy
FROM sizes GROUP BY 1
"""


SQL_CENTER_RADIUS = f"""
WITH centers AS (
  SELECT c_mktsegment, avg(c_acctbal) AS ctr_bal,
         avg(CAST(c_nationkey AS DOUBLE)) AS ctr_nat,
         round(avg(c_acctbal), {ROUND}) + 0.0 AS center_acctbal,
         round(avg(CAST(c_custkey AS DOUBLE)), {ROUND}) AS center_custkey
  FROM customer GROUP BY 1)
SELECT c.c_mktsegment, center_acctbal, center_custkey,
       round(sqrt(max(power(c_acctbal - ctr_bal, 2)
                    + power(CAST(c_nationkey AS DOUBLE) - ctr_nat, 2))), {ROUND})
         AS radius
FROM customer c JOIN centers USING (c_mktsegment)
GROUP BY 1, 2, 3
"""


SQL_TOPK = f"""
SELECT c_mktsegment, round(sum(c_acctbal), {ROUND_SUM}) + 0.0 AS total_bal
FROM customer GROUP BY 1
ORDER BY total_bal DESC, c_mktsegment LIMIT 3
"""


SQL_LATEST_EVENT = """
SELECT user_id, event_id, event_type,
       epoch_ns(ts) // 1000000000 AS ts_epoch
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


_CSV_INGEST_PATH = "/tmp/spark_graft_csv_ingest/container_stats.csv"


SQL_CSV_INGEST = f"""
WITH raw AS (
  SELECT * FROM read_csv('{_CSV_INGEST_PATH}', header=true,
                         all_varchar=true)
), flagged AS (
  SELECT *, (TRY_CAST(cpu_percent AS DOUBLE) IS NULL) AS bad FROM raw
), capped AS (
  SELECT * FROM flagged WHERE NOT bad
  ORDER BY container_id LIMIT 1500
)
SELECT node_id, count(*) AS n_rows,
       round(avg(TRY_CAST(cpu_percent AS DOUBLE)), {ROUND}) AS avg_cpu,
       round(sum(TRY_CAST(ram_usage AS DOUBLE)), {ROUND_SUM}) AS ram_sum
FROM capped GROUP BY node_id
UNION ALL
SELECT '__corrupt__', count(*), NULL, NULL FROM flagged WHERE bad
"""


SQL_HIERARCHY = f"""
SELECT r_name AS name, n_name AS child_name, count(*) AS n_customers,
       round(sum(c_acctbal), {ROUND_SUM}) + 0.0 AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), {ROUND_SUM}) AS sum_qty,
       round(sum(l_extendedprice), {ROUND_SUM}) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), {ROUND_SUM}) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {ROUND_SUM}) AS sum_charge,
       round(avg(l_quantity), {ROUND}) AS avg_qty,
       round(avg(l_extendedprice), {ROUND}) AS avg_price,
       round(avg(l_discount), {ROUND}) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""


SQL_REVENUE_BY_NATION = f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), {ROUND_SUM}) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


SQL_WINDOWED_EVENTS = f"""
SELECT 'tumbling' AS window_kind,
       (epoch_ns(ts) // 3600000000000) * 3600 AS win_start_epoch,
       event_type, count(*) AS n_events,
       round(sum(value), {ROUND_SUM}) AS total_value
FROM events GROUP BY 1, 2, 3
UNION ALL
SELECT 'sliding' AS window_kind, win_start_epoch, event_type,
       count(*) AS n_events, round(sum(value), {ROUND_SUM}) AS total_value
FROM (
  SELECT event_type, value,
         ((epoch_ns(ts) // 1000 // 900000000) - i) * 900 AS win_start_epoch
  FROM events, (SELECT unnest(range(4)) AS i)
) GROUP BY 1, 2, 3
"""


SQL_WINDOW_EVENTS = f"""
SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch,
       event_type, count(*) AS n_events,
       round(sum(value), {ROUND_SUM}) AS total_value
FROM events GROUP BY 1, 2
"""


# oracle for the STREAMING sliding-window query (the batch sliding
# form lives inside q_windowed_events / SQL_WINDOWED_EVENTS)
SQL_SLIDING_WINDOW_EVENTS = f"""
WITH g AS (
  SELECT event_type, value,
         ((epoch_ns(ts) // 1000 // 900000000) - i) * 900 AS win_start_epoch
  FROM events, (SELECT unnest(range(4)) AS i)
)
SELECT win_start_epoch, event_type, count(*) AS n_events,
       round(sum(value), {ROUND_SUM}) AS total_value
FROM g GROUP BY 1, 2
"""


# final per-user running totals from the stateful operator must equal
# the batch aggregate: update-mode emissions are monotone snapshots and
# latest-wins keeps the last one (closed rows carry the same totals)
SQL_STATEFUL_USER_STATS = """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value,
       max(epoch_ns(ts) // 1000000000) AS last_seen_epoch
FROM events
GROUP BY user_id
"""


SQL_WINDOW_EVENTS_MODES = f"""
WITH w AS ({SQL_WINDOW_EVENTS})
SELECT 'memory' AS mode, * FROM w
UNION ALL SELECT 'parquet' AS mode, * FROM w
UNION ALL SELECT 'incremental' AS mode, * FROM w
"""


SQL_STREAM_DEDUP_REPLAY = f"""
SELECT event_type, count(*) AS n_events,
       round(sum(value), {ROUND_SUM}) AS total_value
FROM events GROUP BY event_type
"""


SQL_STREAM_DISTINCT_TYPES = """
SELECT user_id,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


SQL_PIVOT_USER_EVENT_COUNTS = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'error')    AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


SQL_APPROX_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       1 AS hll_within_5pct
FROM events GROUP BY 1
"""


SQL_SALTED_JOIN_REVENUE = f"""
SELECT s_nationkey, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), {ROUND_SUM}) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


SQL_JSON_PROPS_STATS = """
SELECT event_type,
       count(*) AS n_events,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
       min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


SQL_STREAM_SESSIONS = f"""
WITH t AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events
), b AS (
  SELECT user_id, us, value,
         -- >= : Spark's session end is EXCLUSIVE (an event exactly
         -- gap-distant starts a new session)
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= 1800 * 1000000
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         THEN 1 ELSE 0 END AS brk
  FROM t
), g AS (
  SELECT *, sum(brk) OVER (
           PARTITION BY user_id ORDER BY us
           ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT min(us) // 1000000 AS session_start,
       max(us) // 1000000 + 1800 AS session_end,
       user_id,
       count(*) AS n_events,
       round(sum(value), {ROUND_SUM}) AS total_value
FROM g GROUP BY user_id, sid
"""


SQL_TUNE_K_PLANTED = """
WITH segs AS (
  SELECT DISTINCT c_custkey % 3 + 3 AS planted
  FROM customer WHERE c_custkey <= 60000)
SELECT a.algorithm, 'g' || planted AS seg,
       CAST(planted AS BIGINT) AS chosen_k
FROM (VALUES ('KMeans'), ('BisectingKMeans'), ('GaussianMixture'))
     a(algorithm)
CROSS JOIN segs
"""


# deterministic 64-dim query vector for the similarity queries (no RNG:
# same literal in the Spark plan and the oracle SQL)
QUERY_VEC = [((i * 37) % 101 - 50) / 50.0 for i in range(64)]


_QV_SQL = "[" + ", ".join(f"{x!r}" for x in QUERY_VEC) + "]"


SQL_DEDUP_EXACT = """
SELECT md5(CASE WHEN text IS NULL THEN '-1:'
                ELSE length(text)::VARCHAR || ':' || text END) AS content_hash,
       min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


# Round 14, oracle rewrite — the sf0.1 checkpoint previously spent
# ~20-25 min PER EVALUATION of this subtree (it also sits inside the
# neardup_components closure oracle, so it was paid twice): exact
# verification ran list_intersect over STRING shingle lists, twice
# per candidate (WHERE + SELECT), on 6.3M candidates. Three changes,
# all value-identical (verified row-for-row at sf0.001/0.01/0.1):
#
# 1. SOUND COUNT FILTER on the prefix join: if |A∩B| >= t and both
#    lists are sorted by the same global (df, shingle) order with
#    prefix length P = n - ceil(0.5n) + 1, then the k-th smallest
#    shared shingle has rank <= n - (t - k) in each list, so at
#    least t - max(suf_a, suf_b) shared shingles (suf = ceil(0.5n)-1)
#    sit in BOTH prefixes. Grouping the prefix join per pair and
#    requiring that count cuts sf0.1's candidates 6.3M -> 469k
#    before any intersection runs. The per-match positional filter
#    survives as bool_or over the group.
# 2. DENSE INTEGER ids for shingles (row_number over the distinct
#    set — a bijection, so intersection COUNTS are exactly the
#    string-set counts; no hashing, no collisions): BIGINT-list
#    intersects are ~5x cheaper than string-list ones.
# 3. Intersection computed ONCE via the materialized `scored` CTE
#    (inlined, the outer WHERE + SELECT each re-evaluate it), and
#    the MATERIALIZED pins stop DuckDB 1.0 from merging the verify
#    join beneath the group-by (measured 1207 s vs 40 s at sf0.1).
#
# Measured whole-query: sf0.01 16 s -> 0.5 s, sf0.1 ~20 min -> 40 s.
SQL_NGRAM_JACCARD = r"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '[ \t\n\x0b\f\r]+', ' ', 'g') AS t
  FROM documents),
full_sets AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(t) >= 5
         THEN list_transform(range(1, len(t) - 3), i -> substring(t, i, 5))
         ELSE [t] END) AS sh
  FROM norm),
exploded AS MATERIALIZED (
  SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM full_sets),
sid AS (
  SELECT shingle, row_number() OVER (ORDER BY shingle) AS s
  FROM (SELECT DISTINCT shingle FROM exploded)),
int_sets AS MATERIALIZED (
  SELECT e.doc_id, list_sort(list(sid.s)) AS sh, max(e.n) AS n
  FROM exploded e JOIN sid USING (shingle) GROUP BY e.doc_id),
docfreq AS (SELECT shingle, count(*) AS df FROM exploded GROUP BY 1),
prefix AS (
  SELECT doc_id, shingle, rn, n FROM (
    SELECT e.doc_id, e.shingle, e.n,
           row_number() OVER (PARTITION BY e.doc_id
                              ORDER BY d.df, e.shingle) AS rn
    FROM exploded e JOIN docfreq d USING (shingle))
  WHERE rn <= n - ceil(0.5 * n) + 1),
cand_counts AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         count(*) AS c, max(a.n) AS na, max(b.n) AS nb,
         bool_or(least(a.n - a.rn, b.n - b.rn) + 1
                 >= ceil((0.5 / 1.5) * (a.n + b.n))) AS pos_ok
  FROM prefix a JOIN prefix b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
cands AS MATERIALIZED (
  SELECT id_a, id_b FROM cand_counts
  WHERE pos_ok
    AND c >= greatest(1,
        ceil((0.5 / 1.5) * (na + nb))
        - greatest(ceil(0.5 * na) - 1, ceil(0.5 * nb) - 1))),
scored AS MATERIALIZED (
  SELECT id_a, id_b,
         len(list_intersect(fa.sh, fb.sh)) AS inter,
         fa.n AS na, fb.n AS nb
  FROM cands
  JOIN int_sets fa ON fa.doc_id = id_a
  JOIN int_sets fb ON fb.doc_id = id_b)
SELECT id_a, id_b,
       round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
FROM scored
WHERE inter::DOUBLE / (na + nb - inter) >= 0.5
"""


SQL_HASH_SPLIT_COUNTS = """
WITH b AS (
  SELECT c_mktsegment, substr(md5(c_custkey::VARCHAR), 1, 8) AS h
  FROM customer)
SELECT c_mktsegment,
       CASE WHEN h < 'cccccccc' THEN 'train'
            WHEN h < 'e6666666' THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_rows
FROM b GROUP BY 1, 2
"""


SQL_ASOF_LAST_PURCHASE = f"""
WITH clicks AS (
  SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
         round(max(value), {ROUND}) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id, c.ts_us, p.last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""


SQL_CLICKS_AFTER_SIGNUP = """
SELECT s.event_id, count(c.event_id) AS n_clicks_1h
FROM events s LEFT JOIN events c
  ON c.event_type = 'click'
 AND epoch_ns(c.ts) // 1000 >  epoch_ns(s.ts) // 1000
 AND epoch_ns(c.ts) // 1000 <= epoch_ns(s.ts) // 1000 + 3600000000
WHERE s.event_type = 'signup'
GROUP BY 1
"""


SQL_PAIRDIST = f"""
WITH pts AS (
  SELECT c_mktsegment AS seg, c_acctbal AS x, c_nationkey AS y,
         c_custkey AS id
  FROM customer),
n AS (SELECT seg, count(*) AS n FROM pts GROUP BY seg),
intra_pairs AS (
  SELECT a.seg, (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b ON a.seg = b.seg AND a.id <> b.id)
SELECT 'intra' AS scope, n.seg AS seg_a, n.seg AS seg_b,
       CASE WHEN n.n >= 2
            THEN round(sum(p.d2) / (n.n * (n.n - 1.0)), {ROUND_SUM}) END
         AS mean_pair_dist2
FROM n LEFT JOIN intra_pairs p ON p.seg = n.seg
GROUP BY n.seg, n.n
UNION ALL
SELECT 'inter' AS scope, a.seg AS seg_a, b.seg AS seg_b,
       round(avg((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)),
             {ROUND_SUM}) AS mean_pair_dist2
FROM pts a JOIN pts b ON a.seg < b.seg
GROUP BY 2, 3
"""


# Round 13: the closure is HOP-DOUBLED (e1 -> e2 -> e4, two bounded
# self-joins covering paths up to 4 edges) instead of a WITH RECURSIVE
# fixpoint — the recursive form was intractable at sf0.1 (the long-
# standing neardup_components exclusion from the 10x checkpoint) while
# the operator itself runs there in seconds. The bound is PROVEN for
# the gate corpora, not just measured: component sizes are <= 4 at
# every scale (measured 4/3/4 at sf0.001/0.01/0.1, min-node
# eccentricity 1 everywhere), and any component of size <= 5 has
# diameter <= 4, so 4 hops always carries the min label.
# MATERIALIZED is load-bearing, not an optimization nicety: each
# doubling level references its predecessor twice, so without it
# DuckDB re-inlines the expensive pairs subtree up to 8x — at sf0.1
# that spilled >80 GB of temp and died on disk, while the
# materialized form carries only the (tiny) edge tables.
SQL_NEARDUP_COMPONENTS = f"""
WITH pairs AS MATERIALIZED ({SQL_NGRAM_JACCARD}),
e1 AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
e2 AS MATERIALIZED (
  SELECT u, v FROM e1
  UNION
  SELECT a.u, b.v FROM e1 a JOIN e1 b ON a.v = b.u AND a.u <> b.v
),
e4 AS MATERIALIZED (
  SELECT u, v FROM e2
  UNION
  SELECT a.u, b.v FROM e2 a JOIN e2 b ON a.v = b.u AND a.u <> b.v
),
comp AS (SELECT u AS node, least(min(v), u) AS comp FROM e4 GROUP BY u)
SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS component,
       CAST(d.doc_id = coalesce(c.comp, d.doc_id) AS INT) AS kept
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def _media_metadata_sql() -> str:
    from clustering_spark.operators.multimodal import EXACT_LUMAS

    lumas = "[" + ", ".join(str(v) for v in EXACT_LUMAS) + "]"
    n = len(EXACT_LUMAS)
    return f"""
WITH dims AS (
  SELECT doc_id, 9 + doc_id % 24 AS w, 8 + (doc_id // 31) % 16 AS h,
         0 AS fam
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, 9 + doc_id % 21 AS w, 8 + (doc_id // 17) % 12 AS h,
         5 AS fam
  FROM documents WHERE doc_id % 10 = 5),
px AS (
  SELECT d.doc_id, d.w, d.h, y.range AS y, x.range AS x,
         CASE WHEN d.fam = 0
              THEN CAST((7 * x.range + 13 * y.range + d.doc_id) % 256
                        AS DOUBLE)
              ELSE CAST(({lumas})[
                     CAST((7 * x.range + 13 * y.range + d.doc_id) % {n}
                          AS INT) + 1] AS DOUBLE)
         END AS v
  FROM dims d, range(33) x, range(24) y
  WHERE x.range < d.w AND y.range < d.h),
cells AS (
  SELECT p.doc_id, r.range AS r, c.range AS c, avg(p.v) AS m
  FROM px p, range(8) r, range(9) c
  WHERE p.y >= (r.range * p.h) // 8 AND p.y < ((r.range + 1) * p.h) // 8
    AND p.x >= (c.range * p.w) // 9 AND p.x < ((c.range + 1) * p.w) // 9
  GROUP BY 1, 2, 3),
dh AS (
  SELECT a.doc_id,
         sum(CASE WHEN a.m > b.m THEN
               CASE WHEN a.r * 8 + a.c = 63
                    THEN -9223372036854775807 - 1
                    ELSE CAST(1 AS BIGINT) << (a.r * 8 + a.c) END
             ELSE 0 END) AS dhash
  FROM cells a JOIN cells b
    ON a.doc_id = b.doc_id AND a.r = b.r AND a.c + 1 = b.c
  WHERE a.c < 8
  GROUP BY 1)
SELECT t.doc_id, octet_length(encode(t.text)) AS n_bytes,
       sha256(t.text) AS content_sha256,
       CASE t.doc_id % 10 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            WHEN 2 THEN 'video' WHEN 3 THEN 'image' WHEN 4 THEN 'video'
            WHEN 5 THEN 'image'
            WHEN 7 THEN 'audio' WHEN 8 THEN 'audio' WHEN 9 THEN 'video'
            ELSE 'unknown' END AS media_type,
       CASE t.doc_id % 10 WHEN 0 THEN 'fake'
            WHEN 1 THEN CASE (t.doc_id // 7) % 4
                 WHEN 0 THEN 'wav-pcm' WHEN 1 THEN 'wav-ulaw'
                 WHEN 2 THEN 'wav-alaw' ELSE 'wav-ima-adpcm' END
            WHEN 2 THEN 'mp4' WHEN 3 THEN 'webp' WHEN 4 THEN 'avi'
            WHEN 5 THEN 'gif'
            WHEN 7 THEN 'mp3' WHEN 8 THEN 'flac'
            WHEN 9 THEN CASE (t.doc_id // 10) % 2
                 WHEN 0 THEN 'matroska' ELSE 'webm' END
            ELSE 'unknown' END AS format,
       CASE t.doc_id % 10 WHEN 0 THEN 9 + t.doc_id % 24
            WHEN 3 THEN 1 + t.doc_id % 200
            WHEN 4 THEN 320
            WHEN 5 THEN 9 + t.doc_id % 21
            WHEN 9 THEN 16 + t.doc_id % 300 END AS width,
       CASE t.doc_id % 10 WHEN 0 THEN 8 + (t.doc_id // 31) % 16
            WHEN 3 THEN 1 + (t.doc_id // 3) % 150
            WHEN 4 THEN 240
            WHEN 5 THEN 8 + (t.doc_id // 17) % 12
            WHEN 9 THEN 9 + (t.doc_id // 5) % 200 END AS height,
       CASE t.doc_id % 10 WHEN 1 THEN 1 + t.doc_id % 2
            WHEN 7 THEN CASE (t.doc_id // 10) % 2
                 WHEN 0 THEN 1 ELSE 2 END
            WHEN 8 THEN 1 + (t.doc_id // 10) % 2 END AS n_channels,
       CASE t.doc_id % 10 WHEN 1 THEN 8000
            WHEN 7 THEN CASE (t.doc_id // 10) % 3
                 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                 ELSE 32000 END
            WHEN 8 THEN CASE (t.doc_id // 10) % 3
                 WHEN 0 THEN 22050 WHEN 1 THEN 44100
                 ELSE 96000 END END AS sample_rate,
       CASE t.doc_id % 10
            WHEN 1 THEN (100 + t.doc_id % 100) / 8000.0
            WHEN 7 THEN (10 + t.doc_id % 40) * 1152 /
                 CASE (t.doc_id // 10) % 3
                      WHEN 0 THEN 44100.0 WHEN 1 THEN 48000.0
                      ELSE 32000.0 END
            WHEN 8 THEN CAST(1 + t.doc_id % 8 AS DOUBLE)
            END AS audio_duration_sec,
       CASE t.doc_id % 10 WHEN 2 THEN 1 + t.doc_id % 3
            WHEN 4 THEN 1 + t.doc_id % 2
            WHEN 9 THEN 1 + (t.doc_id // 10) % 2 END AS n_tracks,
       CASE t.doc_id % 10 WHEN 2 THEN (1 + t.doc_id % 10) / 2.0
            WHEN 4 THEN CAST(1 + t.doc_id % 8 AS DOUBLE)
            WHEN 9 THEN (1 + t.doc_id % 12) / 4.0
            END AS video_duration_sec,
       CAST(dh.dhash AS VARCHAR) AS dhash
FROM documents t LEFT JOIN dh ON t.doc_id = dh.doc_id
"""


SQL_MEDIA_METADATA = _media_metadata_sql()


def _pii_count_sql(cat: str) -> str:
    """DuckDB match-count expression for one PII category, derived
    from the SAME pattern table Spark uses (textnorm.PII_PATTERNS) so
    the two sides of the gate cannot drift. Mirrors pii_counts'
    SEQUENTIAL semantics: category c is counted on text with all
    earlier PII_ORDER categories already redacted, so overlapping
    matches are not double-counted."""
    expr = "text"
    for earlier in textnorm.PII_ORDER:
        if earlier == cat:
            break
        pat_e = textnorm.PII_PATTERNS[earlier][0].replace("'", "''")
        tok_e = textnorm.PII_PATTERNS[earlier][1]
        expr = f"regexp_replace({expr}, '{pat_e}', '{tok_e}', 'g')"
    pat = textnorm.PII_PATTERNS[cat][0].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


_PII_EMAIL_SQL = _pii_count_sql("email")


_PII_TOTAL_SQL = " + ".join(_pii_count_sql(c) for c in textnorm.PII_ORDER)


# feature CTE shared by text_quality and quality_score (the learned
# scorer consumes exactly the heuristic signal columns, so its oracle
# must recompute them identically — one definition, two gates)
_TEXT_QUALITY_CTE = rf"""
WITH base AS (
  SELECT doc_id, text, len(text) AS n_chars,
         CASE WHEN len(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g'), '[ \t\n\x0b\f\r]+') END AS tk,
         list_filter(string_split(text, chr(10)),
                     x -> len(trim(x)) > 0) AS lines
  FROM documents),
m AS (
  SELECT doc_id, n_chars, tk, lines, len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0 THEN n_chars::DOUBLE / len(tk) ELSE 0.0 END AS avg_tok,
         len(text) - len(regexp_replace(text, '[^\p{{L}}\p{{N}}_ \t\n\x0b\f\r]', '', 'g')) AS n_punct,
         len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         len(list_filter(tk, w -> list_contains(
           ['the','a','of','and','to','in','is','that','it','for'], lower(w))))
           AS n_stop,
         CASE WHEN len(tk) >= 2 THEN
           list_transform(range(1, len(tk)), i -> tk[i] || chr(31) || tk[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS grams,
         list_sort(list_transform(tk, x -> lower(x))) AS st,
         {_PII_EMAIL_SQL} AS n_pii_email,
         {_PII_TOTAL_SQL} AS n_pii_total
  FROM base),
r AS (
  SELECT doc_id, n_tokens, avg_tok, n_pii_email, n_pii_total,
         CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_chars > 0 THEN n_digit::DOUBLE / n_chars ELSE 0.0 END AS digit_ratio,
         CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END AS stop_ratio,
         CASE WHEN len(lines) > 0
              THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
              ELSE 0.0 END AS dup_line,
         CASE WHEN len(grams) > 0
              THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
              ELSE 0.0 END AS rep_2gram,
         CASE WHEN n_tokens > 0 THEN
           (SELECT max(cnt) FROM (
              SELECT count(*) AS cnt FROM unnest(st) AS u(w) GROUP BY w))::DOUBLE
           / n_tokens ELSE 0.0 END AS top_tok
  FROM m)
"""


SQL_TEXT_QUALITY = f"""
{_TEXT_QUALITY_CTE}
SELECT doc_id, n_tokens,
       round(avg_tok, 6) AS avg_token_len,
       round(punct_ratio, 6) AS punct_ratio,
       round(digit_ratio, 6) AS digit_ratio,
       round(stop_ratio, 6) AS stopword_ratio,
       round(CASE WHEN n_tokens = 0 THEN 0.0  -- empty text is NOT middling
             ELSE (CASE WHEN avg_tok >= 3.0 AND avg_tok <= 10.0 THEN 1.0 ELSE 0.0 END
              + (1.0 - least(punct_ratio * 5.0, 1.0))
              + (1.0 - least(digit_ratio * 5.0, 1.0))
              + least(stop_ratio * 5.0, 1.0)) / 4.0 END, 6) AS quality_score,
       round(dup_line, 6) AS dup_line_ratio,
       round(rep_2gram, 6) AS rep_2gram_ratio,
       round(top_tok, 6) AS top_token_ratio,
       n_pii_email, n_pii_total
FROM r
"""


# Learned quality model pinned for the gate: an LR fit on the sf0.001
# documents (label = heuristic quality_score >= its median, seed 42)
# via quality_model.fit_quality_classifier, flattened with
# export_linear_model. Pinning makes the otherwise-iterative fit
# oracle-expressible: scoring is pure +,*,/ arithmetic over the SAME
# rounded feature columns text_quality already hash-matches. Features
# with zero training std (constant in the corpus) carry no term —
# MLlib StandardScalerModel semantics, mirrored by score_quality_linear.
PINNED_QUALITY_MODEL = {
    "features": [
        "n_tokens", "avg_token_len", "punct_ratio", "digit_ratio",
        "stopword_ratio", "dup_line_ratio", "rep_2gram_ratio",
        "top_token_ratio",
    ],
    "means": [
        55.87800000000001, 5.471419872000001, 0.0, 0.0,
        0.06608505999999999, 0.0, 0.028373607999999984,
        0.10044767800000004,
    ],
    "stds": [
        26.093387010723287, 0.2044519825406473, 0.0, 0.0,
        0.03895128278912309, 0.0, 0.02641709095444323,
        0.032892013177366244,
    ],
    "coefficients": [
        -0.00048079691206903767, -0.24847780736046182, 0.0, 0.0,
        3.899124253797077, 0.0, 0.14495423790596634,
        -0.05644170807057018,
    ],
    "intercept": 0.23517063831289584,
}


def _quality_z_sql() -> str:
    """The oracle's logit expression, generated FROM the pinned model
    so the two sides cannot drift: same feature order, same left-to-
    right association, same skip-zero-std rule, full-precision repr
    literals (shortest round-trip decimal -> identical doubles)."""
    feature_sql = {
        "n_tokens": "round(CAST(n_tokens AS DOUBLE), 6)",
        "avg_token_len": "round(avg_tok, 6)",
        "punct_ratio": "round(punct_ratio, 6)",
        "digit_ratio": "round(digit_ratio, 6)",
        "stopword_ratio": "round(stop_ratio, 6)",
        "dup_line_ratio": "round(dup_line, 6)",
        "rep_2gram_ratio": "round(rep_2gram, 6)",
        "top_token_ratio": "round(top_tok, 6)",
    }
    p = PINNED_QUALITY_MODEL
    expr = repr(p["intercept"])
    for name, w, m, s in zip(
        p["features"], p["coefficients"], p["means"], p["stds"]
    ):
        if s == 0.0:
            continue
        expr += f" + ({w!r}) * (({feature_sql[name]} - ({m!r})) / ({s!r}))"
    return expr


SQL_QUALITY_SCORE = f"""
{_TEXT_QUALITY_CTE}
, z AS (SELECT doc_id, {_quality_z_sql()} AS zv FROM r)
SELECT doc_id, round(zv, 6) + 0.0 AS quality_logit,
       CAST(zv >= 0 AS INT) AS keep
FROM z
"""


def _lang_values_sql() -> str:
    rows = []
    for lang in sorted(textops.LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in textops.LANG_STOPWORDS[lang])
        rows.append(f"('{lang}', [{words}])")
    return ", ".join(rows)


SQL_TEXT_PROFILE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN len(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g'), '[ \t\n\x0b\f\r]+') END AS tk
  FROM documents),
scored AS (
  SELECT doc_id, lang,
         CASE WHEN len(tk) > 0
              THEN len(list_filter(tk, w -> list_contains(sw, lower(w))))::DOUBLE / len(tk)
              ELSE 0.0 END AS score
  FROM toks, (VALUES {_lang_values_sql()}) AS langs(lang, sw)),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM scored)
SELECT b.doc_id,
       CASE WHEN score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
       round(score, 6) AS lang_score,
       CASE WHEN len(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g')) = 0 THEN 0
            ELSE len(string_split_regex(regexp_replace(text, '^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$', '', 'g'), '[ \t\n\x0b\f\r]+')) END AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r])'))
         AS n_bpe_tokens,
       md5(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fingerprint
FROM best b JOIN documents d ON b.doc_id = d.doc_id
WHERE rn = 1
"""


SQL_DOC_CHUNKS = """
SELECT doc_id, i AS chunk_idx, i * 150 AS chunk_start,
       length(substr(text, (i * 150 + 1)::INT, 200)) AS chunk_len,
       md5(substr(text, (i * 150 + 1)::INT, 200)) AS chunk_md5
FROM documents, unnest(range((length(text) - 1) // 150 + 1)) AS u(i)
WHERE length(text) > 0
"""


SQL_CONTAMINATION = r"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN substr(md5(doc_id::VARCHAR || 'contam'), 1, 8) < 'e6666666'
              THEN 'train' ELSE 'test' END AS split
  FROM documents),
sh AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(len(w) - 2),
                             i -> array_to_string(w[i+1:i+3], ' '))
         ELSE [array_to_string(w, ' ')] END)) AS shingle
  FROM (SELECT doc_id, split,
               string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS w
        FROM sp))
SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
       count(*) AS n_shared
FROM sh te JOIN sh tr USING (shingle)
WHERE te.split = 'test' AND tr.split = 'train'
GROUP BY 1, 2
HAVING count(*) >= 3
"""


SQL_KNN_JOIN = f"""
SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
         AS cosine,
       row_number() OVER (
         PARTITION BY q.vec_id
         ORDER BY round(list_cosine_similarity(
           c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) DESC, c.vec_id)
         AS rank
FROM embeddings c, embeddings q
WHERE q.vec_id < 3
QUALIFY rank <= 5
UNION ALL
SELECT -1 AS query_id, vec_id AS corpus_id,
       round(list_cosine_similarity(embedding::DOUBLE[], {_QV_SQL}), 6) AS cosine,
       row_number() OVER (ORDER BY
         round(list_cosine_similarity(embedding::DOUBLE[], {_QV_SQL}), 6) DESC,
         vec_id) AS rank
FROM embeddings
QUALIFY rank <= 10
"""


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
      >= 0.4
"""


# identical vectors: cosine = 1 − O(1e-16) (‖v‖² vs dot rounding),
# which rounds to 1.0 at 6dp on both engines — the oracle emits the
# literal; group membership is the same doc-id arithmetic
SQL_EMBEDDING_NEARDUP_LSH = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings a JOIN embeddings b
  ON (a.vec_id // 2) % 4096 = (b.vec_id // 2) % 4096
 AND a.vec_id < b.vec_id
"""


SQL_MINHASH_NEARDUP = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM documents a JOIN documents b
  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
"""


SQL_SIMHASH_NEARDUP = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id // 5 = b.doc_id // 5 AND a.doc_id < b.doc_id
"""


def _ivf_topk_sql() -> str:
    """Oracle generated FROM the pinned codebook: replays the cell
    kernel's score ``|c|² − 2·(x̂·c)`` (x̂ = x/max(‖x‖, 1e-12)) per
    centroid with first-min argmin, restricts to the probe cells the
    search derives from the SAME constants, then exact top-10 — so any
    drift in assignment, probing, or ranking breaks the hash. The two
    engines associate the 64-term dot differently (BLAS vs sequential);
    only a corpus row within ~1e-13 of a Voronoi face could flip, which
    the deterministic construction was verified not to contain at
    sf0.01/sf0.1."""
    import numpy as np

    from clustering_spark.pinned import IVF_CENTROIDS

    C = np.asarray(IVF_CENTROIDS, dtype=np.float64)
    qv = np.asarray(QUERY_VEC, dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    d2 = ((C - qn) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2)[:4]]
    return f"""
WITH {_pinned_cells_cte()}
SELECT vec_id, round(list_cosine_similarity(v, {_QV_SQL}), 6) AS cosine
FROM assigned WHERE cell IN ({", ".join(str(p) for p in probe)})
ORDER BY cosine DESC, vec_id LIMIT 10
"""


def _pinned_cells_cte() -> str:
    """Shared WITH-clause body assigning every embedding its cell from
    the frozen sf0.01 codebook — replays IVFIndex._cell_expr's score
    ``|c|² − 2·(x̂·c)`` (x̂ = x/max(‖x‖, 1e-12)) per centroid with
    first-min argmin. Used by the ivf_topk AND semantic_dedup_keep
    oracles so the two gates cannot drift on cell assignment."""
    import numpy as np

    from clustering_spark.pinned import IVF_CENTROIDS

    C = np.asarray(IVF_CENTROIDS, dtype=np.float64)
    c2 = (C**2).sum(axis=1)
    scores = ",\n           ".join(
        f"{c2[ci]!r} - 2.0 * list_inner_product(v, "
        "[" + ", ".join(repr(float(x)) for x in C[ci]) + "]) / nrm"
        for ci in range(len(C))
    )
    return f"""nn AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         greatest(sqrt(list_inner_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[])), 1e-12) AS nrm
  FROM embeddings WHERE embedding IS NOT NULL
), scored AS (
  SELECT vec_id, v,
         [{scores}] AS cellscores
  FROM nn
), assigned AS (
  SELECT vec_id, v,
         list_position(cellscores, list_min(cellscores)) - 1 AS cell
  FROM scored
)"""


def _pca_project_sql() -> str:
    """Oracle generated FROM the pinned PCA model: the effective
    whitened rows ``W_k' = W_k/√(λ_k+ε)`` and offsets ``c_k = μ·W_k'``
    are computed in float64 exactly as apply_pca does, then the SQL
    emits ``round(x·W_k' − c_k + 0.0, 6)`` — dot-minus-constant instead
    of dot-of-difference, equal up to summation association (verified
    at 6dp on sf0.01/sf0.1); ``+ 0.0`` is the signed-zero twin of the
    Spark side's nz()."""
    import numpy as np

    from clustering_spark.pinned import PCA_MODEL

    mean = np.asarray(PCA_MODEL["mean"], dtype=np.float64)
    comps = np.asarray(PCA_MODEL["components"], dtype=np.float64)
    scale = 1.0 / np.sqrt(
        np.asarray(PCA_MODEL["explained_variance"]) + PCA_MODEL["eps"]
    )
    W = comps * scale[:, None]
    cols = []
    for k in range(W.shape[0]):
        wlit = "[" + ", ".join(repr(float(x)) for x in W[k]) + "]"
        off = float(mean @ W[k])
        cols.append(
            f"round(list_inner_product(embedding::DOUBLE[], {wlit})"
            f" - {off!r} + 0.0, 6) AS pc{k + 1}"
        )
    return "SELECT vec_id,\n  " + ",\n  ".join(cols) + "\nFROM embeddings"


# the template skeleton reduces to: 8 drop-to-space tags/payloads, then
# '\n' (h1) 'Title' '\n' (/h1) '\n' (p) + text + '\n' (/p) ' ' ' ' —
# the oracle replays ONLY the whitespace passes (horizontal-run
# collapse, space-newline fusion, 3+-newline collapse, trim) on that
# skeleton around the raw text; regexp_replace 'g' = global, chr(10)
# spelled explicitly so the SQL survives dialect string-escape rules
SQL_STRIP_HTML = """
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          repeat(' ', 8) || chr(10) || 'Title' || chr(10) || chr(10)
            || text || chr(10) || '  ',
          '[ \t\x0B\f\r]+', ' ', 'g'),
        ' ?\n ?', chr(10), 'g'),
      '\n{3,}', chr(10) || chr(10), 'g'),
    '^[ \n]+|[ \n]+$', '', 'g') AS text
FROM documents
"""


_WARC_CRAWL_DIR = "/tmp/spark_graft_warc_crawl"


_WARC_N_RECORDS = 120   # gzip-member segment (the crawl wire layout)


_WARC_N_PLAIN = 30      # plain uncompressed segment (both layouts gated)


_WARC_N_WET_PER = 6     # WET conversion records appended per file (r16)


_WARC_N_WAT_PER = 4     # WAT metadata records appended per file (r16)


# the extracted text replays the SAME whitespace-pass skeleton as
# SQL_STRIP_HTML (see that oracle's derivation comment) around the
# arithmetic payload; record_idx counts ALL records in file order
# (restarting per file — plain.warc's records sit at construction ids
# >= _WARC_N_RECORDS but re-index from 0), so response i keeps its
# within-file index past the skipped request records
SQL_WARC_CRAWL = f"""
WITH idx AS (
  SELECT unnest(range({_WARC_N_RECORDS + _WARC_N_PLAIN})) AS i
),
resp AS (
  SELECT i,
         'warc doc ' || i || ' alpha' || (i * 7) % 13
           || ' beta' || (i * 3) % 11 AS payload
  FROM idx WHERE i % 6 <> 0
)
SELECT CASE WHEN i < {_WARC_N_RECORDS} THEN i
            ELSE i - {_WARC_N_RECORDS} END AS record_idx,
       'http://site' || (i % 5) || '.example/page/' || i AS url,
       CAST(CASE WHEN i % 10 = 3 THEN 404 ELSE 200 END AS BIGINT)
         AS http_status,
       CASE WHEN i % 6 = 5 THEN 'application/pdf'
            WHEN i % 6 = 4 THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
            ELSE 'text/html; charset=utf-8' END AS http_content_type,
       CASE WHEN i % 6 IN (4, 5) THEN payload  -- pdf/docx: verbatim
            ELSE regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               repeat(' ', 8) || chr(10) || 'Title' || chr(10) || chr(10)
                 || payload || chr(10) || '  ',
               '[ \t\x0B\f\r]+', ' ', 'g'),
             ' ?\n ?', chr(10), 'g'),
           '\n{{3,}}', chr(10) || chr(10), 'g'),
         '^[ \n]+|[ \n]+$', '', 'g') END AS text_plain
FROM resp
UNION ALL
-- WET conversion records (round 16): appended AFTER the main block of
-- each file, so their within-file record_idx continues past it
-- (crawl.warc.gz: 120..125, plain.warc: 30..35). Payload is the
-- crawler's extracted plain text — replayed verbatim from the
-- construction rule; every j % 5 = 2 payload carries one invalid
-- UTF-8 byte that make_valid_utf8 must degrade to U+FFFD (chr(65533))
SELECT CASE WHEN j < {_WARC_N_WET_PER} THEN {_WARC_N_RECORDS} + j
            ELSE {_WARC_N_PLAIN} + j - {_WARC_N_WET_PER} END,
       'http://wet' || (j % 5) || '.example/conv/' || j,
       NULL, NULL,
       'wet doc ' || j || ' gamma' || (j * 5) % 7
         || CASE WHEN j % 5 = 2 THEN chr(65533) ELSE '' END
FROM (SELECT unnest(range({2 * _WARC_N_WET_PER})) AS j)
UNION ALL
-- WAT metadata records: JSON kept as a STRING (the operator's pruning
-- contract); record_idx continues past the WET block (126..129 / 36..39);
-- every k % 4 = 3 title carries the invalid-byte degrade
SELECT CASE WHEN k < {_WARC_N_WAT_PER}
              THEN {_WARC_N_RECORDS + _WARC_N_WET_PER} + k
            ELSE {_WARC_N_PLAIN + _WARC_N_WET_PER} + k
                 - {_WARC_N_WAT_PER} END,
       'http://wat' || (k % 5) || '.example/meta/' || k,
       NULL, NULL,
       '{{"k":' || k || ',"title":"wat doc ' || k
         || CASE WHEN k % 4 = 3 THEN chr(65533) ELSE '' END || '"}}'
FROM (SELECT unnest(range({2 * _WARC_N_WAT_PER})) AS k)
UNION ALL
SELECT -1, '__corrupt__', NULL, NULL,
       'ValueError: expected WARC version line at byte 0'
"""


# The within-cell pair predicate, shared between the oracle below and
# the hop-budget guard (tests/test_closure_hop_guard.py) so the guard
# can never drift from the oracle's edge definition. Requires the
# `assigned` CTE from _pinned_cells_cte() in scope.
SQL_SEMANTIC_PAIRS = """
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
"""


# Hop budgets of the doubled closures (e1->e2->e4 is 4 hops,
# ->e8 is 8): SOUND only while every component's min node reaches
# all members within the budget on the gate corpora. The guard test
# asserts exactly that per corpus, so a regenerated/larger corpus
# fails with a clear message instead of an opaque hash mismatch
# (round-13 advisor finding).
NGRAM_CLOSURE_HOPS = 4


SEMANTIC_CLOSURE_HOPS = 8


def _semantic_dedup_keep_sql() -> str:
    """Oracle generated from the pinned codebook: cells (shared CTE
    with ivf_topk) -> within-cell pairs at cosine >= 0.4 -> symmetric
    closure -> min-reachable-label components -> min-id survivors.
    NULL-id/vector rows would survive unconditionally on the Spark
    side; the tables carry none, and the cells CTE's NULL filter
    mirrors the operator's.

    Round 13: the closure is HOP-DOUBLED (e1 -> e2 -> e4 -> e8, three
    bounded self-joins covering paths up to 8 edges) instead of a
    WITH RECURSIVE fixpoint — DuckDB's recursion limit failed the
    unbounded form at sf0.1 (the one red oracle in the r12 10x
    checkpoint) while the operator itself was fine. The bound is
    sound for the gate corpora: measured max eccentricity of each
    component's min node is 1/3/3 at sf0.001/0.01/0.1 (components of
    size <= 5), so 8 hops carries every min label with >2x margin."""
    return f"""
WITH {_pinned_cells_cte()},
pairs AS MATERIALIZED ({SQL_SEMANTIC_PAIRS}),
e1 AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
e2 AS MATERIALIZED (
  SELECT u, v FROM e1
  UNION
  SELECT a.u, b.v FROM e1 a JOIN e1 b ON a.v = b.u AND a.u <> b.v
),
e4 AS MATERIALIZED (
  SELECT u, v FROM e2
  UNION
  SELECT a.u, b.v FROM e2 a JOIN e2 b ON a.v = b.u AND a.u <> b.v
),
e8 AS MATERIALIZED (
  SELECT u, v FROM e4
  UNION
  SELECT a.u, b.v FROM e4 a JOIN e4 b ON a.v = b.u AND a.u <> b.v
),
comp AS (SELECT u AS node, least(min(v), u) AS comp FROM e8 GROUP BY u)
SELECT e.vec_id
FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
WHERE e.vec_id = coalesce(c.comp, e.vec_id)
"""



def _bpe_ids_sql() -> str:
    """Oracle for the BPE id layer + packing chain (round 15): does
    NOT re-run BPE — it replays ids from the pinned (pre-token form
    -> vocab ids) GOLDEN (pinned.BPE_WORD_IDS, captured once at model
    freeze), maps every corpus word through it (word-initial form at
    p=1, leading-space form after — the GPT-2 pretokenizer keeps the
    space on the token), truncates to the first 8 ids per doc, and
    derives the packing layout from ARITHMETIC: with every doc
    budgeted at exactly 9 tokens (8 ids + EOS) and max_tokens=36 in
    one bucket, FFD degenerates to doc-rank // 4, member ordinal to
    doc-rank % 4, and each member owns positions ord*9..ord*9+8 with
    EOS last; positions 36..39 are PAD with owner -1. The corpus word
    set is CLOSED (31 words, every SF) — a regenerated corpus with
    new words drops rows at the join and fails the gate loudly, same
    posture as the closure hop guard. Likewise the doc count is 4-
    divisible at every SF (500/500/5000); a regeneration breaking
    that leaves Spark's final partial pack (fewer members, more pads)
    against this oracle's full-pack arithmetic — loud, not silent."""
    from clustering_spark.pinned import BPE_WORD_IDS

    vals = ",\n    ".join(
        f"({f!r}, {i + 1}, {tid})"
        for f, ids in BPE_WORD_IDS.items()
        for i, tid in enumerate(ids)
    ).replace('"', "'")
    return f"""
WITH lk(form, tpos, id) AS (VALUES
    {vals}),
ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS wd,
               generate_subscripts(w, 1) AS p FROM ws),
forms AS (SELECT doc_id, p,
                 CASE WHEN p = 1 THEN wd ELSE ' ' || wd END AS form
          FROM tok),
flat AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY p, tpos) AS r,
         id
  FROM forms JOIN lk USING (form)),
dr AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS dn
       FROM ws),
tokrows AS (
  SELECT dr.dn // 4 AS pack_id, (dr.dn % 4)::INT AS doc_ord,
         ((dr.dn % 4) * 9 + f.r - 1)::INT AS pos, f.id AS token_id
  FROM flat f JOIN dr ON f.doc_id = dr.doc_id WHERE f.r <= 8),
eosrows AS (
  SELECT dn // 4 AS pack_id, (dn % 4)::INT AS doc_ord,
         ((dn % 4) * 9 + 8)::INT AS pos, 2 AS token_id FROM dr),
padrows AS (
  SELECT p.pack_id, -1 AS doc_ord, (36 + g.k)::INT AS pos,
         1 AS token_id
  FROM (SELECT DISTINCT dn // 4 AS pack_id FROM dr) p
  CROSS JOIN (SELECT unnest(range(4)) AS k) g)
SELECT pack_id, 4::BIGINT AS n_docs, 36 AS n_real_tokens,
       FALSE AS overflow, pos, token_id, doc_ord
FROM (SELECT * FROM tokrows
      UNION ALL SELECT * FROM eosrows
      UNION ALL SELECT * FROM padrows)
"""


SQL_BPE_IDS = _bpe_ids_sql()

package graft

/** DuckDB oracle SQL for the relational showcase queries ([[graft.operators.Relational]]).
  * Decimal-sum discipline mirrored: CAST each row value to DECIMAL(18,4),
  * SUM exactly, CAST the result to DOUBLE. */
object RelationalOracles {

  private def dec(e: String) = s"CAST($e AS DECIMAL(18,2))"
  private val one = "CAST(1 AS DECIMAL(18,2))"
  private def dsum(e: String) = s"CAST(SUM($e) AS DOUBLE)"

  val sql: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${dsum(dec("l_quantity"))} AS sum_qty,
         |       ${dsum(dec("l_extendedprice"))} AS sum_base_price,
         |       ${dsum(s"${dec("l_extendedprice")} * ($one - ${dec("l_discount")})")} AS sum_disc_price,
         |       ${dsum(s"${dec("l_extendedprice")} * ($one - ${dec("l_discount")}) * ($one + ${dec("l_tax")})")} AS sum_charge,
         |       CAST(COUNT(*) AS BIGINT) AS count_order
         |  FROM '<sfDir>/lineitem.parquet'
         | WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         | GROUP BY l_returnflag, l_linestatus
         | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_revenue" ->
      s"""SELECT n.n_name,
         |       ${dsum(s"${dec("l.l_extendedprice")} * ($one - ${dec("l.l_discount")})")} AS revenue,
         |       CAST(COUNT(*) AS BIGINT) AS n_lineitems
         |  FROM '<sfDir>/lineitem.parquet' l
         |  JOIN '<sfDir>/orders.parquet' o ON l.l_orderkey = o.o_orderkey
         |  JOIN '<sfDir>/customer.parquet' c ON o.o_custkey = c.c_custkey
         |  JOIN '<sfDir>/nation.parquet' n ON c.c_nationkey = n.n_nationkey
         | GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_top_orders" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
         |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         |    FROM '<sfDir>/orders.parquet')
         | WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts
         |             FROM '<sfDir>/events.parquet'),
         |s1 AS (SELECT user_id, MIN(ts) AS t_view FROM e
         |        WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM e
         |         JOIN s1 USING (user_id)
         |        WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY 1),
         |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM e
         |         JOIN s2 USING (user_id)
         |        WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY 1)
         |SELECT s1.user_id, s1.t_view,
         |       CAST(1 + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
         |              + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth,
         |       COALESCE(s2.t_click, -1) AS t_click,
         |       COALESCE(s3.t_purchase, -1) AS t_purchase
         |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         | ORDER BY user_id""".stripMargin,
    "q_transitions" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts, event_id
         |             FROM '<sfDir>/events.parquet'),
         |t AS (SELECT event_type AS src,
         |             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst,
         |             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ts AS gap_us
         |        FROM e)
         |SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
         |  FROM t WHERE dst IS NOT NULL
         | GROUP BY src, dst ORDER BY src, dst""".stripMargin,
    // Markov-2 event trigrams: same per-user total order as q_transitions,
    // conditional p as count-over-context (one division)
    "q_trigrams" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts, event_id
         |             FROM '<sfDir>/events.parquet'),
         |t AS (SELECT event_type AS t1,
         |             LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         |             LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
         |        FROM e),
         |tri AS (SELECT t1, t2, t3 FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL),
         |cx AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS ctx FROM tri GROUP BY 1, 2),
         |c3 AS (SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
         |         FROM tri GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5)
         |SELECT c3.t1, c3.t2, c3.t3, c3.n, cx.ctx,
         |       CAST(c3.n AS DOUBLE) / CAST(cx.ctx AS DOUBLE) AS p
         |  FROM c3 JOIN cx ON c3.t1 = cx.t1 AND c3.t2 = cx.t2
         | ORDER BY c3.t1, c3.t2, c3.t3""".stripMargin,
    // gaps-and-islands: day - row_number is constant within a run
    "q_streaks" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |                   epoch_ns(ts) // 86400000000000 AS day
         |              FROM '<sfDir>/events.parquet'),
         |i AS (SELECT user_id, day,
         |             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
         |        FROM ud),
         |g AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
         |        FROM i GROUP BY 1, 2)
         |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
         |       CAST(COUNT(*) AS BIGINT) AS n_streaks, MAX(len) AS max_streak
         |  FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    // day-partitioned sweep line: clamped segments, deltas netted per
    // instant, peak = max prefix sum
    "q_concurrency" ->
      s"""WITH iv AS (SELECT epoch_ns(ts) AS s,
         |                   epoch_ns(ts) + 1800000000000 AS e
         |              FROM '<sfDir>/events.parquet'),
         |seg AS (SELECT day,
         |               GREATEST(s, day * 86400000000000) AS cs,
         |               LEAST(e, (day + 1) * 86400000000000) AS ce
         |          FROM (SELECT s, e,
         |                       unnest(generate_series(s // 86400000000000,
         |                                              (e - 1) // 86400000000000)) AS day
         |                  FROM iv)),
         |d AS (SELECT day, cs AS t, CAST(1 AS BIGINT) AS d FROM seg
         |      UNION ALL
         |      SELECT day, ce AS t, CAST(-1 AS BIGINT) AS d FROM seg),
         |nd AS (SELECT day, t, CAST(SUM(d) AS BIGINT) AS nd FROM d GROUP BY 1, 2),
         |r AS (SELECT day, SUM(nd) OVER (PARTITION BY day ORDER BY t
         |                                ROWS UNBOUNDED PRECEDING) AS run
         |        FROM nd),
         |p AS (SELECT day, CAST(MAX(run) AS BIGINT) AS peak FROM r GROUP BY day),
         |c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_intervals
         |        FROM seg GROUP BY day)
         |SELECT c.day, c.n_intervals, p.peak
         |  FROM c JOIN p USING (day) ORDER BY c.day""".stripMargin,
    // Lorenz/Pareto deciles over per-user activity, cumulative share as
    // one division per curve row
    "q_pareto" ->
      s"""WITH ue AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
         |              FROM '<sfDir>/events.parquet' GROUP BY user_id),
         |r AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY n DESC, user_id) AS BIGINT) AS decile
         |        FROM ue),
         |b AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         |             CAST(SUM(n) AS BIGINT) AS n_events FROM r GROUP BY decile),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM ue),
         |cg AS (SELECT decile, n_users, n_events,
         |              CAST(SUM(n_events) OVER (ORDER BY decile
         |                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events
         |         FROM b)
         |SELECT decile, n_users, n_events, cum_events,
         |       CAST(cum_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share
         |  FROM cg, t ORDER BY decile""".stripMargin,
    "q_cohorts" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS week
         |             FROM '<sfDir>/events.parquet'),
         |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1)
         |SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
         |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
         |  FROM e JOIN c USING (user_id)
         | GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    // DAU/WAU stickiness: each active (user, day) covers days d..d+6, so
    // the trailing-7-day distinct is one explode + distinct count
    "q_stickiness" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |                   epoch_ns(ts) // 86400000000000 AS day
         |              FROM '<sfDir>/events.parquet'),
         |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
         |          FROM ud GROUP BY day),
         |wau AS (SELECT day + o.i AS day,
         |               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
         |          FROM ud, LATERAL unnest(generate_series(0, 6)) AS o(i)
         |         GROUP BY 1)
         |SELECT dau.day, dau.dau, wau.wau,
         |       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
         |  FROM dau JOIN wau ON dau.day = wau.day
         | ORDER BY dau.day""".stripMargin,
    "q_bloom_join" ->
      s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
         |       ${dsum(dec("l_extendedprice"))} AS revenue
         |  FROM '<sfDir>/lineitem.parquet' l
         | WHERE EXISTS (SELECT 1 FROM '<sfDir>/orders.parquet' o
         |                WHERE o.o_orderkey = l.l_orderkey
         |                  AND o.o_totalprice > 450000.0)
         | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scd2" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts, event_id
         |             FROM '<sfDir>/events.parquet'),
         |m AS (SELECT user_id, event_type, ts, event_id,
         |             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |        FROM e),
         |ch AS (SELECT user_id, event_type, ts, event_id FROM m
         |        WHERE prev IS NULL OR prev <> event_type)
         |SELECT user_id,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
         |       event_type AS state, ts AS valid_from,
         |       COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1, -1) AS valid_to
         |  FROM ch ORDER BY user_id, version""".stripMargin,
    "q_routed_join" ->
      s"""SELECT n.n_name,
         |       ${dsum(s"${dec("l.l_extendedprice")} * ($one - ${dec("l.l_discount")})")} AS revenue,
         |       CAST(COUNT(*) AS BIGINT) AS n_items
         |  FROM '<sfDir>/lineitem.parquet' l
         |  JOIN '<sfDir>/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
         |  JOIN '<sfDir>/nation.parquet' n ON s.s_nationkey = n.n_nationkey
         | GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q_dq_audit" ->
      s"""SELECT * FROM (
         |  SELECT 'orders_fk_customer' AS check_name,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/orders.parquet') AS n_rows,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/orders.parquet' o
         |           WHERE NOT EXISTS (SELECT 1 FROM '<sfDir>/customer.parquet' c
         |                              WHERE c.c_custkey = o.o_custkey)) AS n_bad
         |  UNION ALL
         |  SELECT 'lineitem_fk_orders',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet' l
         |           WHERE NOT EXISTS (SELECT 1 FROM '<sfDir>/orders.parquet' o
         |                              WHERE o.o_orderkey = l.l_orderkey))
         |  UNION ALL
         |  SELECT 'customer_pk_unique',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/customer.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
         |            SELECT c_custkey FROM '<sfDir>/customer.parquet'
         |             GROUP BY 1 HAVING COUNT(*) > 1))
         |  UNION ALL
         |  SELECT 'orders_pk_unique',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/orders.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
         |            SELECT o_orderkey FROM '<sfDir>/orders.parquet'
         |             GROUP BY 1 HAVING COUNT(*) > 1))
         |  UNION ALL
         |  SELECT 'lineitem_discount_domain',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet'
         |           WHERE l_discount < 0.0 OR l_discount > 1.0)
         |  UNION ALL
         |  SELECT 'lineitem_qty_positive',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/lineitem.parquet'
         |           WHERE l_quantity <= 0.0)
         |  UNION ALL
         |  SELECT 'events_props_present',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/events.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/events.parquet'
         |           WHERE props IS NULL OR props = '')
         |  UNION ALL
         |  SELECT 'events_ts_in_window',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/events.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/events.parquet'
         |           WHERE epoch_ns(ts) < 1704067200000000000
         |              OR epoch_ns(ts) >= 1706745600000000000)
         |  UNION ALL
         |  SELECT 'docs_text_nonempty',
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/documents.parquet'),
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/documents.parquet'
         |           WHERE text IS NULL OR length(text) = 0)
         |) ORDER BY check_name""".stripMargin,
    "q_hopping" ->
      s"""SELECT win, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       ${dsum("CAST(value AS DECIMAL(18,6))")} AS total_value
         |  FROM (SELECT unnest([epoch_ns(ts) // 3600000000000 - 1,
         |                      epoch_ns(ts) // 3600000000000]) AS win, value
         |          FROM '<sfDir>/events.parquet')
         | GROUP BY win ORDER BY win""".stripMargin,
    "q_value_histogram" ->
      s"""SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS qsum
         |  FROM '<sfDir>/events.parquet' GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_events_ts" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts,
         |       CAST(SUM(epoch_us(ts) - 1704067200000000) AS BIGINT) AS us_checksum
         |  FROM '<sfDir>/events.parquet'""".stripMargin,
    "q_events_daily" ->
      s"""SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       ${dsum("CAST(value AS DECIMAL(18,6))")} AS total_value,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |  FROM '<sfDir>/events.parquet'
         | GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "q_sessions" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id
         |             FROM '<sfDir>/events.parquet'),
         |marked AS (SELECT user_id, ts, event_id,
         |                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         |                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |                       THEN 1 ELSE 0 END AS new_session
         |             FROM e),
         |numbered AS (SELECT user_id, ts,
         |                    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         |               FROM marked)
         |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(MIN(ts) AS BIGINT) AS session_start,
         |       CAST(MAX(ts) - MIN(ts) AS BIGINT) AS duration_us
         |  FROM numbered GROUP BY user_id, session_no
         | ORDER BY user_id, session_no""".stripMargin,
    // session-shape rollup over the SAME sessionization chain as
    // q_sessions: log2 event-count bands, exact per-band median duration
    "q_session_stats" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id
         |             FROM '<sfDir>/events.parquet'),
         |marked AS (SELECT user_id, ts, event_id,
         |                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         |                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |                       THEN 1 ELSE 0 END AS new_session
         |             FROM e),
         |numbered AS (SELECT user_id, ts,
         |                    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         |               FROM marked),
         |s AS (SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events,
         |             CAST(MAX(ts) - MIN(ts) AS BIGINT) AS duration_us
         |        FROM numbered GROUP BY user_id, session_no)
         |SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS band,
         |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |       CAST(SUM(n_events) AS BIGINT) AS n_events,
         |       CAST(MAX(duration_us) AS BIGINT) AS max_dur_us,
         |       CAST(quantile_disc(duration_us, 0.5) AS BIGINT) AS med_dur_us
         |  FROM s GROUP BY 1 ORDER BY band""".stripMargin,
    "q_dedup_keep" ->
      s"""SELECT doc_id FROM (SELECT MIN(doc_id) AS doc_id
         |  FROM '<sfDir>/documents.parquet' GROUP BY text) ORDER BY doc_id""".stripMargin,
    "q_vocab" ->
      s"""SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
         |       CAST(COUNT(*) AS BIGINT) AS cf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |          FROM '<sfDir>/documents.parquet')
         | GROUP BY tok ORDER BY tok""".stripMargin,
    "q_vocab_coverage" ->
      s"""WITH v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
         |             FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |                     FROM '<sfDir>/documents.parquet')
         |            GROUP BY tok),
         |r AS (SELECT cf, CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS BIGINT) AS rk
         |        FROM v),
         |tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total_cf FROM v),
         |ks AS (SELECT unnest([100, 1000, 10000]) AS k)
         |SELECT CAST(ks.k AS BIGINT) AS k,
         |       CAST(SUM(r.cf) AS BIGINT) AS top_cf,
         |       tot.total_cf,
         |       CAST(SUM(r.cf) AS DOUBLE) / CAST(tot.total_cf AS DOUBLE) AS coverage
         |  FROM ks, r, tot WHERE r.rk <= ks.k
         | GROUP BY ks.k, tot.total_cf ORDER BY k""".stripMargin,
    "q_bpe_pairs" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
         |                FROM '<sfDir>/documents.parquet'),
         |p AS (SELECT substr(tok, CAST(u.i AS INTEGER), 2) AS pair
         |        FROM toks, LATERAL unnest(generate_series(1, length(tok)-1)) AS u(i)
         |       WHERE length(tok) >= 2),
         |pc AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_count FROM p GROUP BY pair),
         |tot AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS total_pairs FROM pc)
         |SELECT pair, pair_count,
         |       CAST(pair_count AS DOUBLE) / CAST(tot.total_pairs AS DOUBLE) AS pair_frac
         |  FROM pc, tot
         | ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,
    "q_bpe_merges" -> graft.operators.Bpe.oracleSql(),
    "q_bpe_encode" -> graft.operators.Bpe.encodeOracleSql(),
    // PII scan + scrub fingerprint; patterns are RE2∩Java so both engines
    // match identically, replacement order pinned email→ip→digit-run
    "q_pii_scan" ->
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS BIGINT) AS n_ips,
         |       CAST(len(regexp_extract_all(text, '\\d{6,}')) AS BIGINT) AS n_digit_runs,
         |       CAST(('0x' || substr(md5(
         |         regexp_replace(
         |           regexp_replace(
         |             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |             '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g'),
         |           '\\d{6,}', '<NUM>', 'g')), 1, 15)) AS BIGINT) AS scrub_fp
         |  FROM '<sfDir>/documents.parquet' ORDER BY doc_id""".stripMargin,
    // char-distribution entropy in whole bits (floor_log2 integer
    // discipline), mirroring TextAnalysis.charEntropy cast-for-cast
    "q_doc_entropy" ->
      s"""WITH ch AS (SELECT doc_id, substr(text, CAST(u.i AS INTEGER), 1) AS c
         |              FROM '<sfDir>/documents.parquet',
         |                   LATERAL unnest(generate_series(1, length(text))) AS u(i)
         |             WHERE length(text) >= 1),
         |cc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS m FROM ch GROUP BY doc_id, c),
         |n AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_chars FROM cc GROUP BY doc_id),
         |g AS (SELECT cc.doc_id, n.n_chars,
         |             CAST(SUM(cc.m * ((length(bin(n.n_chars)) - 1) -
         |                              (length(bin(cc.m)) - 1))) AS BIGINT) AS entropy_bits
         |        FROM cc JOIN n ON cc.doc_id = n.doc_id
         |       GROUP BY cc.doc_id, n.n_chars)
         |SELECT doc_id, n_chars, entropy_bits,
         |       CAST(entropy_bits AS DOUBLE) / CAST(n_chars AS DOUBLE) AS bits_per_char
         |  FROM g ORDER BY doc_id""".stripMargin,
    "q_doc_meta" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_ids,
         |       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
         |       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
         |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |       CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_nchars
         |  FROM '<sfDir>/documents.parquet'""".stripMargin,
    "q_emb_dims" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_ids,
         |       CAST(MIN(len(embedding)) AS BIGINT) AS min_dim,
         |       CAST(MAX(len(embedding)) AS BIGINT) AS max_dim,
         |       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
         |       CAST(SUM(FLOOR(CAST(embedding[1] AS DOUBLE) * 1024.0)) AS BIGINT) AS probe_sum
         |  FROM '<sfDir>/embeddings.parquet'""".stripMargin,
    // per-dimension embedding moments: 0-based dim mirrors posexplode;
    // quantized int64 moment sums, exact double min/max, one IEEE mean
    "q_dim_stats" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb
         |             FROM '<sfDir>/embeddings.parquet'),
         |x AS (SELECT CAST(d - 1 AS BIGINT) AS dim,
         |             emb[CAST(d AS INT)] AS v,
         |             CAST(FLOOR(emb[CAST(d AS INT)] * 1024.0) AS BIGINT) AS q
         |        FROM e, LATERAL unnest(generate_series(1, len(emb))) AS u(d)),
         |g AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(q) AS BIGINT) AS q_sum,
         |             CAST(SUM(q * q) AS BIGINT) AS q2_sum,
         |             MIN(v) AS min_v, MAX(v) AS max_v
         |        FROM x GROUP BY dim)
         |SELECT dim, n, q_sum, q2_sum, min_v, max_v,
         |       CAST(q_sum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q
         |  FROM g ORDER BY dim""".stripMargin,
    // bigram conditional surprisal in whole bits (floor_log2 via integer
    // bit lengths), mirroring TextAnalysis.lmScore cast-for-cast
    "q_lm_score" ->
      s"""WITH a AS (SELECT doc_id, string_split(text, ' ') AS toks
         |             FROM '<sfDir>/documents.parquet'
         |            WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (SELECT doc_id,
         |              toks[CAST(u.i AS INTEGER)] AS w1,
         |              toks[CAST(u.i AS INTEGER) + 1] AS w2
         |         FROM a, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)),
         |dbg AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m
         |          FROM bg GROUP BY doc_id, w1, w2),
         |cab AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c_ab FROM dbg GROUP BY w1, w2),
         |ca AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY w1),
         |g AS (SELECT dbg.doc_id,
         |             CAST(SUM(dbg.m) AS BIGINT) AS n_bigrams,
         |             CAST(SUM(dbg.m * ((length(bin(ca.c_a)) - 1) -
         |                               (length(bin(cab.c_ab)) - 1))) AS BIGINT) AS cond_bits
         |        FROM dbg
         |        JOIN cab ON dbg.w1 = cab.w1 AND dbg.w2 = cab.w2
         |        JOIN ca ON dbg.w1 = ca.w1
         |       GROUP BY dbg.doc_id)
         |SELECT doc_id, n_bigrams, cond_bits,
         |       CAST(cond_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS bits_per_bigram
         |  FROM g ORDER BY doc_id""".stripMargin,
    // held-out LM: bigram counts trained on the 80% hash split, scoring
    // the eval 20%; OOV reported, whole-bit integer surprisal
    "q_holdout_ppl" ->
      s"""WITH sided AS (SELECT doc_id, text,
         |                      (${graft.functions.Hashes.h60Sql("CAST(doc_id AS VARCHAR)")} % 10 < 8) AS is_tr
         |                 FROM '<sfDir>/documents.parquet'),
         |a AS (SELECT doc_id, string_split(text, ' ') AS toks, is_tr
         |        FROM sided WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (SELECT doc_id, is_tr,
         |              toks[CAST(u.i AS INTEGER)] AS w1,
         |              toks[CAST(u.i AS INTEGER) + 1] AS w2
         |         FROM a, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)),
         |cab AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
         |          FROM bg WHERE is_tr GROUP BY 1, 2),
         |ca AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
         |ev AS (SELECT bg.doc_id, cab.c_ab, ca.c_a
         |         FROM bg
         |         LEFT JOIN cab ON bg.w1 = cab.w1 AND bg.w2 = cab.w2
         |         LEFT JOIN ca ON bg.w1 = ca.w1
         |        WHERE NOT bg.is_tr),
         |g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |             CAST(SUM(CASE WHEN c_ab IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |             CAST(SUM(CASE WHEN c_ab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |             CAST(SUM(CASE WHEN c_ab IS NOT NULL
         |                          THEN (length(bin(c_a)) - 1) - (length(bin(c_ab)) - 1)
         |                          ELSE 0 END) AS BIGINT) AS cond_bits
         |        FROM ev GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, n_scored, n_oov, cond_bits,
         |       CASE WHEN n_scored > 0
         |            THEN CAST(cond_bits AS DOUBLE) / CAST(n_scored AS DOUBLE)
         |       END AS bits_per_scored
         |  FROM g ORDER BY doc_id""".stripMargin,
    // CCNet-style per-lang perplexity terciles over the SAME lm chain as
    // q_lm_score (whole-bit conditional surprisal), ntile(3) on the total
    // order (bits_per_bigram, doc_id)
    "q_ccnet_buckets" ->
      s"""WITH a AS (SELECT doc_id, string_split(text, ' ') AS toks
         |             FROM '<sfDir>/documents.parquet'
         |            WHERE len(string_split(text, ' ')) >= 2),
         |bg AS (SELECT doc_id,
         |              toks[CAST(u.i AS INTEGER)] AS w1,
         |              toks[CAST(u.i AS INTEGER) + 1] AS w2
         |         FROM a, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)),
         |dbg AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m
         |          FROM bg GROUP BY doc_id, w1, w2),
         |cab AS (SELECT w1, w2, CAST(SUM(m) AS BIGINT) AS c_ab FROM dbg GROUP BY w1, w2),
         |ca AS (SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY w1),
         |g AS (SELECT dbg.doc_id,
         |             CAST(SUM(dbg.m) AS BIGINT) AS n_bigrams,
         |             CAST(SUM(dbg.m * ((length(bin(ca.c_a)) - 1) -
         |                               (length(bin(cab.c_ab)) - 1))) AS BIGINT) AS cond_bits
         |        FROM dbg
         |        JOIN cab ON dbg.w1 = cab.w1 AND dbg.w2 = cab.w2
         |        JOIN ca ON dbg.w1 = ca.w1
         |       GROUP BY dbg.doc_id),
         |s AS (SELECT g.doc_id, d.lang, g.n_bigrams,
         |             CAST(g.cond_bits AS DOUBLE) / CAST(g.n_bigrams AS DOUBLE) AS bits_per_bigram
         |        FROM g JOIN '<sfDir>/documents.parquet' d ON g.doc_id = d.doc_id)
         |SELECT doc_id, lang, n_bigrams, bits_per_bigram,
         |       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |  FROM (SELECT *, NTILE(3) OVER (PARTITION BY lang
         |                                 ORDER BY bits_per_bigram, doc_id) AS t
         |          FROM s)
         | ORDER BY doc_id""".stripMargin,
    "q_tok_lengths" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
         |                FROM '<sfDir>/documents.parquet')
         |SELECT CAST(length(tok) AS BIGINT) AS tok_len,
         |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
         |  FROM toks GROUP BY tok_len ORDER BY tok_len""".stripMargin,
    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       ${dsum(dec("l_quantity"))} AS sum_qty
         |  FROM '<sfDir>/lineitem.parquet'
         | GROUP BY ROLLUP (l_returnflag, l_linestatus)
         | ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    // SCD-1 upsert: latest-per-user windows either side of the split
    // instant, full-outer merged with insert/update/keep provenance —
    // mirrors Relational.userProfileUpsert (same tiebreak, same coalesce
    // precedence, value untouched)
    "q_upsert" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value, ts
         |             FROM '<sfDir>/events.parquet'),
         |b AS (SELECT user_id, event_id, event_type, value FROM (
         |        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |                    ORDER BY ts DESC, event_id DESC) AS rn
         |          FROM e WHERE ts < TIMESTAMP '2024-01-21 00:00:00') WHERE rn = 1),
         |u AS (SELECT user_id, event_id, event_type, value FROM (
         |        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |                    ORDER BY ts DESC, event_id DESC) AS rn
         |          FROM e WHERE ts >= TIMESTAMP '2024-01-21 00:00:00') WHERE rn = 1)
         |SELECT COALESCE(u.user_id, b.user_id) AS user_id,
         |       COALESCE(u.event_id, b.event_id) AS last_event_id,
         |       COALESCE(u.event_type, b.event_type) AS last_type,
         |       COALESCE(u.value, b.value) AS last_value,
         |       CASE WHEN u.user_id IS NOT NULL AND b.user_id IS NOT NULL THEN 'update'
         |            WHEN u.user_id IS NOT NULL THEN 'insert'
         |            ELSE 'keep' END AS action
         |  FROM b FULL OUTER JOIN u ON b.user_id = u.user_id
         | ORDER BY 1""".stripMargin,
    "q_semi_anti" ->
      s"""SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/customer.parquet' c
         |    WHERE EXISTS (SELECT 1 FROM '<sfDir>/orders.parquet' o
         |                   WHERE o.o_custkey = c.c_custkey)) AS n_with,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM '<sfDir>/customer.parquet' c
         |    WHERE NOT EXISTS (SELECT 1 FROM '<sfDir>/orders.parquet' o
         |                       WHERE o.o_custkey = c.c_custkey)) AS n_without""".stripMargin,
    "q_pivot" ->
      s"""SELECT source,
         |       CAST(SUM(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
         |       CAST(SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
         |       CAST(SUM(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
         |       CAST(SUM(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
         |       CAST(SUM(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
         |  FROM '<sfDir>/documents.parquet'
         | GROUP BY source ORDER BY source""".stripMargin,
    "q_rolling" ->
      s"""SELECT event_id, user_id,
         |       CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |              OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
         |       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_n
         |  FROM '<sfDir>/events.parquet'
         | ORDER BY event_id""".stripMargin,
    "q_setops" ->
      s"""WITH d AS (SELECT * FROM '<sfDir>/documents.parquet')
         |(SELECT doc_id FROM d WHERE lang = 'en'
         | UNION
         | SELECT doc_id FROM d WHERE source = 'src1')
         |INTERSECT
         |SELECT doc_id FROM d WHERE n_chars > 100
         |EXCEPT
         |SELECT doc_id FROM d WHERE source = 'src0'
         |ORDER BY doc_id""".stripMargin,
    "q_asof" ->
      s"""WITH od AS (SELECT o_custkey, o_orderdate,
         |                   MAX(o_orderkey) AS o_orderkey
         |              FROM '<sfDir>/orders.parquet' GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ev_us,
         |       od.o_orderkey, epoch_us(od.o_orderdate) AS ord_us
         |  FROM '<sfDir>/events.parquet' e
         |  ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
         | ORDER BY event_id""".stripMargin,
    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |             FROM '<sfDir>/documents.parquet'),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |r AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |             CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS weight,
         |             CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |                  ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC,
         |                           tf.tok) AS BIGINT) AS rank
         |        FROM tf JOIN df ON tf.tok = df.tok)
         |SELECT doc_id, tok, tf, df, weight, rank FROM r
         | WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // identical oracle as q1_pricing — the query IS q1 via the string-SQL
    // surface, so both engines' SQL must agree with the DataFrame plan too
    "q_sql_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${dsum(dec("l_quantity"))} AS sum_qty,
         |       ${dsum(dec("l_extendedprice"))} AS sum_base_price,
         |       ${dsum(s"${dec("l_extendedprice")} * ($one - ${dec("l_discount")})")} AS sum_disc_price,
         |       ${dsum(s"${dec("l_extendedprice")} * ($one - ${dec("l_discount")}) * ($one + ${dec("l_tax")})")} AS sum_charge,
         |       CAST(COUNT(*) AS BIGINT) AS count_order
         |  FROM '<sfDir>/lineitem.parquet'
         | WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         | GROUP BY l_returnflag, l_linestatus
         | ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_region" ->
      s"""SELECT r.r_name,
         |       ${dsum(s"${dec("l.l_extendedprice")} * ($one - ${dec("l.l_discount")})")} AS revenue,
         |       CAST(COUNT(*) AS BIGINT) AS n_lineitems
         |  FROM '<sfDir>/lineitem.parquet' l
         |  JOIN '<sfDir>/orders.parquet' o ON l.l_orderkey = o.o_orderkey
         |  JOIN '<sfDir>/customer.parquet' c ON o.o_custkey = c.c_custkey
         |  JOIN '<sfDir>/supplier.parquet' s
         |    ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         |  JOIN '<sfDir>/nation.parquet' n ON s.s_nationkey = n.n_nationkey
         |  JOIN '<sfDir>/region.parquet' r ON n.n_regionkey = r.r_regionkey
         | GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    "q_split" ->
      s"""SELECT doc_id,
         |       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8 THEN 'train'
         |            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 8 THEN 'val'
         |            ELSE 'test' END AS split
         |  FROM '<sfDir>/documents.parquet' ORDER BY doc_id""".stripMargin,
    "q_interval_join" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id
         |             FROM '<sfDir>/events.parquet')
         |SELECT a.user_id, a.event_id AS a, b.event_id AS b,
         |       CAST(b.t - a.t AS BIGINT) AS gap_us
         |  FROM e a JOIN e b
         |    ON a.user_id = b.user_id AND a.event_id < b.event_id
         |   AND abs(b.t - a.t) <= 300000000
         | ORDER BY a, b""".stripMargin,
    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       ${dsum(dec("l_quantity"))} AS sum_qty
         |  FROM '<sfDir>/lineitem.parquet'
         | GROUP BY CUBE (l_returnflag, l_linestatus)
         | ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    "q_cum_users" ->
      s"""WITH f AS (SELECT user_id,
         |                  MIN(epoch_ns(ts) // 86400000000000) AS day
         |             FROM '<sfDir>/events.parquet' GROUP BY user_id),
         |d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
         |        FROM f GROUP BY day)
         |SELECT day, new_users,
         |       CAST(SUM(new_users) OVER (ORDER BY day
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
         |  FROM d ORDER BY day""".stripMargin,
    "q_mode" ->
      s"""WITH g AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
         |             FROM '<sfDir>/events.parquet' GROUP BY 1, 2),
         |r AS (SELECT user_id, event_type, cnt,
         |             ROW_NUMBER() OVER (PARTITION BY user_id
         |                                ORDER BY cnt DESC, event_type ASC) AS rk
         |        FROM g)
         |SELECT user_id, event_type, cnt FROM r WHERE rk = 1
         | ORDER BY user_id""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT lang, source,
         |       CAST(GROUPING(lang) AS BIGINT) AS g_lang,
         |       CAST(GROUPING(source) AS BIGINT) AS g_src,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |  FROM '<sfDir>/documents.parquet'
         | GROUP BY GROUPING SETS ((lang, source), (lang), ())
         | ORDER BY g_lang, g_src, lang, source""".stripMargin,
    "q_lag_delta" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts
         |             FROM '<sfDir>/events.parquet'),
         |x AS (SELECT event_id, user_id,
         |             LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
         |             ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         |        FROM e)
         |SELECT event_id, user_id, prev_event_id, CAST(gap_us AS BIGINT) AS gap_us
         |  FROM x WHERE prev_event_id IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_percentiles" ->
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |       quantile_disc(value, 0.5) AS p50,
         |       quantile_disc(value, 0.9) AS p90,
         |       MIN(value) AS vmin, MAX(value) AS vmax
         |  FROM '<sfDir>/events.parquet'
         | GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact join cardinality from per-key histograms, with the identity
    // |A join B| = sum c_a*c_b riding in the gate
    "q_join_card" ->
      s"""WITH co AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
         |              FROM '<sfDir>/orders.parquet' GROUP BY 1),
         |cl AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
         |         FROM '<sfDir>/lineitem.parquet' GROUP BY 1),
         |est AS (SELECT CAST(SUM(ca * cb) AS BIGINT) AS est_rows
         |          FROM co JOIN cl ON co.k = cl.k),
         |act AS (SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
         |          FROM '<sfDir>/orders.parquet' o
         |          JOIN '<sfDir>/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey)
         |SELECT est.est_rows, act.actual_rows,
         |       est.est_rows = act.actual_rows AS consistent
         |  FROM est, act""".stripMargin,
    // key-skew profile over events.user_id: per-key counts into log2 bands
    // via integer bit lengths (floor_log2 = length(bin(cnt)) - 1)
    "q_key_skew" ->
      s"""WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
         |             FROM '<sfDir>/events.parquet' GROUP BY user_id)
         |SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS band,
         |       CAST(COUNT(*) AS BIGINT) AS n_keys,
         |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |       CAST(MAX(cnt) AS BIGINT) AS max_cnt
         |  FROM c GROUP BY 1 ORDER BY band""".stripMargin,
    // hourly event-rate anomaly: exact-integer median/MAD rule
    // (order-statistic medians over int64, integer flag comparison)
    "q_rate_anomaly" ->
      s"""WITH h AS (SELECT epoch_ns(ts) // 3600000000000 AS hour,
         |                  CAST(COUNT(*) AS BIGINT) AS n_events
         |             FROM '<sfDir>/events.parquet' GROUP BY 1),
         |med AS (SELECT quantile_disc(n_events, 0.5) AS med FROM h),
         |mad AS (SELECT quantile_disc(ABS(n_events - med.med), 0.5) AS mad
         |          FROM h, med)
         |SELECT hour, n_events, med.med AS med, mad.mad AS mad,
         |       ABS(n_events - med.med) > mad.mad * 3 AS is_anomaly
         |  FROM h, med, mad ORDER BY hour""".stripMargin,
    // upper-triangle quantized covariance: in-row (i, j>=i) products,
    // d(d+1)/2 int64 cells, the one FP expression pinned operand-for-operand
    "q_emb_cov" ->
      s"""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb
         |             FROM '<sfDir>/embeddings.parquet'),
         |q AS (SELECT list_transform(emb, v -> CAST(FLOOR(v * 1024.0) AS BIGINT)) AS qs FROM e),
         |x AS (SELECT CAST(u.i - 1 AS BIGINT) AS dim_i, CAST(w.j - 1 AS BIGINT) AS dim_j,
         |             qs[CAST(u.i AS INT)] * qs[CAST(w.j AS INT)] AS p
         |        FROM q, LATERAL unnest(generate_series(1, len(qs))) u(i),
         |                LATERAL unnest(generate_series(1, len(qs))) w(j)
         |       WHERE w.j >= u.i),
         |g AS (SELECT dim_i, dim_j, CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(p) AS BIGINT) AS qq_sum FROM x GROUP BY 1, 2),
         |m AS (SELECT CAST(v.d - 1 AS BIGINT) AS dim,
         |             CAST(SUM(qs[CAST(v.d AS INT)]) AS BIGINT) AS q_sum
         |        FROM q, LATERAL unnest(generate_series(1, len(qs))) v(d) GROUP BY 1)
         |SELECT g.dim_i, g.dim_j, g.n, g.qq_sum,
         |       CAST(g.qq_sum AS DOUBLE) / CAST(g.n AS DOUBLE)
         |         - (CAST(mi.q_sum AS DOUBLE) / CAST(g.n AS DOUBLE))
         |           * (CAST(mj.q_sum AS DOUBLE) / CAST(g.n AS DOUBLE)) AS cov_q
         |  FROM g JOIN m mi ON g.dim_i = mi.dim JOIN m mj ON g.dim_j = mj.dim
         | ORDER BY dim_i, dim_j""".stripMargin,
    "q_weekly" ->
      s"""SELECT epoch_us(date_trunc('week', o_orderdate)) AS week_us,
         |       CAST(COUNT(*) AS BIGINT) AS n_orders,
         |       ${dsum(dec("o_totalprice"))} AS revenue,
         |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
         |  FROM '<sfDir>/orders.parquet'
         | GROUP BY 1 ORDER BY week_us""".stripMargin,
    "q_string_agg" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       string_agg(DISTINCT source, ',' ORDER BY source) AS sources
         |  FROM '<sfDir>/documents.parquet'
         | GROUP BY lang ORDER BY lang""".stripMargin,
    "q_range_window" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts,
         |                  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |             FROM '<sfDir>/events.parquet')
         |SELECT event_id, user_id,
         |       CAST(SUM(k) OVER (PARTITION BY user_id ORDER BY ts
         |              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_sum,
         |       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
         |              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS hr_n
         |  FROM e ORDER BY event_id""".stripMargin,
    "q_events_json" ->
      s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(k) AS BIGINT) AS sum_k,
         |       CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
         |  FROM (SELECT event_type,
         |               CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
         |          FROM '<sfDir>/events.parquet')
         | GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}

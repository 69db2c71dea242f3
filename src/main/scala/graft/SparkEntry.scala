package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a SURVEY §2 operator exercised over the
  * TESTDATA.md fixture tables; [[oracleSql]] holds the DuckDB-dialect
  * equivalent with IDENTICAL output column names. Queries whose semantics
  * DuckDB cannot express (LSH banding, hash-seeded signatures) are declared
  * without an oracle and get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.3 minimum slice: gap-sessionization rollup.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q28_sessions(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01_pricing_summary _),
    "q02_event_state_pivot" -> (Queries.q02_event_state_pivot _),
    "q03_distinct_having" -> (Queries.q03_distinct_having _),
    "q04_listagg" -> (Queries.q04_listagg _),
    "q05_median_percentile" -> (Queries.q05_median_percentile _),
    "q06_bool_agg" -> (Queries.q06_bool_agg _),
    "q07_pivot" -> (Queries.q07_pivot _),
    "q08_unpivot" -> (Queries.q08_unpivot _),
    "q09_dim_join" -> (Queries.q09_dim_join _),
    "q10_semi_join" -> (Queries.q10_semi_join _),
    "q11_anti_join" -> (Queries.q11_anti_join _),
    "q12_full_outer_using" -> (Queries.q12_full_outer_using _),
    "q13_range_join" -> (Queries.q13_range_join _),
    "q14_asof_join" -> (Queries.q14_asof_join _),
    "q15_day_over_day" -> (Queries.q15_day_over_day _),
    "q16_dedup_latest" -> (Queries.q16_dedup_latest _),
    "q17_window_suite" -> (Queries.q17_window_suite _),
    "q18_lag_lead" -> (Queries.q18_lag_lead _),
    "q19_first_last_ignore_nulls" -> (Queries.q19_first_last_ignore_nulls _),
    "q20_topk_per_group" -> (Queries.q20_topk_per_group _),
    "q21_window_percentile" -> (Queries.q21_window_percentile _),
    "q22_set_ops" -> (Queries.q22_set_ops _),
    "q23_string_funcs" -> (Queries.q23_string_funcs _),
    "q24_date_funcs" -> (Queries.q24_date_funcs _),
    "q25_math_case" -> (Queries.q25_math_case _),
    "q26_json" -> (Queries.q26_json _),
    "q27_dim_dates" -> (Queries.q27_dim_dates _),
    "q28_sessions" -> (Queries.q28_sessions _),
    "q29_exact_dedup" -> (QueriesLLM.q29_exact_dedup _),
    "q30_ngram_jaccard" -> (QueriesLLM.q30_ngram_jaccard _),
    "q31_minhash_pairs" -> (QueriesLLM.q31_minhash_pairs _),
    "q32_simhash_pairs" -> (QueriesLLM.q32_simhash_pairs _),
    "q33_text_quality" -> (QueriesLLM.q33_text_quality _),
    "q34_langid" -> (QueriesLLM.q34_langid _),
    "q35_fingerprint" -> (QueriesLLM.q35_fingerprint _),
    "q36_ann_brute" -> (QueriesLLM.q36_ann_brute _),
    "q37_ann_ivf" -> (QueriesLLM.q37_ann_ivf _),
    "q38_multimodal" -> (QueriesLLM.q38_multimodal _),
    "q39_timezone" -> (QueriesLLM.q39_timezone _),
    "q40_split_explode" -> (QueriesLLM.q40_split_explode _),
    "q41_union_dedup" -> (QueriesLLM.q41_union_dedup _),
    "q42_cross_join" -> (QueriesLLM.q42_cross_join _),
    "q43_to_number" -> (QueriesLLM.q43_to_number _),
    "q44_entity_state" -> (QueriesLLM.q44_entity_state _),
    "q45_ab_assignment" -> (QueriesLLM.q45_ab_assignment _),
    "q46_outlier_removal" -> (QueriesLLM.q46_outlier_removal _),
    "q47_embed_dup" -> (QueriesLLM.q47_embed_dup _),
    "q48_embed_dup_lsh" -> (QueriesLLM.q48_embed_dup_lsh _),
    "q49_rollup" -> (QueriesLLM.q49_rollup _),
    "q50_intersect" -> (QueriesLLM.q50_intersect _),
    "q51_json_payload" -> (QueriesLLM.q51_json_payload _),
    "q52_forward_fill" -> (QueriesLLM.q52_forward_fill _),
    "q53_rfm_segmentation" -> (QueriesLLM.q53_rfm_segmentation _),
    "q54_script_subscription" -> (QueriesLLM.q54_script_subscription _),
    "q55_script_historical" -> (QueriesLLM.q55_script_historical _),
    "q56_corpus_clean" -> (QueriesLLM.q56_corpus_clean _),
    "q57_right_outer" -> (QueriesLLM.q57_right_outer _),
    "q58_ntile_cume" -> (QueriesLLM.q58_ntile_cume _),
    "q59_approx_distinct" -> (QueriesLLM.q59_approx_distinct _),
    "q60_super_paths" -> (QueriesLLM.q60_super_paths _),
    "q61_listagg_distinct" -> (QueriesLLM.q61_listagg_distinct _),
    "q62_lateral_window" -> (QueriesLLM.q62_lateral_window _)
  )

  /** Shared DuckDB fragment: Text.normalizeForDedup equivalent. */
  private def normSql(c: String): String =
    s"TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER($c), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** DuckDB replica of [[graft.functions.Text.languageId]] scoring. */
  private def langScoreSql(words: Seq[String], chars: Seq[String]): String = {
    val w = words.map(wd => s"LEN(REGEXP_EXTRACT_ALL(t, ' $wd '))").mkString(" + ")
    val c =
      if (chars.isEmpty) "0"
      else chars.map(ch => s"LEN(REGEXP_EXTRACT_ALL(t, '$ch'))").mkString(" + ")
    s"($w) * 2 + ($c)"
  }

  private def langIdOracle: String = {
    val profiles = graft.functions.Text.LangProfiles
    val scoreCols = profiles
      .map { case (lang, ws, cs) => s"${langScoreSql(ws, cs)} AS s_$lang" }
      .mkString(",\n    ")
    // argmax with ties broken toward the alphabetically-last language —
    // mirrors Spark's greatest(struct(score, lang))
    val langsDesc = profiles.map(_._1).sortBy(identity).reverse
    val allScores = profiles.map(p => s"s_${p._1}").mkString(", ")
    val cascade = langsDesc.init.zipWithIndex
      .map { case (lang, i) =>
        val rest = langsDesc.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $rest THEN '$lang'"
      }
      .mkString("\n      ")
    s"""WITH base AS (SELECT lang, ' ' || LOWER(text) || ' ' AS t FROM documents),
       |scored AS (SELECT lang,
       |    $scoreCols
       |  FROM base),
       |pred AS (SELECT lang,
       |    CASE WHEN GREATEST($allScores) <= 0 THEN 'und'
       |      $cascade
       |      ELSE '${langsDesc.last}' END AS lang_pred
       |  FROM scored)
       |SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY lang, lang_pred""".stripMargin
  }

  private def stopwordListSql: String =
    graft.functions.Text.Stopwords.map(s => s"'$s'").mkString(", ")

  /** DuckDB replica of q56's corpus-clean chain: quality score (q33's
    * formula) + language prediction (q34's cascade) + filters + exact
    * dedup on normalized text, over the doubled corpus.
    */
  private def q56Oracle: String = {
    val profiles = graft.functions.Text.LangProfiles
    val scoreCols = profiles
      .map { case (lang, ws, cs) => s"${langScoreSql(ws, cs)} AS s_$lang" }
      .mkString(",\n    ")
    val langsDesc = profiles.map(_._1).sortBy(identity).reverse
    val allScores = profiles.map(p => s"s_${p._1}").mkString(", ")
    val cascade = langsDesc.init.zipWithIndex
      .map { case (lang, i) =>
        val rest = langsDesc.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $rest THEN '$lang'"
      }
      .mkString("\n      ")
    s"""WITH doubled AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000 AS doc_id, text FROM documents),
       |base AS (SELECT doc_id, text, ' ' || LOWER(text) || ' ' AS t,
       |    STRING_SPLIT(${normSql("text")}, ' ') AS toks FROM doubled),
       |scored AS (SELECT doc_id, text, toks,
       |    $scoreCols,
       |    CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE LEN(REGEXP_EXTRACT_ALL(text, '[[:punct:]]')) * 1.0 / LENGTH(text) END AS punct_ratio,
       |    CASE WHEN LEN(toks) = 0 THEN 0.0 ELSE LEN(LIST_FILTER(toks, x -> x IN ($stopwordListSql))) * 1.0 / LEN(toks) END AS stopword_ratio
       |  FROM base),
       |pred AS (SELECT doc_id, text,
       |    CASE WHEN GREATEST($allScores) <= 0 THEN 'und'
       |      $cascade
       |      ELSE '${langsDesc.last}' END AS lang_pred,
       |    ROUND(LEAST(LENGTH(text) / 500.0, 1.0) * 0.4 + LEAST(stopword_ratio * 4.0, 1.0) * 0.3 + GREATEST(1.0 - punct_ratio * 5.0, 0.0) * 0.3, 6) AS quality_score
       |  FROM scored),
       |filtered AS (SELECT * FROM pred
       |  WHERE quality_score >= 0.3 AND lang_pred IN ('en', 'de', 'fr')),
       |kept AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ${normSql("text")} ORDER BY doc_id) AS rn
       |  FROM filtered)
       |SELECT doc_id, lang_pred, quality_score FROM kept WHERE rn = 1""".stripMargin
  }

  /** DuckDB replica of q48's hyperplane LSH: the planes are deterministic
    * ([[graft.functions.Vectors.hyperplanes]], seed 42), so they embed as
    * literal DOUBLE[] arrays; bit i of the signature is
    * sign(v · plane_i) — exactly [[graft.functions.Vectors.hyperplaneLshSignature]].
    */
  private def q48Oracle: String = {
    val planes = graft.functions.Vectors.hyperplanes(numBits = 8, dim = 64)
    val sigTerms = planes.zipWithIndex
      .map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]")
        s"(CASE WHEN LIST_DOT_PRODUCT(v, $arr::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }
      .mkString("\n    + ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sig AS (SELECT vec_id, v,
       |    $sigTerms AS sig
       |  FROM emb),
       |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    CASE WHEN (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) = 0 THEN 0.0
       |         ELSE LIST_DOT_PRODUCT(a.v, b.v) / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) END AS cosine
       |  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM pairs WHERE cosine >= 0.85""".stripMargin
  }

  /** DuckDB equivalents, same column names (driver sorts columns by name and
    * hashes values — names and value-level semantics must both match).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  AVG(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_event_state_pivot" ->
      """SELECT user_id,
        |  MAX(CASE WHEN event_type = 'signup' THEN ts END) AS last_signup_at,
        |  MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase_at,
        |  CAST(MAX(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS max_purchase_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q03_distinct_having" ->
      """SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
        |FROM events GROUP BY user_id HAVING COUNT(*) > 10""".stripMargin,
    "q04_listagg" ->
      """SELECT user_id, STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
        |FROM events GROUP BY user_id""".stripMargin,
    "q05_median_percentile" ->
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
        |  QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q06_bool_agg" ->
      """SELECT o_custkey,
        |  BOOL_OR(o_orderstatus = 'F') AS any_f,
        |  BOOL_AND(o_totalprice > 1000) AS all_over_1k,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q07_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q08_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(l_quantity) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty' AS metric, qty AS metric_value FROM agg
        |UNION ALL
        |SELECT l_returnflag, 'price' AS metric, price FROM agg""".stripMargin,
    "q09_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q10_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)""".stripMargin,
    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q12_full_outer_using" ->
      """WITH f AS (SELECT o_custkey AS custkey, COUNT(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
        |     o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
        |SELECT COALESCE(f.custkey, o.custkey) AS custkey, n_f, n_o
        |FROM f FULL OUTER JOIN o ON f.custkey = o.custkey""".stripMargin,
    "q13_range_join" ->
      """WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) lo, CAST(MAX(o_orderdate) AS DATE) hi FROM orders),
        |spine AS (SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS datum FROM bounds),
        |o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d, CAST(o_orderdate AS DATE) + 6 AS end_d FROM orders)
        |SELECT datum, COUNT(o_orderkey) AS open_orders
        |FROM spine LEFT JOIN o ON datum BETWEEN start_d AND end_d
        |GROUP BY datum""".stripMargin,
    "q14_asof_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.p_id, p.p_user, p.p_ts, c.c_id, c.c_ts,
        |        ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
        |      FROM p LEFT JOIN c ON p.p_user = c.c_user AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR)
        |SELECT p_id, p_user, c_id, DATE_DIFF('second', c_ts, p_ts) AS lag_seconds
        |FROM j WHERE rn = 1""".stripMargin,
    "q15_day_over_day" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue,
        |  LAG(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
        |  ROUND(revenue - COALESCE(LAG(revenue, 1) OVER (ORDER BY month), 0.0), 2) AS mom_delta
        |FROM daily""".stripMargin,
    "q16_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events
        |) WHERE rn = 1""".stripMargin,
    "q17_window_suite" ->
      """SELECT o_orderkey, o_custkey,
        |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
        |  ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS price_pctile
        |FROM orders WHERE o_custkey < 100""".stripMargin,
    "q18_lag_lead" ->
      """SELECT event_id, user_id, event_type,
        |  LAG(event_type, 1) OVER w AS prev_type,
        |  LEAD(event_type, 1) OVER w AS next_type,
        |  EPOCH_US(ts) - EPOCH_US(LAG(ts, 1) OVER w) AS micros_since_prev
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q19_first_last_ignore_nulls" ->
      """SELECT event_id, user_id,
        |  FIRST_VALUE(purchase_value IGNORE NULLS) OVER w AS first_purchase_value,
        |  LAST_VALUE(purchase_value IGNORE NULLS) OVER w AS last_purchase_value
        |FROM (SELECT *, CASE WHEN event_type = 'purchase' THEN value END AS purchase_value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q20_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders
        |) WHERE rk <= 3""".stripMargin,
    "q21_window_percentile" ->
      """WITH med AS (SELECT l_returnflag, QUANTILE_CONT(l_quantity, 0.5) AS median_qty FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n_above_median, ROUND(MAX(m.median_qty), 6) AS median_qty_out
        |FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
        |WHERE l.l_quantity > m.median_qty
        |GROUP BY l.l_returnflag""".stripMargin,
    "q22_set_ops" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 1000""".stripMargin,
    "q23_string_funcs" ->
      """SELECT p_partkey,
        |  SPLIT_PART(p_type, ' ', 1) AS type_head,
        |  UPPER(SUBSTR(p_brand, 1, 1)) || LOWER(SUBSTR(p_brand, 2)) AS brand_initcap,
        |  LOWER(p_name) AS name_lower,
        |  LEFT(p_name, 5) AS name_left5,
        |  RIGHT(p_name, 3) AS name_right3,
        |  LENGTH(p_name) AS name_len,
        |  STRPOS(p_type, 'a') AS first_a,
        |  REPLACE(p_brand, '#', '-') AS brand_dashed,
        |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
        |  MD5(p_brand || '||' || p_type) AS surrogate_key,
        |  TRANSLATE(p_name, 'aeiou', 'AEIOU') AS name_vowels_up,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels,
        |  LEN(REGEXP_EXTRACT_ALL(p_name, 'o')) AS o_count,
        |  p_name LIKE '%spring%' AS like_spring,
        |  p_name ILIKE '%SPRING%' AS ilike_spring,
        |  REGEXP_EXTRACT(p_name, '[aeiou]+') AS first_vowels
        |FROM part WHERE p_partkey < 500""".stripMargin,
    "q24_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |  DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        |  DATE_DIFF('month', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS months_to_2002,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        |  DATE_PART('dow', o_orderdate) AS dow,
        |  DATE_PART('doy', o_orderdate) AS doy,
        |  STRFTIME(o_orderdate, '%Y-%m') AS ym,
        |  MONTHNAME(o_orderdate) AS month_name,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_quarter,
        |  CAST(STRFTIME(o_orderdate, '%Y-%m-%d') AS DATE) AS roundtrip_date,
        |  CAST(FLOOR(DATE_PART('epoch', o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,
    "q25_math_case" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
        |  CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_div7,
        |  ABS(l_discount - 0.05) AS disc_dev,
        |  ROUND(POW(0.97, l_quantity), 8) AS depreciation,
        |  l_partkey % 7 AS part_mod7,
        |  CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)), 2) AS DOUBLE) AS tax_amount,
        |  CASE WHEN l_quantity >= 40 THEN 'bulk' WHEN l_quantity >= 10 THEN 'standard' ELSE 'small' END AS size_tier,
        |  CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned' ELSE 'none' END AS flag_decoded,
        |  GREATEST(l_quantity, CAST(l_linenumber AS DOUBLE)) AS greatest_qn,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'empty') AS nvl_flag
        |FROM lineitem WHERE l_orderkey < 300""".stripMargin,
    "q26_json" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_value,
        |  JSON_VALID(props) AS valid_json,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) % 10 AS k_bucket
        |FROM events""".stripMargin,
    "q27_dim_dates" ->
      """WITH bounds AS (SELECT CAST(MIN(o_orderdate) AS DATE) lo, CAST(MAX(o_orderdate) AS DATE) hi FROM orders),
        |spine AS (SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS datum FROM bounds)
        |SELECT datum,
        |  YEAR(datum) AS year, QUARTER(datum) AS quarter, MONTH(datum) AS month,
        |  WEEKOFYEAR(datum) AS week_of_year, DAY(datum) AS day_of_month,
        |  DATE_PART('dow', datum) AS day_of_week,
        |  MONTHNAME(datum) AS month_name, DAYNAME(datum) AS day_name,
        |  CAST(DATE_TRUNC('week', datum) AS DATE) AS week_start,
        |  CAST(DATE_TRUNC('month', datum) AS DATE) AS month_start,
        |  LAST_DAY(datum) AS month_end,
        |  DATE_PART('dow', datum) IN (0, 6) AS is_weekend
        |FROM spine""".stripMargin,
    "q28_sessions" ->
      """WITH flagged AS (
        |  SELECT *, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                   OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |            THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged),
        |entry AS (
        |  SELECT *, FIRST_VALUE(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS entry_et
        |  FROM sess)
        |SELECT user_id, session_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
        |  MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS had_error,
        |  MIN(entry_et) AS entry_event_type,
        |  CAST((EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) // 1000000 AS BIGINT) AS duration_seconds
        |FROM entry GROUP BY user_id, session_id""".stripMargin,
    "q29_exact_dedup" ->
      s"""WITH doubled AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars FROM documents),
         |fp AS (SELECT *, ${normSql("text")} AS norm FROM doubled),
         |kept AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn FROM fp)
         |SELECT doc_id, lang, source, n_chars FROM kept WHERE rn = 1""".stripMargin,
    "q30_ngram_jaccard" ->
      s"""WITH norm AS (SELECT doc_id, STRING_SPLIT(${normSql("text")}, ' ') AS toks FROM documents WHERE doc_id < 1000),
         |sh AS (SELECT doc_id,
         |    LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0)),
         |      i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 1), ' '))) AS sh
         |  FROM norm),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) = 0 THEN 0.0
         |         ELSE LEN(LIST_INTERSECT(a.sh, b.sh)) * 1.0 / LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))) END AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE LEN(a.sh) > 0 AND LEN(b.sh) > 0)
         |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM pairs WHERE j >= 0.2""".stripMargin,
    "q33_text_quality" ->
      s"""WITH raw AS (SELECT doc_id, text, STRING_SPLIT(${normSql("text")}, ' ') AS toks FROM documents),
         |c AS (SELECT doc_id, text, toks,
         |    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS token_count,
         |    LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')) AS subword_tokens,
         |    CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE LEN(REGEXP_EXTRACT_ALL(text, '[[:punct:]]')) * 1.0 / LENGTH(text) END AS punct_ratio,
         |    CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]')) * 1.0 / LENGTH(text) END AS alpha_ratio
         |  FROM raw),
         |d AS (SELECT *,
         |    CASE WHEN LEN(toks) = 0 THEN 0.0 ELSE LEN(LIST_FILTER(toks, x -> x IN ($stopwordListSql))) * 1.0 / LEN(toks) END AS stopword_ratio,
         |    CASE WHEN LEN(toks) = 0 THEN 0.0 ELSE LIST_SUM(LIST_TRANSFORM(toks, tk -> LENGTH(tk))) * 1.0 / LEN(toks) END AS mean_word_len
         |  FROM c)
         |SELECT doc_id, token_count, subword_tokens,
         |  ROUND(punct_ratio, 6) AS punct_ratio,
         |  ROUND(alpha_ratio, 6) AS alpha_ratio,
         |  ROUND(stopword_ratio, 6) AS stopword_ratio,
         |  ROUND(mean_word_len, 6) AS mean_word_len,
         |  ROUND(LEAST(LENGTH(text) / 500.0, 1.0) * 0.4 + LEAST(stopword_ratio * 4.0, 1.0) * 0.3 + GREATEST(1.0 - punct_ratio * 5.0, 0.0) * 0.3, 6) AS quality_score
         |FROM d""".stripMargin,
    "q34_langid" -> langIdOracle,
    "q36_ann_brute" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 100),
        |pairs AS (SELECT query_id, e.vec_id AS corpus_id,
        |    CASE WHEN (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(e.v, e.v))) = 0 THEN 0.0
        |         ELSE LIST_DOT_PRODUCT(qv, e.v) / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(e.v, e.v))) END AS cosine
        |  FROM q CROSS JOIN emb e WHERE query_id != e.vec_id),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rnk FROM pairs)
        |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rnk AS "rank" FROM ranked WHERE rnk <= 5""".stripMargin,
    "q39_timezone" ->
      """SELECT CAST(TIMEZONE('CET', TIMEZONE('UTC', ts)) AS DATE) AS cet_day, COUNT(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "q40_split_explode" ->
      """SELECT p_partkey, s.word_idx, s.word FROM (
        |  SELECT p_partkey,
        |    UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks)),
        |      i -> STRUCT_PACK(word_idx := i - 1, word := toks[i]))) AS s
        |  FROM (SELECT p_partkey, STRING_SPLIT(p_type, ' ') AS toks FROM part WHERE p_partkey < 200))""".stripMargin,
    "q41_union_dedup" ->
      """SELECT DISTINCT o_custkey, o_orderpriority FROM (
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
        |  UNION ALL
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "q42_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q43_to_number" ->
      """WITH m AS (SELECT o_orderkey,
        |    REPLACE(PRINTF('%.2f', o_totalprice), '.', ',') || ' €' AS eu_money
        |  FROM orders WHERE o_orderkey < 500)
        |SELECT o_orderkey, eu_money,
        |  CAST(REPLACE(REPLACE(REGEXP_REPLACE(eu_money, '[^0-9,.-]', '', 'g'), '.', ''), ',', '.') AS DOUBLE) AS parsed
        |FROM m""".stripMargin,
    "q44_entity_state" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_type DESC) AS rn
        |  FROM events)
        |SELECT user_id AS entityId,
        |  COUNT(*) AS nEvents,
        |  MIN(CASE WHEN rn = 1 THEN event_type END) AS lastEventType,
        |  MAX(ts) AS lastTs,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS totalValue
        |FROM ranked GROUP BY user_id""".stripMargin,
    "q45_ab_assignment" ->
      """SELECT CAST('0x' || SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS test_group,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY 1""".stripMargin,
    "q46_outlier_removal" ->
      """WITH fences AS (
        |  SELECT l_returnflag,
        |    QUANTILE_CONT(l_extendedprice, 0.25) AS p25,
        |    QUANTILE_CONT(l_extendedprice, 0.75) AS p75
        |  FROM lineitem GROUP BY l_returnflag),
        |kept AS (
        |  SELECT l.l_returnflag, l.l_extendedprice
        |  FROM lineitem l JOIN fences f ON l.l_returnflag = f.l_returnflag
        |  WHERE l.l_extendedprice >= f.p25 - (f.p75 - f.p25) * 1.5
        |    AND l.l_extendedprice <= f.p75 + (f.p75 - f.p25) * 1.5)
        |SELECT l_returnflag,
        |  COUNT(*) AS n_kept,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS kept_value,
        |  ROUND(MIN(l_extendedprice), 2) AS min_kept,
        |  ROUND(MAX(l_extendedprice), 2) AS max_kept
        |FROM kept GROUP BY l_returnflag""".stripMargin,
    "q47_embed_dup" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 500),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CASE WHEN (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) = 0 THEN 0.0
        |         ELSE LIST_DOT_PRODUCT(a.v, b.v) / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) END AS cosine
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM pairs WHERE cosine >= 0.85""".stripMargin,
    "q35_fingerprint" ->
      s"""SELECT source,
         |  COUNT(DISTINCT ${normSql("text")}) AS n_distinct_fp,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY source""".stripMargin,
    "q37_ann_ivf" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |centroids AS (SELECT vec_id AS cell_id, v AS centroid FROM emb ORDER BY vec_id LIMIT 8),
        |assigned AS (
        |  SELECT vec_id, v, cell_id FROM (
        |    SELECT e.vec_id, e.v, c.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |        CASE WHEN (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) * SQRT(LIST_DOT_PRODUCT(c.centroid, c.centroid))) = 0 THEN 0.0
        |             ELSE LIST_DOT_PRODUCT(e.v, c.centroid) / (SQRT(LIST_DOT_PRODUCT(e.v, e.v)) * SQRT(LIST_DOT_PRODUCT(c.centroid, c.centroid))) END DESC,
        |        c.cell_id) AS rn
        |    FROM emb e CROSS JOIN centroids c)
        |  WHERE rn = 1),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CASE WHEN (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))) = 0 THEN 0.0
        |         ELSE LIST_DOT_PRODUCT(q.v, c.v) / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))) END AS cosine
        |  FROM assigned q JOIN assigned c ON q.cell_id = c.cell_id AND q.vec_id != c.vec_id
        |  WHERE q.vec_id < 100),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rnk FROM pairs)
        |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rnk AS "rank" FROM ranked WHERE rnk <= 5""".stripMargin,
    "q49_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q50_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q48_embed_dup_lsh" -> q48Oracle,
    // q38: the media table is pure doc_id/text arithmetic (Multimodal.
    // fromDocuments), so payload size, type/format mapping, resize
    // arithmetic (truncating like Scala's .toInt) and frame-sample
    // counts all replicate in SQL; only the stub decoder's feature
    // VALUES stay out of the oracle (the dimension is asserted)
    "q38_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
        |  octet_length(encode(text)) AS payload_bytes,
        |  16 AS feature_dim,
        |  CASE WHEN doc_id % 3 = 0 THEN GREATEST(1, CAST(FLOOR((100 + doc_id % 1200) *
        |    LEAST(1.0, 512.0 / GREATEST(100 + doc_id % 1200, 100 + doc_id % 800))) AS INT)) END AS resized_w,
        |  CASE WHEN doc_id % 3 = 0 THEN GREATEST(1, CAST(FLOOR((100 + doc_id % 800) *
        |    LEAST(1.0, 512.0 / GREATEST(100 + doc_id % 1200, 100 + doc_id % 800))) AS INT)) END AS resized_h,
        |  CASE WHEN doc_id % 3 = 2 THEN (doc_id % 120) // 5 + 1 END AS n_frames
        |FROM documents""".stripMargin,
    "q51_json_payload" ->
      """WITH payloads AS (SELECT JSON_OBJECT(
        |    'order_id', o_orderkey, 'customer_id', o_custkey, 'status', o_orderstatus,
        |    'amount', o_totalprice, 'order_date', CAST(o_orderdate AS DATE),
        |    'priority', o_orderpriority,
        |    'clerk', PRINTF('Clerk#%09d', o_orderkey % 1000),
        |    'ship_priority', CAST(o_orderkey % 5 AS INTEGER),
        |    'note', 'order ' || o_orderstatus || '/' || o_orderpriority,
        |    'is_large', o_totalprice > 100000,
        |    'order_month', MONTH(o_orderdate), 'shard', o_orderkey % 7) AS payload
        |  FROM orders)
        |SELECT
        |  CAST(JSON_EXTRACT_STRING(payload, '$.order_id') AS BIGINT) AS order_id,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.customer_id') AS BIGINT) AS customer_id,
        |  JSON_EXTRACT_STRING(payload, '$.status') AS status,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.amount') AS DOUBLE) AS amount,
        |  JSON_EXTRACT_STRING(payload, '$.order_date') AS order_date,
        |  JSON_EXTRACT_STRING(payload, '$.priority') AS priority,
        |  JSON_EXTRACT_STRING(payload, '$.clerk') AS clerk,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.ship_priority') AS INTEGER) AS ship_priority,
        |  JSON_EXTRACT_STRING(payload, '$.note') AS note,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.is_large') AS BOOLEAN) AS is_large,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.order_month') AS INTEGER) AS order_month,
        |  CAST(JSON_EXTRACT_STRING(payload, '$.shard') AS BIGINT) AS shard
        |FROM payloads""".stripMargin,
    "q52_forward_fill" ->
      """SELECT event_id, user_id, purchase_value,
        |  LAG(purchase_value, 1 IGNORE NULLS) OVER w AS prev_purchase_value,
        |  LAST_VALUE(purchase_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM (SELECT *, CASE WHEN event_type = 'purchase' THEN value END AS purchase_value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "q53_rfm_segmentation" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE), DATE '1998-12-01') AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |pct AS (
        |  SELECT *,
        |    PERCENT_RANK() OVER (ORDER BY recency_days DESC) AS r_raw,
        |    PERCENT_RANK() OVER (ORDER BY frequency) AS f_raw,
        |    PERCENT_RANK() OVER (ORDER BY monetary) AS m_raw
        |  FROM per),
        |tiers AS (
        |  SELECT *,
        |    CASE WHEN r_raw >= 0.75 THEN '4' WHEN r_raw >= 0.5 THEN '3' WHEN r_raw >= 0.25 THEN '2' ELSE '1' END AS rt,
        |    CASE WHEN f_raw >= 0.75 THEN '4' WHEN f_raw >= 0.5 THEN '3' WHEN f_raw >= 0.25 THEN '2' ELSE '1' END AS ft,
        |    CASE WHEN m_raw >= 0.75 THEN '4' WHEN m_raw >= 0.5 THEN '3' WHEN m_raw >= 0.25 THEN '2' ELSE '1' END AS mt
        |  FROM pct)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |  ROUND(r_raw, 6) AS r_pct, ROUND(f_raw, 6) AS f_pct, ROUND(m_raw, 6) AS m_pct,
        |  rt || ft || mt AS segment
        |FROM tiers""".stripMargin,
    "q54_script_subscription" ->
      """WITH parsed AS (
        |  SELECT event_id, user_id, event_type, ts,
        |    NULLIF(JSON_EXTRACT_STRING(props, '$.k'), '') AS k
        |  FROM events),
        |dedup AS (
        |  SELECT *,
        |    COUNT(*) OVER (PARTITION BY user_id) AS total_events,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS idx
        |  FROM parsed)
        |SELECT user_id, event_id, event_type, CAST(k AS INTEGER) AS k, total_events,
        |  DATE_DIFF('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_since_last
        |FROM dedup WHERE idx = 1""".stripMargin,
    "q55_script_historical" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, DATE '1998-11-30' AS date
        |FROM orders WHERE o_orderdate < TIMESTAMP '1998-12-01'""".stripMargin,
    "q56_corpus_clean" -> q56Oracle,
    "q57_right_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_big_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS big_order_rev
        |FROM (SELECT * FROM orders WHERE o_totalprice > 100000) o
        |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q58_ntile_cume" ->
      """SELECT o_orderkey, o_custkey,
        |  NTILE(4) OVER w AS price_quartile,
        |  ROUND(CUME_DIST() OVER w, 6) AS price_cume
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "q59_approx_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_custkeys,
        |  TRUE AS approx_within_5pct
        |FROM orders GROUP BY 1""".stripMargin,
    "q60_super_paths" ->
      """SELECT event_id,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_value,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) % 10 AS k_bucket
        |FROM events""".stripMargin,
    // LISTAGG DISTINCT ordered by another column ≡ each distinct value
    // ordered by its MINIMUM key, ties by value (the translate rewrite's
    // pinned semantics)
    "q61_listagg_distinct" ->
      """WITH d AS (
        |  SELECT o_custkey, o_orderpriority AS v, MIN(o_orderdate) AS mk
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
        |agg AS (
        |  SELECT o_custkey, STRING_AGG(v, ', ' ORDER BY mk, v) AS priorities
        |  FROM d GROUP BY 1),
        |n AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT n.o_custkey, agg.priorities, n.n_orders
        |FROM n LEFT JOIN agg USING (o_custkey)""".stripMargin,
    // lateral aliases expanded into the nesting DuckDB evaluates anyway:
    // filter BEFORE the windows, exact DECIMAL money
    "q62_lateral_window" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(net_price AS DOUBLE) AS net_price,
        |  CAST(order_net AS DOUBLE) AS order_net,
        |  price_rank
        |FROM (
        |  SELECT l_orderkey, l_linenumber, net_price,
        |    SUM(net_price) OVER (PARTITION BY l_orderkey) AS order_net,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY net_price DESC, l_linenumber) AS price_rank
        |  FROM (
        |    SELECT l_orderkey, l_linenumber,
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS net_price
        |    FROM lineitem) t
        |  WHERE net_price > 900) x""".stripMargin
  )
}

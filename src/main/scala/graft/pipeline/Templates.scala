package graft.pipeline

/** Deterministic renderer for the orchestration-template slots that
  * appear in the reference's Airflow-managed SQL, so those scripts can
  * run through [[RedshiftScript.Runner]] verbatim-after-render — the
  * exact contract the warehouse sees (Airflow renders Jinja before the
  * statement reaches Redshift; python `str.format` and `envsubst`
  * render the single-brace and `${VAR}` flavors the same way).
  *
  * Three template dialects occur in the corpus (counts are corpus-wide):
  *
  *  - Jinja `{{ params.x }}` / `{{ ti.xcom_pull(key='y') }}` /
  *    `{{ var.json.cfg.z }}` — bi-airflow-prod + data-airflow-prod
  *    (e.g. `bi-airflow-prod/dags/luxco/spv_mind_month_new_v2/sql/
  *    condition_1.sql:8,120`, `data-airflow-prod/dags/ups/sql/
  *    stage_data.sql:7`).
  *  - python-format `{schema_name}` — ds-airflow-prod + data-airflow-prod
  *    (`ds-airflow-prod/dags/data_monitor/sql/delete_table_model.sql:2`).
  *  - shell `${START_FROM}` — `Datawarehouse-ETL/95_machine_learning/
  *    userid_session_id_matching/01_load.sql:5`.
  *
  * Values are pinned to the same 2024-06 anchor the layer suites use and
  * to the harness's partition-folder fixture values (year=2024, month=06,
  * day=14) so rendered predicates MATCH staged fixture rows. All
  * rendering is name-driven and pure — no wall clock.
  */
object Templates {

  /** Pinned values for known slot names (lower-cased, non-alnum squashed).
    * Quoting is the template's job in the corpus (slots sit inside
    * existing quotes: `'{{ params.first_day_of_month }}'`), so values are
    * bare text.
    */
  private val known: Map[String, String] = Map(
    // date window params (Luxco/spv monthly reporting)
    "last_day_of_prev_month" -> "2024-05-31",
    "first_day_of_month" -> "2024-06-01",
    "mid_day_of_month" -> "2024-06-15",
    "date_for_depreciation" -> "2024-05-31",
    // monthly snapshot-table suffix: `union_sources_{{ params.tbl_suffix }}_eu_all`
    "tbl_suffix" -> "jun_2024",
    // xcom partition-folder pulls — must equal the fixture partition
    // values (LayerHarness.partValues) so staged rows survive the filter
    "year" -> "2024",
    "month" -> "06",
    "day" -> "14",
    "hour" -> "07",
    "batch_id" -> "1",
    "batch_id_value" -> "1",
    "start_at" -> "2024-06-01 00:00:00",
    "end_at" -> "2024-06-15 00:00:00",
    "reporting_date" -> "2024-05-31",
    "date_time_extraction_from_filename" -> "2024-06-14 07:00:00",
    "s3_outfile" -> "s3://graft-out/tpl_outfile",
    // airflow Variable config (identifier position)
    "redshift_target_table" -> "tpl_target_table",
    "redshift_target_schema" -> "tpl_schema",
    "redshift_iam_role" -> "tpl_iam_role",
    // python-format slots (ds-/data-airflow-prod)
    "schema_name" -> "tpl_schema",
    "table_name" -> "tpl_table",
    "table_name_preds" -> "tpl_table_preds",
    "model" -> "1",
    "model_id" -> "1",
    "country" -> "Germany",
    "customer_type" -> "normal_customer",
    "store" -> "Germany",
    "start_date" -> "2024-06-01",
    "sub_start_day" -> "2024-06-01",
    "customer_ids" -> "(1, 2)",
    "lookback_days" -> "30",
    "interval_hour" -> "1 hour",
    // the one `VALUES {parameters}` upsert (`ds-airflow-prod/dags/labels/
    // sql/insert_on_conflict.sql`)
    "parameters" -> "(1, 'graft_label', '2024-06-14 07:00:00')",
    // shell flavor (95_machine_learning) — value carries its own quotes
    // because the source writes `${START_FROM}::DATE` bare
    "start_from" -> "'2024-06-01'",
    "end_to" -> "'2024-06-15'",
    // psql-style `:name;` binds in string-argument position carry their
    // own quotes (`REPLACE(image, :image_path;, :emptystring;)`,
    // `data-airflow-prod/dags/reverse_etl/braze/price_drop/sql/
    // athena_product_data.sql:24`)
    "image_path" -> "'https://cdn.example/'",
    "emptystring" -> "''")

  /** Name-driven fallback for slots outside the curated map. */
  private def fallback(key: String): String =
    if (key.contains("date") || key == "ds") "2024-06-15"
    else if (key.contains("schema")) "tpl_schema"
    else if (key.contains("table") || key.contains("tbl")) "tpl_table"
    else if (key.contains("suffix")) "jun_2024"
    // `IN :list_orders;` binds to a parenthesized literal list
    else if (key.startsWith("list") || key.endsWith("list")) "('1')"
    else "1"

  /** Squash a raw slot expression (`ti.xcom_pull(key='year')`,
    * `params.first_day_of_month`, `var.json.cfg.redshift_target_table`)
    * to its salient trailing name.
    */
  private def slotKey(expr: String): String = {
    val t = expr.trim.toLowerCase
    val fromKey = "(?:key|task_ids)\\s*=\\s*'([^']+)'".r.findFirstMatchIn(t).map(_.group(1))
    val name = fromKey.getOrElse(
      t.replaceAll("\\(.*\\)$", "").split('.').last.trim)
    name.replaceAll("[^a-z0-9_]", "_")
  }

  private def valueOf(expr: String): String = {
    val k = slotKey(expr)
    known.getOrElse(k, fallback(k))
  }

  private val Jinja = "\\{\\{(.*?)\\}\\}".r
  private val Shell = "\\$\\{(\\w+)\\}".r
  // single-brace python-format slot: a lone lowercase identifier between
  // braces, never nested or containing spaces — `{schema_name}`
  private val PyFmt = "\\{([a-z_][a-z0-9_]*)\\}".r
  // terminator-marked psql-style binds — the manual_review_us / braze
  // Athena convention replaces `:name;` INCLUDING the semicolon before
  // the engine sees the text (`data-airflow-prod/business_logic/
  // manual_review_us/sql/order_payment_method.sql:8` interval
  // ':lookback_days;', `…/onfido_data.sql:11` IN :list_orders;,
  // `dags/reverse_etl/braze/custom_attributes/sql/
  // athena_delta_records.sql:34` FROM :braze_hist_table;). The
  // lookbehind keeps `::type` casts and time literals out.
  private val PsqlBind = "(?<![:\\w]):([a-z_][a-z0-9_]*);".r

  /** True if the text contains any template slot this renderer handles. */
  def isTemplated(sql: String): Boolean =
    Jinja.findFirstIn(sql).isDefined || Shell.findFirstIn(sql).isDefined ||
      PyFmt.findFirstIn(sql).isDefined || PsqlBind.findFirstIn(sql).isDefined

  /** Render every template slot to its pinned deterministic value. */
  def render(sql: String): String = {
    val j = Jinja.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(valueOf(m.group(1))))
    val s = Shell.replaceAllIn(j, m =>
      java.util.regex.Matcher.quoteReplacement(valueOf(m.group(1))))
    val p = PyFmt.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(valueOf(m.group(1))))
    PsqlBind.replaceAllIn(p, m =>
      java.util.regex.Matcher.quoteReplacement(valueOf(m.group(1))))
  }
}

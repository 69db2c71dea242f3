package graft.io

import org.apache.spark.sql.DataFrame

/** Reverse-ETL HTTP export shell (SURVEY §2.1 S11) — the engine surface
  * for the reference's chunked Braze/CRM upsert loop
  * (`data-airflow-prod/business_logic/reverse_etl/braze/custom_attributes/
  * custom_attributes.py:28-50`: chunk the frame, POST each chunk, retry on
  * failure).
  *
  * Spark-first shape: `foreachPartition` so each executor POSTs its own rows
  * (no driver collect), rows serialized once via `toJSON`, chunked into
  * bounded request bodies, with exponential-backoff retry per chunk.
  *
  * Delivery contract: AT-LEAST-ONCE — Spark retries failed tasks, so the
  * receiving API must be an idempotent upsert keyed on an external id
  * (the reference's Braze `external_id` attribute API is exactly that).
  */
object HttpSink {

  final case class Config(
      url: String,
      batchSize: Int = 75, // the reference chunks Braze posts at 75
      maxRetries: Int = 3,
      initialBackoffMs: Long = 100,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMs: Long = 5000,
      requestTimeoutMs: Long = 30000)

  /** POST the DataFrame as JSON-array batches. Returns nothing; failures
    * after `maxRetries` attempts throw, failing the Spark task (which
    * retries the partition — see the at-least-once note above).
    */
  def postJsonBatches(df: DataFrame, config: Config): Unit = {
    val conf = config // serialize the case class, not the enclosing object
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      // per-partition client init (the once-per-partition codec shape);
      // connect + per-request timeouts so a hung endpoint fails the task
      // (bounded) instead of stalling the executor thread forever
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(conf.connectTimeoutMs))
        .build()
      rows.grouped(conf.batchSize).foreach { chunk =>
        val body = chunk.mkString("[", ",", "]")
        postWithRetry(client, conf, body)
      }
    }
  }

  private[graft] def postWithRetry(
      client: java.net.http.HttpClient,
      conf: Config,
      body: String): Unit = {
    var attempt = 0
    var backoff = conf.initialBackoffMs
    var done = false
    while (!done) {
      attempt += 1
      // retry policy: 5xx and transport errors (timeouts, resets) are
      // transient — retry with backoff; any other non-2xx (4xx: bad
      // payload/auth) can never succeed on retry — fail immediately
      val ok =
        try {
          val builder = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(conf.url))
            .timeout(java.time.Duration.ofMillis(conf.requestTimeoutMs))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          conf.headers.foreach { case (k, v) => builder.header(k, v) }
          val resp = client.send(
            builder.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code >= 200 && code < 300) true
          // 5xx, 429 (rate limit — the normal Braze-style backpressure
          // signal) and 408 are transient; other 4xx can never succeed
          else if (code >= 500 || code == 429 || code == 408) false
          else throw new IllegalStateException(
            s"POST ${conf.url} rejected with non-retryable status $code: " +
              resp.body().take(200))
        } catch {
          case _: java.io.IOException => false // incl. HttpTimeoutException
        }
      if (ok) done = true
      else if (attempt > conf.maxRetries)
        throw new java.io.IOException(
          s"POST ${conf.url} failed after ${conf.maxRetries} retries")
      else {
        Thread.sleep(backoff)
        backoff *= 2
      }
    }
  }
}

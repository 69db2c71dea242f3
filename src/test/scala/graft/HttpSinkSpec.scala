package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.io.HttpSink
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** The reverse-ETL HTTP sink against an in-test HTTP stub: chunking,
  * retry-with-backoff on 5xx, and full delivery.
  */
class HttpSinkSpec extends SparkSpec {
  import sqlImplicits._

  private def withServer(failFirst: Int)(test: (String, java.util.List[String]) => Unit): Unit = {
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val failures = new AtomicInteger(failFirst)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/upsert", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (failures.getAndDecrement() > 0) {
          ex.sendResponseHeaders(503, -1)
        } else {
          received.add(body)
          ex.sendResponseHeaders(200, -1)
        }
        ex.close()
      }
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/upsert", received)
    finally server.stop(0)
  }

  test("posts every row in bounded JSON-array chunks") {
    withServer(failFirst = 0) { (url, received) =>
      val df = (1 to 23).map(i => (i, s"user_$i")).toDF("id", "external_id").repartition(3)
      HttpSink.postJsonBatches(df, HttpSink.Config(url, batchSize = 5))
      val bodies = received.toArray(Array.empty[String]).toSeq
      // every chunk is a JSON array of at most batchSize rows
      bodies.foreach { b => assert(b.startsWith("[") && b.endsWith("]")) }
      val rows = bodies.flatMap(_.stripPrefix("[").stripSuffix("]").split("(?<=\\}),(?=\\{)"))
      assert(rows.size === 23)
      assert(bodies.forall(_.split("\\},\\{").length <= 5))
      val ids = rows.flatMap("\"id\":(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).sorted
      assert(ids === (1 to 23))
    }
  }

  test("retries with backoff through transient 5xx and still delivers") {
    withServer(failFirst = 2) { (url, received) =>
      val df = (1 to 4).map(i => (i, s"u$i")).toDF("id", "external_id").coalesce(1)
      HttpSink.postJsonBatches(df,
        HttpSink.Config(url, batchSize = 10, maxRetries = 4, initialBackoffMs = 10))
      assert(received.size === 1) // delivered exactly once after the retries
      assert(received.get(0).contains("\"u1\""))
    }
  }

  test("pipeline webhook notification posts stage reports as one JSON payload") {
    import graft.pipeline.Pipeline
    withServer(failFirst = 1) { (url, received) => // one 503 to exercise retry
      Pipeline.notifyWebhook(Seq(
        Pipeline.StageReport("ods", ok = true, 1.5, None),
        Pipeline.StageReport("mart", ok = false, 0.2, Some("boom \"quoted\""))), url)
      assert(received.size === 1)
      val body = received.get(0)
      assert(body.contains("\"name\":\"ods\"") && body.contains("\"ok\":false"))
      assert(body.contains("boom \\\"quoted\\\""))
      assert(body.endsWith("\"ok\":false}")) // run-level status
    }
  }

  test("exhausted retries fail the job (at-least-once, never silent loss)") {
    withServer(failFirst = Int.MaxValue) { (url, _) =>
      val df = Seq((1, "u1")).toDF("id", "external_id").coalesce(1)
      val e = intercept[org.apache.spark.SparkException] {
        HttpSink.postJsonBatches(df,
          HttpSink.Config(url, maxRetries = 1, initialBackoffMs = 5))
      }
      assert(e.getMessage.contains("failed") || e.getCause != null)
    }
  }

  test("429 rate-limit responses retry with backoff like 5xx (Braze-style backpressure)") {
    val attempts = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/upsert", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val code = if (attempts.incrementAndGet() <= 2) 429 else 200
        ex.sendResponseHeaders(code, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/upsert"
      val df = Seq((1, "u1")).toDF("id", "external_id").coalesce(1)
      HttpSink.postJsonBatches(df,
        HttpSink.Config(url, maxRetries = 4, initialBackoffMs = 5))
      assert(attempts.get() === 3) // two 429s retried, delivered on the third
    } finally server.stop(0)
  }

  test("a 4xx response fails immediately — no pointless retries of a rejected payload") {
    val attempts = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/upsert", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        attempts.incrementAndGet()
        ex.sendResponseHeaders(422, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/upsert"
      val df = Seq((1, "u1")).toDF("id", "external_id").coalesce(1)
      val e = intercept[org.apache.spark.SparkException] {
        HttpSink.postJsonBatches(df,
          HttpSink.Config(url, maxRetries = 5, initialBackoffMs = 5))
      }
      assert(e.getMessage.contains("422") ||
        Option(e.getCause).exists(_.getMessage.contains("422")))
      assert(attempts.get() === 1) // exactly one attempt — 4xx is final
    } finally server.stop(0)
  }

  test("a hung endpoint trips the request timeout instead of stalling the executor") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/upsert", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Thread.sleep(5000) // far beyond the 500 ms request timeout
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/upsert"
      val df = Seq((1, "u1")).toDF("id", "external_id").coalesce(1)
      val t0 = System.nanoTime()
      val e = intercept[org.apache.spark.SparkException] {
        HttpSink.postJsonBatches(df,
          HttpSink.Config(url, maxRetries = 1, initialBackoffMs = 5,
            requestTimeoutMs = 500))
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(e.getMessage.contains("failed") || e.getCause != null)
      assert(elapsed < 30, s"timeout did not bound the hang: ${elapsed}s")
    } finally server.stop(0)
  }
}

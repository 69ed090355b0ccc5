package graft.ingest

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the REAL [[HttpFetcher]] (not a `Fetcher` fake) against a JDK
  * loopback stub server: status-code branching, tombstone decoding, retry
  * arithmetic, backoff cap, timeout retry — the reference's core loop
  * (`/root/reference/hnarchive.py:98-131`) tested end to end without
  * egress. Backoff sleeps are injected and recorded instead of slept.
  */
class HttpFetcherSpec extends AnyFunSuite {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Starts a stub server, runs `f(baseUrl)`, guarantees shutdown. */
  private def withServer(routes: (String, HttpExchange => Unit)*)(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v0")
    finally server.stop(0)
  }

  test("200 returns the body; maxitem parses; 'null' body is a tombstone") {
    withServer(
      "/v0/item/7.json" -> (respond(_, 200, """{"id":7,"type":"story","time":1}""")),
      "/v0/item/8.json" -> (respond(_, 200, "null")),
      "/v0/maxitem.json" -> (respond(_, 200, "42\n"))
    ) { base =>
      val fetcher = new HttpFetcher(base, sleeper = _ => ())
      assert(fetcher.fetch(7L).exists(_.contains("\"id\":7")))
      assert(fetcher.fetch(8L).isEmpty) // null body -> tombstone (S2/T3)
      assert(fetcher.latestId() == 42L)
    }
  }

  test("429 retries with the quadratic backoff curve, then succeeds") {
    val hits = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    withServer(
      "/v0/item/1.json" -> { ex =>
        if (hits.incrementAndGet() <= 3) respond(ex, 429, "slow down")
        else respond(ex, 200, """{"id":1,"time":1}""")
      }
    ) { base =>
      val fetcher = new HttpFetcher(base, sleeper = sleeps += _)
      assert(fetcher.fetch(1L).nonEmpty)
      assert(hits.get() == 4)
      // 0.2·tries² + 1 seconds for tries = 1, 2, 3 (hnarchive.py:99)
      assert(sleeps.toSeq == Seq(1200L, 1800L, 2800L))
    }
  }

  test("persistent 500 exhausts maxTries and the backoff caps at 10 s") {
    val hits = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    withServer(
      "/v0/item/2.json" -> { ex => hits.incrementAndGet(); respond(ex, 500, "boom") }
    ) { base =>
      val fetcher = new HttpFetcher(base, sleeper = sleeps += _)
      val e = intercept[RuntimeException] { fetcher.fetch(2L) }
      assert(e.getMessage.contains("HTTP 500"))
      assert(hits.get() == 8) // reference: 8 tries (hnarchive.py:121)
      assert(sleeps.length == 7) // no sleep after the final failure
      assert(sleeps.toSeq == Seq(1200L, 1800L, 2800L, 4200L, 6000L, 8200L, 10000L))
    }
  }

  test("non-retryable 404 fails fast with a single request") {
    val hits = new AtomicInteger(0)
    withServer(
      "/v0/item/3.json" -> { ex => hits.incrementAndGet(); respond(ex, 404, "gone") }
    ) { base =>
      val fetcher = new HttpFetcher(base, sleeper = _ => ())
      val e = intercept[RuntimeException] { fetcher.fetch(3L) }
      assert(e.getMessage.contains("HTTP 404"))
      assert(hits.get() == 1) // fail fast: no retries on 4xx (hnarchive.py:111)
    }
  }

  test("request timeout is retried, then succeeds") {
    val hits = new AtomicInteger(0)
    withServer(
      "/v0/item/4.json" -> { ex =>
        if (hits.incrementAndGet() == 1) { Thread.sleep(1500); respond(ex, 200, "late") }
        else respond(ex, 200, """{"id":4,"time":1}""")
      }
    ) { base =>
      val fetcher = new HttpFetcher(base, timeoutMillis = 300, sleeper = _ => ())
      assert(fetcher.fetch(4L).exists(_.contains("\"id\":4")))
      assert(hits.get() >= 2)
    }
  }
}

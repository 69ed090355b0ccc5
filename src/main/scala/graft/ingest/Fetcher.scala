package graft.ingest

/** Item-fetch abstraction (SURVEY.md S1-S4). Implementations must be
  * Serializable: they're shipped into executor tasks by
  * [[BulkFetch.fetchItems]].
  */
trait Fetcher extends Serializable {
  /** Raw JSON body for an id; None = HTTP null body (deleted before
    * archive / never existed — tombstone, hnarchive.py:123-130). */
  def fetch(id: Long): Option[String]

  /** S4 `get_latest_id` (hnarchive.py:156-160): max item id upstream. */
  def latestId(): Long
}

/** Deterministic in-memory fetcher for tests and the zero-egress build —
  * the scripted stand-in for the HN Firebase API. */
final class FakeFetcher(items: Map[Long, String], maxId: Long) extends Fetcher {
  def fetch(id: Long): Option[String] = items.get(id)
  def latestId(): Long = maxId
}

/** Real HTTP fetcher with the reference's retry curve (S1: 8 tries,
  * quadratic backoff a=0.2 c=1 capped 10 s, 2 s timeout;
  * hnarchive.py:98-121). The zero-egress build exercises it against a
  * loopback stub server (HttpFetcherSpec); `sleeper` injects the backoff
  * sleep so those tests replay the retry curve without wall-clock cost.
  */
final class HttpFetcher(
    baseUrl: String = "https://hacker-news.firebaseio.com/v0",
    maxTries: Int = 8,
    timeoutMillis: Int = 2000,
    sleeper: Long => Unit = Thread.sleep(_)) extends Fetcher {

  @transient private lazy val client =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis)).build()

  private def get(url: String): String = {
    var tries = 0
    var last: Throwable = null
    while (tries < maxTries) {
      var fatal: RuntimeException = null
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMillis)).GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code == 200) return resp.body()
        if (code != 429 && code < 500)
          // non-retryable 4xx: fail fast (reference raises, hnarchive.py:111)
          fatal = new RuntimeException(s"HTTP $code for $url")
        else
          last = new RuntimeException(s"HTTP $code for $url")
      } catch { case t: Throwable => last = t }
      if (fatal != null) throw fatal
      tries += 1
      if (tries < maxTries)
        // quadratic backoff: 0.2·tries² + 1, capped at 10 s (hnarchive.py:99)
        sleeper(math.min(10000L, (200L * tries * tries) + 1000L))
    }
    throw last
  }

  def fetch(id: Long): Option[String] =
    Option(get(s"$baseUrl/item/$id.json")).filter(b => b.nonEmpty && b != "null")

  def latestId(): Long = get(s"$baseUrl/maxitem.json").trim.toLong
}

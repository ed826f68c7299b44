package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.util.QueryExecutionListener

import java.time.Instant
import scala.collection.concurrent.TrieMap

/** Operator-level telemetry (SURVEY.md §2.F F5, §2.J J8).
  *
  * The reference threads go-metrics counters/timers through every
  * operator (ct-fetch.go:48,53,226-235; rediscache.go:58) and dumps
  * them on a timer (telemetry/telemetry.go). Spark-first, the same
  * signal comes from `Dataset.observe` — named aggregate expressions
  * evaluated inline with the plan (no second pass over the data, no
  * driver round-trips) and delivered to listeners per action / per
  * micro-batch.
  *
  * The staleness health probe mirrors ct-fetch's `/health` handler
  * (ct-fetch.go:566-608): 503 before the first progress, 500 once the
  * last update is older than 2 × the polling cadence, 200 otherwise.
  */
object Observability {

  /** F5: attach named observed metrics to a plan (batch or streaming).
    * Metrics must be aggregate expressions; they piggyback on the
    * existing pass over the data. */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*): DataFrame = {
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** Collects observation results as actions / micro-batches complete.
    * Register with `spark.listenerManager.register(listener)`. */
  final class MetricsListener extends QueryExecutionListener {
    private val collected = TrieMap.empty[String, Map[String, Any]]

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        collected.put(name, row.getValuesMap[Any](row.schema.fieldNames.toIndexedSeq))
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      ()

    /** Latest observed values for a metric name, if any action carrying
      * it has completed. */
    def get(name: String): Option[Map[String, Any]] = collected.get(name)
  }

  // ---- J8: staleness health probe ----------------------------------------

  sealed abstract class Health(val httpCode: Int)
  /** No progress recorded yet (ct-fetch.go:573-577). */
  case object Starting extends Health(503)
  /** Last progress older than 2 × the polling cadence (ct-fetch.go:582). */
  case object Stale extends Health(500)
  case object Ok extends Health(200)

  /** Health of a streaming query given the configured polling cadence.
    * `now` is injectable for tests. */
  def health(query: StreamingQuery, pollingDelayMeanMs: Long,
      now: Instant = Instant.now()): Health = {
    val p = if (query == null) null else query.lastProgress
    if (p == null) Starting
    else {
      val last = Instant.parse(p.timestamp)
      if (now.toEpochMilli - last.toEpochMilli > 2 * pollingDelayMeanMs) Stale
      else Ok
    }
  }

  /** The `/health` probe bound to an actual listener (GraftConfig's
    * `healthAddr`, same key as the reference; handler semantics and
    * message shapes per ct-fetch.go:566-597 — 503 + `Retry-After: 30`
    * before the first progress, 500 past 2 × pollingDelayMean, 200
    * otherwise). JDK built-in HttpServer: no dependency, one daemon
    * thread; `query` is a thunk so the server can come up BEFORE the
    * streaming query starts, reporting Starting until it does. */
  final class HealthServer private[Observability] (
      server: com.sun.net.httpserver.HttpServer) extends AutoCloseable {
    /** The bound port (useful with an ephemeral `:0` bind). */
    def port: Int = server.getAddress.getPort
    override def close(): Unit = server.stop(0)
  }

  object HealthServer {
    /** Bind `addr` (`host:port` or `:port`, port 0 = ephemeral) and
      * serve GET /health. `now` is injectable for tests. */
    def start(addr: String, pollingDelayMeanMs: Long,
        query: () => StreamingQuery,
        now: () => Instant = () => Instant.now()): HealthServer = {
      val (host, port) = addr.lastIndexOf(':') match {
        case -1 => ("", addr.toInt)
        case i  => (addr.substring(0, i), addr.substring(i + 1).toInt)
      }
      val sock =
        if (host.isEmpty) new java.net.InetSocketAddress(port)
        else new java.net.InetSocketAddress(host, port)
      val server = com.sun.net.httpserver.HttpServer.create(sock, 0)
      server.createContext("/health", (exchange: com.sun.net.httpserver.HttpExchange) => {
        val h = health(query(), pollingDelayMeanMs, now())
        val msg = h match {
          case Starting => "error: no health updates yet, Retry-After 30 seconds"
          case Stale =>
            s"error: longer than 2 * pollingDelayMean (${2 * pollingDelayMeanMs}ms) since last update"
          case Ok =>
            s"ok: shorter than 2 * pollingDelayMean (${2 * pollingDelayMeanMs}ms) since last update"
        }
        if (h == Starting) exchange.getResponseHeaders.add("Retry-After", "30")
        val bytes = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(h.httpCode, bytes.length.toLong)
        val out = exchange.getResponseBody
        try out.write(bytes) finally out.close()
      })
      server.start()
      new HealthServer(server)
    }
  }
}

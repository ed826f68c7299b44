package graft.config

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's configuration surface (config/config.go:18-39,
  * 149-214) re-keyed for the Spark engine. Same key names, same
  * precedence: environment variable > ini file > default, with the
  * CLI flags (`-config`, `-offset`, `-limit`) applied last
  * (config.go:203-212).
  *
  * Keys that configured the reference's private infrastructure map to
  * Spark-owned equivalents and are accepted but unused here:
  * redisHost/redisTimeout (state store + checkpoint dir),
  * googleProjectId (storage layer), statsdHost/statsdPort
  * (`Dataset.observe` + listeners), numThreads (executor/core count —
  * the session's to set), savePeriod (the reference checkpoints its
  * offsets on a 15-min ticker, ct-fetch.go:307-312; Structured
  * Streaming commits offsets per micro-batch, which is strictly
  * finer), pollingDelayStdDev (the reference Gaussian-jitters each
  * fetcher's poll, ct-fetch.go:551-552, to desynchronize a FLEET of
  * pollers hitting the same logs; the single Spark driver owns every
  * log's cadence, so a fixed `pollingDelayMean` ProcessingTime
  * trigger reproduces the intent — only the mean is wired).
  */
final case class GraftConfig(
    logList: Seq[String],
    certPath: String,
    offset: Long,
    limit: Long,
    numThreads: Int,
    runForever: Boolean,
    pollingDelayMean: String,
    pollingDelayStdDev: Int,
    savePeriod: String,
    issuerCNFilter: Seq[String],
    logExpiredEntries: Boolean,
    healthAddr: String,
    /** Engine extension (no reference key — the reference picks the
      * resolution per call site, types.go:21-23): expiry-bucket
      * resolution for ingest; `false` = day buckets. */
    hourResolution: Boolean) {

  /** Spark ProcessingTime trigger string for the daemon poll cadence. */
  def pollTrigger: String = GraftConfig.goDurationToSpark(pollingDelayMean)
}

object GraftConfig {

  /** Go duration literal ("10m", "1h30m", "125ms", "5s") → Spark
    * interval string in milliseconds. */
  def goDurationToSpark(d: String): String = {
    val re = """(\d+)(ms|s|m|h)""".r
    val ms = re.findAllMatchIn(d).map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "ms" => n
        case "s"  => n * 1000
        case "m"  => n * 60000
        case "h"  => n * 3600000
      }
    }.sum
    require(ms > 0, s"unparseable duration: '$d'")
    s"$ms milliseconds"
  }

  /** Minimal ini reader: `key = value` lines, `#`/`;` comments,
    * section headers ignored (the reference reads the default
    * section). */
  private[config] def parseIni(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || l.startsWith(";") || l.startsWith("["))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap

  def load(args: Seq[String] = Nil,
      env: Map[String, String] = sys.env): GraftConfig = {
    // CLI: -config <file> -offset <n> -limit <n> (config.go:154-156)
    val cli = args.sliding(2, 2).collect {
      case Seq(k, v) if k.startsWith("-") => k.stripPrefix("-") -> v
    }.toMap
    val iniText = cli.get("config")
      .orElse {
        val home = Paths.get(sys.props.getOrElse("user.home", "/root"), ".ct-fetch.ini")
        if (Files.exists(home)) Some(home.toString) else None
      }
      .filter(p => Files.exists(Paths.get(p)))
      .map(p => new String(Files.readAllBytes(Paths.get(p))))
      .getOrElse("")
    val ini = parseIni(iniText)

    def conf(key: String, default: String): String =
      env.getOrElse(key, ini.getOrElse(key, default))
    def confLong(key: String, default: Long): Long =
      try conf(key, default.toString).toLong catch { case _: Throwable => default }
    def confBool(key: String, default: Boolean): Boolean =
      conf(key, default.toString).equalsIgnoreCase("true")
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    val base = GraftConfig(
      logList = csv(conf("logList", "")),
      certPath = conf("certPath", ""),
      offset = confLong("offset", 0L),
      limit = confLong("limit", 0L),
      numThreads = confLong("numThreads", 1L).toInt,
      runForever = confBool("runForever", default = false),
      pollingDelayMean = conf("pollingDelayMean", "10m"),
      pollingDelayStdDev = confLong("pollingDelayStdDev", 10L).toInt,
      savePeriod = conf("savePeriod", "15m"),
      issuerCNFilter = csv(conf("issuerCNFilter", "")),
      logExpiredEntries = confBool("logExpiredEntries", default = false),
      healthAddr = conf("healthAddr", ":8080"),
      hourResolution = confBool("hourResolution", default = true))

    // CLI overrides last (config.go:203-212: only when > 0)
    val withOffset = cli.get("offset").map(_.toLong).filter(_ > 0)
      .fold(base)(o => base.copy(offset = o))
    cli.get("limit").map(_.toLong).filter(_ > 0)
      .fold(withOffset)(l => withOffset.copy(limit = l))
  }
}

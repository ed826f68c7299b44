package graft.config

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Config precedence and parsing (config/config.go:41-214 semantics:
  * env > ini > default; CLI -offset/-limit override last, only when
  * positive). */
class GraftConfigSpec extends AnyFunSuite {

  private def iniFile(text: String): String = {
    val p = Files.createTempFile("cfg", ".ini")
    Files.writeString(p, text)
    p.toString
  }

  test("defaults match the reference's") {
    val c = GraftConfig.load(env = Map.empty)
    assert(c.offset == 0L && c.limit == 0L && c.numThreads == 1)
    assert(!c.runForever && !c.logExpiredEntries)
    assert(c.pollingDelayMean == "10m" && c.pollingDelayStdDev == 10)
    assert(c.savePeriod == "15m" && c.healthAddr == ":8080")
    assert(c.logList.isEmpty && c.issuerCNFilter.isEmpty)
    assert(c.hourResolution, "hour buckets by default")
    assert(!GraftConfig.load(env = Map("hourResolution" -> "false")).hourResolution)
  }

  test("ini overrides defaults; env overrides ini; CLI overrides env") {
    val ini = iniFile(
      """# comment
        |logList = /logs/a, /logs/b
        |offset = 5
        |limit = 100
        |runForever = true
        |issuerCNFilter = Foo, Bar
        |""".stripMargin)
    val fromIni = GraftConfig.load(Seq("-config", ini), env = Map.empty)
    assert(fromIni.logList == Seq("/logs/a", "/logs/b"))
    assert(fromIni.offset == 5L && fromIni.limit == 100L && fromIni.runForever)
    assert(fromIni.issuerCNFilter == Seq("Foo", "Bar"))

    val withEnv = GraftConfig.load(Seq("-config", ini),
      env = Map("offset" -> "7", "runForever" -> "false"))
    assert(withEnv.offset == 7L && !withEnv.runForever)
    assert(withEnv.limit == 100L, "unset env keys still come from ini")

    val withCli = GraftConfig.load(Seq("-config", ini, "-offset", "9"),
      env = Map("offset" -> "7"))
    assert(withCli.offset == 9L)
    // CLI zero is "unset" (config.go:203-205)
    val cliZero = GraftConfig.load(Seq("-config", ini, "-offset", "0"),
      env = Map.empty)
    assert(cliZero.offset == 5L)
  }

  test("Go durations convert to Spark trigger intervals") {
    assert(GraftConfig.goDurationToSpark("10m") == "600000 milliseconds")
    assert(GraftConfig.goDurationToSpark("125ms") == "125 milliseconds")
    assert(GraftConfig.goDurationToSpark("1h30m") == "5400000 milliseconds")
    assert(GraftConfig.goDurationToSpark("5s") == "5000 milliseconds")
    intercept[IllegalArgumentException](GraftConfig.goDurationToSpark("nope"))
  }
}

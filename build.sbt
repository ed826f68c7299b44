ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ctmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// -oD: per-test durations in the report, so slow suites are visible
// from any single run (the suite's wall clock is driver-gated).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// ---- parallel forked test groups --------------------------------------
// One sequential test JVM needs ~32 min of wall (653 tests driving ~28k
// Spark stages), which outgrew the driver's verification window. The
// suites are split across four CONCURRENTLY-forked JVMs, each with its
// own SparkSession — so per-suite session-conf mutations cannot race
// (unlike same-JVM suite parallelism). Cross-JVM access to the shared
// content-keyed stores (.segcache / its warehouse tables) is serialized
// by IndexStore's build lock, so a cold cache is built once and
// registered by the others. Groups are balanced greedily (LPT) by the
// measured per-suite walls below (sequential -oD run, 2026-08-18);
// suites not listed get a small default weight.
val testGroupCount = 4
val testSuiteSeconds: Map[String, Int] = Map(
  "graft.InventorySpec" -> 277,
  "graft.llm.RetrievalStreamSpec" -> 186,
  "graft.llm.SimilaritySpec" -> 89,
  "graft.llm.StreamingCurationSpec" -> 62,
  "graft.tools.DataCardSpec" -> 54,
  "graft.PlanSpec" -> 52,
  "graft.llm.TextDedupSpec" -> 51,
  "graft.llm.PipelineSpec" -> 47,
  "graft.streaming.IngestSpec" -> 39,
  "graft.streaming.GenerationLogPropsSpec" -> 36,
  "graft.llm.NativeKernelSpec" -> 30,
  "graft.llm.ProductionLoopSpec" -> 30,
  "graft.streaming.StreamingTemporalSpec" -> 28,
  "graft.llm.RetrievalPropsSpec" -> 26,
  "graft.streaming.ScopedBatchedMergeSpec" -> 26,
  "graft.llm.RetrievalSpec" -> 24,
  "graft.llm.RetrievalMaxScoreSpec" -> 22,
  "graft.functions.SumTopKPropsSpec" -> 16,
  "graft.llm.TextAnalysisSpec" -> 16,
  "graft.llm.ClassifierSpec" -> 16,
  "graft.streaming.ObservabilitySpec" -> 15,
  "graft.llm.CurationSpec" -> 14,
  "graft.tools.CliSpec" -> 13,
  "graft.sources.PemStoreSpec" -> 12,
)
Test / testGrouping := {
  val forkOpts = ForkOptions().withRunJVMOptions(
    (Test / javaOptions).value.toVector)
  val sorted = (Test / definedTests).value
    .sortBy(t => (-testSuiteSeconds.getOrElse(t.name, 5), t.name))
  val binTests = Array.fill(testGroupCount)(
    scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
  val binLoad = Array.fill(testGroupCount)(0)
  sorted.foreach { t =>
    val i = binLoad.indexOf(binLoad.min)
    binTests(i) += t
    binLoad(i) += testSuiteSeconds.getOrElse(t.name, 5)
  }
  binTests.toSeq.zipWithIndex.map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toSeq, Tests.SubProcess(forkOpts))
  }
}
// sbt caps concurrent forked test groups at 1 by default
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount + 2,
    java.lang.Runtime.getRuntime.availableProcessors())))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

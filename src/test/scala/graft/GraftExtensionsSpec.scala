package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must make every
  * `graft_*` kernel callable from SQL with no per-session register()
  * call — the cluster deployment path. */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("extensions-built session exposes the kernels as built-ins") {
    spark // materialize the shared session/context first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // fresh session over the same SparkContext; extensions apply at
      // session construction. (`spark.sql.extensions` is a static conf
      // read only at a fresh JVM's context build, so the in-process
      // test injects the same class through withExtensions — identical
      // code path from SparkSessionExtensions onwards.)
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_fingerprint('a b c') fp,
          |       graft_simhash64(array(CAST(5 AS BIGINT))) sh,
          |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) d,
          |       graft_minhash_sig(array(CAST(7 AS BIGINT)), 4) ms,
          |       graft_shingle_hashes('x y z w', 3, true) th,
          |       graft_signlsh(array_repeat(CAST(0.5 AS FLOAT), 64), 16, 64, CAST(42 AS BIGINT)) sl
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) > 0)
      assert(r.getLong(1) == 5L, "simhash of a single hash is the hash's bits")
      assert(r.getDouble(2) == 11.0)
      assert(r.getSeq[Long](3).length == 4)
      assert(r.getSeq[Long](4).length == 2, "two distinct trigrams in 4 tokens")
      // the aggregate registers too
      val agg = s2.sql(
        """SELECT graft_minhash_agg(th, 8) FROM
          |  (SELECT graft_shingle_hashes('a b c d', 3, true) th)""".stripMargin)
        .collect()(0).getSeq[Long](0)
      assert(agg.length == 8)
      // round-4 kernels: md5 shingles and the bloom build/probe pair
      val r4 = s2.sql(
        """SELECT graft_shingle_hashes_md5('x y z w', 3, true) th5,
          |       graft_fingerprint_md5('a b c') fp5""".stripMargin).collect()(0)
      assert(r4.getSeq[Long](0).length == 2 && r4.getLong(1) > 0)
      val bloom = s2.sql(
        """WITH b AS (SELECT graft_bloom_agg(x, CAST(100 AS BIGINT)) bf
          |           FROM (SELECT CAST(42 AS BIGINT) AS x))
          |SELECT graft_bloom_might_contain((SELECT bf FROM b), CAST(42 AS BIGINT)) hit,
          |       graft_bloom_might_contain((SELECT bf FROM b), CAST(43 AS BIGINT)) miss"""
          .stripMargin).collect()(0)
      assert(bloom.getBoolean(0), "inserted key must probe true")
      assert(!bloom.getBoolean(1), "absent key probes false at this sizing")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

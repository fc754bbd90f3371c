package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("withExtensions exposes graft functions to pure SQL") {
    // getOrCreate() would reuse the suite-shared session and silently
    // skip extension injection; force a fresh SparkSession (over the
    // same SparkContext) and restore the defaults afterwards.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT dot_product_d(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                     array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
          |       sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 4.0)
      assert(r.getInt(1) == 2)
      val r2 = s2.sql(
        """SELECT simhash_of('a b a') AS sh,
          |       size(minhash_sig_of('w1 w2 w3 w4', 3)) AS nsig,
          |       sorted_long_intersect_count(packed_char_ngrams('abcde', 4),
          |                                   packed_char_ngrams('bcdef', 4)) AS np
          |""".stripMargin).collect().head
      assert(r2.getLong(0) != 0L)
      assert(r2.getInt(1) == 16)
      assert(r2.getInt(2) == 1) // shared 4-gram: "bcde"
      val r3 = s2.sql(
        """SELECT size(char_windows('abcdef', 3)) AS nw,
          |       quality_counts_of('the the fox').n_distinct AS nd
          |""".stripMargin).collect().head
      assert(r3.getInt(0) == 4)
      assert(r3.getInt(1) == 2)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

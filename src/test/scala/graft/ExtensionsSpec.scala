package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions can call vec_dot from pure SQL, no registration call.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions installs vec_dot for SQL sessions") {
    val orig = spark // force-create the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSession = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val d = extSession.sql(
        "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d")
        .first().getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}

package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Round0HalfUp ≡ Spark round(_, 0) on adversarial and random doubles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val halves = (-6 to 5).map(_ + 0.5) // exact .5 boundaries, both signs
    val nearHalves = (halves ++ halves.map(-_)).flatMap(h =>
      Seq(Math.nextDown(h), Math.nextUp(h)))
    val big = Seq(math.pow(2, 52), -math.pow(2, 52),
      math.pow(2, 53) + 2, 9.000000123e9, -9.000000123e9)
    val special = Seq(0.0, -0.0, 1e-300, -1e-300,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val rnd = new scala.util.Random(151)
    val randoms = Seq.fill(4000)((rnd.nextDouble() - 0.5) * 4e6) ++
      Seq.fill(1000)(rnd.nextGaussian()) // micro-scale + unit-scale
    val xs = (halves ++ nearHalves ++ big ++ special ++ randoms).toDF("x")
    val out = xs.select(col("x"),
        round(col("x"), 0).as("viaBigDecimal"),
        graft.functions.VectorOps.round0(col("x")).as("viaNative"))
      .collect()
    out.foreach { r =>
      val a = r.getDouble(1); val b = r.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b),
        s"round0 diverged on x=${r.getDouble(0)}: round=$a native=$b " +
          s"(nulls: ${r.isNullAt(1)}/${r.isNullAt(2)})")
    }
  }

  test("LiteralMapLookup ≡ element_at on a map literal (codegen + " +
    "interpreted, null on miss, null key)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val entries = (0 until 5000).map(i => s"k$i" -> i.toLong * 7).toMap
    val avg = (0 until 50).map(i => s"f$i" -> i / 3.0).toMap
    val keys = ((0 until 6000 by 3).map(i => s"k$i") :+ "absent")
      .toDF("k").withColumn("k", when(col("k") === "k999", lit(null))
        .otherwise(col("k"))) // one NULL key in the stream
    val viaLit = keys.select(col("k"),
      element_at(typedlit(entries), col("k")).as("v")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toSeq
    def run(codegen: String): Seq[(String, Any)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try keys.select(col("k"),
        graft.functions.MapLookup.longLookup(col("k"), entries).as("v"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == viaLit, "codegen lookup diverged")
    assert(run("NO_CODEGEN") == viaLit, "interpreted lookup diverged")
    // the Double shape (avgdl) — spot value + miss
    val d = Seq("f9", "nope").toDF("k").select(
      graft.functions.MapLookup.doubleLookup(col("k"), avg).as("v")).collect()
    assert(d(0).getDouble(0) == 3.0 && d(1).isNullAt(0))
  }

  test("registered SQL functions match the Column-API expressions") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  vec_euclid(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS e,
        |  vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  vec_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS cz,
        |  int8_dot(array(127, -128), array(2, 2)) AS d,
        |  hamming_dist('10110', '10011') AS h,
        |  rect_min_dist(array(0.0D, 0.0D, 1.0D, 1.0D),
        |                array(4.0D, 5.0D, 6.0D, 7.0D)) AS rm,
        |  rect_min_dist(array(0.0D, 0.0D, 2.0D, 2.0D),
        |                array(1.0D, 1.0D, 3.0D, 3.0D)) AS rov,
        |  char_entropy_micro('ab') AS ent,
        |  char_entropy_micro('aaaa') AS ent0,
        |  char_entropy_micro('Ab') AS entU,
        |  long_l2_sq(array(0L, 0L), array(3L, -4L)) AS l2
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("e") == 5.0)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("cz") == 0.0, "zero-norm vector must yield 0, not NaN")
    assert(r.getAs[Long]("d") == 127L * 2 - 128L * 2)
    assert(r.getAs[Int]("h") == 2)
    assert(r.getAs[Double]("rm") == 5.0) // gap dx=3, dy=4
    assert(r.getAs[Double]("rov") == 0.0) // overlapping boxes
    assert(r.getAs[Long]("ent") == 693148L) // 2 * round-half-up micronats of ln 2
    assert(r.getAs[Long]("ent0") == 0L)
    // ASCII case folds inside the expression: 'Ab' ≡ 'ab'
    assert(r.getAs[Long]("entU") == 693148L)
    assert(r.getAs[Long]("l2") == 25L)
  }

  test("blocklist_hits and cdc_chunks run from SQL with literal parameters") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  blocklist_hits('one merge batch here',
        |                 array('merge', 'merge batch', 'zz')) AS bh,
        |  blocklist_hits('clean text', array('merge')) AS bz,
        |  cdc_chunks('tiny', 8) AS ct
        |""".stripMargin).collect().head
    assert(r.getAs[Int]("bh") == 2)
    assert(r.getAs[Int]("bz") == 0)
    val md5tiny = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r.getSeq[String](r.fieldIndex("ct")) == Seq(md5tiny.take(16)))
    // non-literal parameters are rejected at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT cdc_chunks('x', length('abc') + id) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("functions run inside SQL over a table (codegen path)") {
    GraftFunctions.registerAll(spark)
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    emb.createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT count(*) AS n FROM emb_sql a JOIN emb_sql b ON a.vec_id < b.vec_id
        |WHERE vec_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                 CAST(b.embedding AS ARRAY<DOUBLE>)) > 0.99
        |  AND a.vec_id < 20 AND b.vec_id < 20""".stripMargin)
      .collect().head.getLong(0)
    assert(n >= 0) // executes through codegen without error
  }

  test("GraftExtensions injects the same function set") {
    // the injector is exercised structurally (a live session with its own
    // extensions would need a fresh SparkContext); builder outputs must
    // match the Column-API expressions
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.functions.{array, lit}
    val a = GraftShim.expression(array(lit(0.0), lit(3.0)))
    val b = GraftShim.expression(array(lit(4.0), lit(0.0)))
    val builder = GraftFunctions.all.toMap.apply("vec_euclid")
    assert(builder(Seq(a, b)).isInstanceOf[graft.functions.EuclideanDistance])
    assert(new GraftExtensions() != null) // loadable via spark.sql.extensions
  }
}

package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

class FunctionsSpec extends SparkSuite {

  // ---- TopKAgg ----
  test("TopKAgg agrees with sort-take on random inputs, any merge order") {
    val rnd = new Random(42)
    val agg = TopKAgg(3)
    for (_ <- 1 to 200) {
      val xs = Seq.fill(rnd.nextInt(30))(rnd.nextLong() % 1000)
      // random partition into buffers, reduced then merged pairwise
      val bufs = xs.grouped(math.max(1, rnd.nextInt(5) + 1))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val expected = xs.sorted(Ordering[Long].reverse).take(3)
      assert(agg.finish(merged) == expected.mkString(","))
    }
  }

  test("TopKAgg buffer never exceeds k") {
    val agg = TopKAgg(3)
    val buf = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(buf.size == 3 && buf == Seq(100L, 99L, 98L))
  }

  // ---- BottomKPairsTagAgg ----
  test("BottomKPairsTagAgg selects exactly BottomKPairsAgg's tuples " +
      "with max-of-duplicates tags, any merge order") {
    val rnd = new Random(4242)
    val k = 4
    val tagged = BottomKPairsTagAgg(k)
    val plain = BottomKPairsAgg(k)
    for (_ <- 1 to 300) {
      // small key space so duplicate (a, b) tuples with different tags
      // are common — the case the tag-merge exists for
      val xs = Seq.fill(rnd.nextInt(40))(
        (rnd.nextInt(6).toLong, rnd.nextInt(6).toLong,
          rnd.nextInt(2).toLong))
      val bufsT = xs.grouped(math.max(1, rnd.nextInt(5) + 1))
        .map(_.foldLeft(tagged.zero)(tagged.reduce)).toSeq
      val mergedT = tagged.finish(
        bufsT.foldLeft(tagged.zero)(tagged.merge))
      val bufsP = xs.map(x => (x._1, x._2))
        .grouped(math.max(1, rnd.nextInt(5) + 1))
        .map(_.foldLeft(plain.zero)(plain.reduce)).toSeq
      val mergedP = plain.finish(bufsP.foldLeft(plain.zero)(plain.merge))
      // identical tuple selection (tag never affects ordering/distinct)
      assert(mergedT.map(x => (x._1, x._2)) == mergedP)
      // tag = max over every duplicate of a surviving tuple
      val maxTag = xs.groupBy(x => (x._1, x._2))
        .view.mapValues(_.map(_._3).max).toMap
      mergedT.foreach { case (a, b, t) => assert(t == maxTag((a, b))) }
    }
  }

  // ---- DotLong ----
  test("native DotLong equals the aggregate/zip_with composition") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(80) + 1
      (Seq.fill(n)(rnd.nextLong() % 100000),
        Seq.fill(n)(rnd.nextLong() % 100000))
    } :+ ((Seq(0L), Seq(0L)))
    val df = rows.toDF("a", "b")
    val mismatches = df.select(
        DotLong(col("a"), col("b")).as("native"),
        DotLong.composed(col("a"), col("b")).as("composed"))
      .where(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
    // norm form: dot(q, q) is non-negative
    assert(df.select(min(DotLong(col("a"), col("a")))).head.getLong(0) >= 0)
    // null propagation
    val withNull = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
    assert(withNull.select(DotLong(col("a"), col("b"))).head.isNullAt(0))
  }

  test("PackS16 round-trips through DotPackedS16 identically to DotLong") {
    import spark.implicits._
    val rnd = new Random(13)
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(80) + 1
      // the quantized-embedding envelope: floor(x*4096) of |x| <= ~1
      (Seq.fill(n)((rnd.nextInt(8193) - 4096).toLong),
        Seq.fill(n)((rnd.nextInt(8193) - 4096).toLong))
    } :+ ((Seq(32767L, -32768L), Seq(-32768L, 32767L))) // range edges
    val df = rows.toDF("a", "b")
    val mismatches = df.select(
        DotPackedS16(PackS16(col("a")), PackS16(col("b"))).as("packed"),
        DotLong(col("a"), col("b")).as("native"))
      .where(col("packed") =!= col("native"))
      .count()
    assert(mismatches == 0)
    // out-of-range components fail loudly, never wrap
    val e = intercept[Exception] {
      Seq(Seq(32768L)).toDF("a").select(PackS16(col("a"))).collect()
    }
    assert(e.getMessage.contains("int16") ||
      Option(e.getCause).exists(_.getMessage.contains("int16")),
      e.getMessage)
  }

  test("DotLong matches zip_with on edge shapes: length mismatch, null elements") {
    import spark.implicits._
    // zip_with pads the shorter array with nulls → composed sum is
    // NULL; native must agree, not truncate
    val edge = Seq(
      (Seq[Option[Long]](Some(1L), Some(2L)),
        Seq[Option[Long]](Some(3L))), // length mismatch
      (Seq[Option[Long]](Some(1L), None),
        Seq[Option[Long]](Some(3L), Some(4L))), // null element
      (Seq[Option[Long]](Some(2L), Some(3L)),
        Seq[Option[Long]](Some(4L), Some(5L))) // clean
    ).toDF("a", "b")
    val rows = edge.select(
      DotLong(col("a"), col("b")).as("native"),
      DotLong.composed(col("a"), col("b")).as("composed")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 8 + 15)
    // SQL registry rejects wrong element types at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT dot_long(array(1, 2), array(3, 4))").collect()
    }
    assert(err.getMessage.contains("dot_long"))
  }

  // ---- GraftExtensions (SQL registration) ----
  test("native functions are callable from spark.sql via extensions") {
    val row = spark.sql(
      """SELECT md5long56('abc') AS h,
        |  dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |  md5long56(42) AS hc""".stripMargin).head
    // against the Column-API native forms
    import spark.implicits._
    val want = Seq("abc", "42").toDF("s")
      .select(CrossHash.md5Long(col("s"))).collect().map(_.getLong(0))
    assert(row.getLong(0) == want(0))
    assert(row.getLong(1) == 4 + 10 + 18)
    assert(row.getLong(2) == want(1)) // non-string input is cast first
  }

  // ---- Md5Long56 ----
  test("native Md5Long56 equals the built-in composition on random strings") {
    import spark.implicits._
    val rnd = new Random(7)
    val strings = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq("", "a", "the quick brown fox", "héllo wörld 你好")
    val df = strings.toDF("s")
    val mismatches = df.select(
        CrossHash.md5Long(col("s")).as("native"),
        CrossHash.md5LongComposed(col("s")).as("composed"))
      .where(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
    // values are non-negative 56-bit
    val max = df.select(org.apache.spark.sql.functions.max(
      CrossHash.md5Long(col("s")))).head.getLong(0)
    assert(max >= 0 && max < (1L << 56))
  }

  test("Md5Long56 works inside higher-order lambdas (transform)") {
    import spark.implicits._
    val df = Seq(Seq("x", "y", "z")).toDF("toks")
    val viaLambda = df.select(
      transform(col("toks"), t => CrossHash.md5Long(t)).as("hs"))
      .head.getSeq[Long](0)
    val direct = Seq("x", "y", "z").map(s =>
      Md5Long56.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaLambda == direct)
  }

  // ---- Skew.saltedJoin ----
  test("salted join returns exactly the plain join's result") {
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(o, c, "o_custkey", n = 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads a hot key across reducers") {
    import spark.implicits._
    // one key dominates: 10k rows of key=1, a handful of others
    val hot = (1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (i.toLong + 1, i.toLong))
    val large = hot.toDF("k", "payload")
    val salts = large
      .withColumn("__salt", pmod(xxhash64(large.columns.map(col).toSeq: _*),
        lit(8)))
      .where(col("k") === 1L)
      .groupBy(col("__salt")).count().collect()
    assert(salts.length == 8) // the hot key occupies all 8 salt buckets
    assert(salts.map(_.getLong(1)).max < 10000 * 0.25) // no bucket hogs it
  }
}

package graft

import graft.functions.{Fnv1aCore, Fnv1aHash, GraftFunctions => F}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** Golden vectors from the reference's own tests
  * (/root/reference/src/algo/fnv1a.rs:101-170) + algebraic properties. */
class Fnv1aSpec extends SparkSuite {
  // deterministic property loops (no scalatestplus bridge in offline cache)
  private val rnd = new scala.util.Random(42)

  test("fresh state is the offset basis (fnv1a.rs:101-106)") {
    assert(Fnv1aCore.OffsetBasis === 0xcbf29ce484222325L)
  }

  test("golden: 1337 as i32/u32 (fnv1a.rs:117-133)") {
    assert(Fnv1aCore.hashInt(1337, Fnv1aCore.OffsetBasis) === 0x9358f934873276dbL)
  }

  test("golden: 1337 as i64/u64 (fnv1a.rs:135-151)") {
    assert(Fnv1aCore.hashLong(1337L, Fnv1aCore.OffsetBasis) === 0x41ff8641d035260bL)
  }

  test("golden: false (fnv1a.rs:153-159)") {
    assert(Fnv1aCore.hashBoolean(false, Fnv1aCore.OffsetBasis) === 0x4b91cd1c0e0a959cL)
  }

  test("golden: bytes of \"deadbeef\" (fnv1a.rs:161-170)") {
    assert(Fnv1aCore.hashBytes("deadbeef".getBytes("UTF-8"), Fnv1aCore.OffsetBasis)
      === 0xcd4f3b6f56d93515L)
  }

  test("expression matches core through codegen path") {
    import spark.implicits._
    val row = Seq((1337, 1337L, false, "deadbeef"))
      .toDF("i", "l", "b", "s")
      .select(F.fnv1a($"i"), F.fnv1a($"l"), F.fnv1a($"b"), F.fnv1a($"s"))
      .head()
    assert(row.getLong(0) === 0x9358f934873276dbL)
    assert(row.getLong(1) === 0x41ff8641d035260bL)
    assert(row.getLong(2) === 0x4b91cd1c0e0a959cL)
    assert(row.getLong(3) === 0xcd4f3b6f56d93515L)
  }

  test("chaining equals concatenation (fnv1a.rs:9-11,68-79)") {
    for (_ <- 1 to 200) {
      val a = rnd.nextInt(); val b = rnd.nextLong()
      val chained = Fnv1aCore.hashLong(b, Fnv1aCore.hashInt(a, Fnv1aCore.OffsetBasis))
      val le = java.nio.ByteBuffer.allocate(12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(a).putLong(b).array()
      assert(chained === Fnv1aCore.hashBytes(le, Fnv1aCore.OffsetBasis))
    }
  }

  test("seeded = continuing from prior state (fnv1a.rs:26-28)") {
    for (_ <- 1 to 200) {
      val seed = rnd.nextLong(); val v = rnd.nextInt()
      assert(Fnv1aCore.hashInt(v, seed) ===
        Fnv1aHash(Seq(Literal(v)), seed).eval(null))
    }
  }

  test("multi-column expression chains state") {
    import spark.implicits._
    val got = Seq((1337, "deadbeef")).toDF("i", "s")
      .select(F.fnv1a($"i", $"s")).head().getLong(0)
    val want = Fnv1aCore.hashBytes("deadbeef".getBytes("UTF-8"),
      Fnv1aCore.hashInt(1337, Fnv1aCore.OffsetBasis))
    assert(got === want)
  }

  test("null input nulls the hash") {
    import spark.implicits._
    val r = Seq((Some(1), Option.empty[String])).toDF("i", "s")
      .select(F.fnv1a($"i", $"s")).head()
    assert(r.isNullAt(0))
  }

  test("SQL registration works") {
    F.registerSql(spark)
    val r = spark.sql("SELECT fnv1a('deadbeef') AS h").head()
    assert(r.getLong(0) === 0xcd4f3b6f56d93515L)
  }

  test("interpreted eval agrees with codegen on random strings") {
    import spark.implicits._
    for (_ <- 1 to 200) {
      val s = rnd.nextString(rnd.nextInt(50))
      val viaCore = Fnv1aCore.hashBytes(s.getBytes("UTF-8"), Fnv1aCore.OffsetBasis)
      val viaExpr = Fnv1aHash(Seq(Literal(s)), Fnv1aCore.OffsetBasis).eval(null)
      assert(viaExpr === viaCore)
    }
  }

  test("date hashes as i32 day count; timestamp as i64 micros") {
    import spark.implicits._
    // internal reps: DateType = days since epoch (int), Timestamp[NTZ]
    // = micros since epoch (long) — must equal hashing those integers
    val r = spark.sql(
      """SELECT fnv1a(DATE '1996-06-01') AS hd,
        |       fnv1a(TIMESTAMP_NTZ '1996-06-01 12:30:00') AS ht""".stripMargin)
      .head()
    val days = java.time.LocalDate.of(1996, 6, 1).toEpochDay.toInt
    val micros = java.time.LocalDateTime.of(1996, 6, 1, 12, 30)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(r.getLong(0) === Fnv1aCore.hashInt(days, Fnv1aCore.OffsetBasis))
    assert(r.getLong(1) === Fnv1aCore.hashLong(micros, Fnv1aCore.OffsetBasis))
    // composite chaining across a date + key column on the fixture
    val n = Tables.orders(spark, sf)
      .select(F.fnv1a($"o_orderdate", $"o_orderkey").as("h"))
      .distinct().count()
    assert(n > 0)
  }

  test("float/double hash normalized IEEE bits; decimal hashes unscaled") {
    // engine extension beyond the reference (it hashed no fractional
    // types): LE bit-pattern encodings, -0.0 ≡ 0.0, canonical NaN,
    // decimal = unscaled integer (i64 LE at p<=18, BigInteger bytes above)
    val r = spark.sql(
      """SELECT fnv1a(CAST(1.5 AS FLOAT)) AS hf,
        |       fnv1a(CAST(1.5 AS DOUBLE)) AS hd,
        |       fnv1a(CAST(-0.0 AS DOUBLE)) AS hz,
        |       fnv1a(CAST(0.0 AS DOUBLE)) AS hz2,
        |       fnv1a(CAST('NaN' AS DOUBLE)) AS hn,
        |       fnv1a(-CAST('NaN' AS DOUBLE)) AS hn2,
        |       fnv1a(CAST(12.34 AS DECIMAL(10,2))) AS hdec,
        |       fnv1a(CAST(12.34 AS DECIMAL(30,2))) AS hdec30""".stripMargin)
      .head()
    assert(r.getLong(0) === Fnv1aCore.hashInt(
      java.lang.Float.floatToIntBits(1.5f), Fnv1aCore.OffsetBasis))
    assert(r.getLong(1) === Fnv1aCore.hashLong(
      java.lang.Double.doubleToLongBits(1.5), Fnv1aCore.OffsetBasis))
    // -0.0 and 0.0 compare equal in SQL, so they must hash equal
    assert(r.getLong(2) === r.getLong(3))
    // every NaN hashes the canonical NaN bits
    assert(r.getLong(4) === r.getLong(5))
    // decimal(10,2) 12.34 -> unscaled 1234 as i64 LE
    assert(r.getLong(6) === Fnv1aCore.hashLong(1234L, Fnv1aCore.OffsetBasis))
    // decimal(30,2): BigInteger minimal two's-complement bytes
    assert(r.getLong(7) === Fnv1aCore.hashBytes(
      java.math.BigInteger.valueOf(1234L).toByteArray, Fnv1aCore.OffsetBasis))
    // codegen == interpreted over fixture doubles
    import spark.implicits._
    val cg = Tables.lineitem(spark, sf).limit(100)
      .select(F.fnv1a($"l_extendedprice", $"l_discount").as("h"))
      .collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = Tables.lineitem(spark, sf).limit(100)
        .select(F.fnv1a($"l_extendedprice", $"l_discount").as("h"))
        .collect().map(_.getLong(0))
      assert(cg.toSeq == interp.toSeq)
    }
  }
}

package graft

import graft.queries.Q
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for the driver-generated testdata.
  *
  * Round 5 failure mode: the driver regenerated `events.parquet` with
  * `ts` as `timestamp[us]` instead of nanos-INT64, and every events query
  * started throwing at analysis time — 21 queries silently dropped from
  * the correctness artifact. This spec turns that class of environmental
  * drift into ONE named test failure with a readable message: it opens
  * every table and asserts the logical column types the query registry
  * assumes (exact names; type FAMILIES where the loaders deliberately
  * dispatch, e.g. `events.ts`).
  *
  * Every `/root/testdata/sf*` directory present is swept (VERDICT r6 #6):
  * the driver regenerates the scale factors independently, so a PARTIAL
  * regeneration — one sf rewritten with a new shape, the others stale —
  * must also surface as one named per-directory failure, not as a
  * sf0.01-only gate surprise.
  */
class TestdataSchemaSpec extends AnyFunSuite with SparkTestBase {

  private val dirs: Seq[String] = {
    val found = Option(new java.io.File("/root/testdata").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getPath).sorted.toSeq
    assert(found.nonEmpty, "no /root/testdata/sf* directories found")
    found
  }

  private def integral(t: DataType) = t == LongType || t == IntegerType
  private def timestampish(t: DataType) = t match {
    case TimestampType | TimestampNTZType | DateType => true
    case t if integral(t)                            => true // epoch encoding
    case _                                           => false
  }

  /** Assert `table` has exactly the columns of `expect` (order-free), each
    * satisfying its type predicate; on failure print the full actual
    * schema so the drift is diagnosable from the test log alone.
    */
  private def check(dir: String, table: String,
                    expect: (String, DataType => Boolean, String)*): Unit = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val rendered = df.schema.map(f => s"${f.name}: ${f.dataType.sql}")
      .mkString(s"$table(", ", ", ")")
    val missing = expect.map(_._1).filterNot(actual.contains)
    assert(missing.isEmpty,
      s"— testdata drift: $table is missing column(s) ${missing.mkString(", ")}; actual $rendered")
    val extra = actual.keySet -- expect.map(_._1).toSet
    assert(extra.isEmpty,
      s"— testdata drift: $table grew unexpected column(s) ${extra.mkString(", ")}; actual $rendered")
    expect.foreach { case (name, pred, want) =>
      assert(pred(actual(name)),
        s"— testdata drift: $table.$name is ${actual(name).sql}, queries assume $want; actual $rendered")
    }
  }

  dirs.foreach { dir => registerSchemaTests(dir) }

  private def registerSchemaTests(dir: String): Unit = {
    val sf = dir.split('/').last

  test(s"[$sf] events schema matches query assumptions (ts may be nanos-INT64, NTZ, or TIMESTAMP)") {
    check(dir, "events",
      ("event_id", integral, "integral"),
      ("ts", timestampish, "timestamp-family (nanos-INT64 / timestamp[us] / timestamp)"),
      ("user_id", integral, "integral"),
      ("event_type", _ == StringType, "string"),
      ("value", _ == DoubleType, "double"),
      ("props", _ == StringType, "string (JSON)"))
    // and the one choke-point loader must normalize ts to a session-zoned
    // TIMESTAMP whatever the physical encoding is today
    val ts = Q.events(spark, dir).schema("ts").dataType
    assert(ts == TimestampType,
      s"Q.events must normalize ts to TIMESTAMP, got ${ts.sql}")
  }

  test(s"[$sf] documents/embeddings schemas match query assumptions") {
    check(dir, "documents",
      ("doc_id", integral, "integral"),
      ("text", _ == StringType, "string"),
      ("lang", _ == StringType, "string"),
      ("source", _ == StringType, "string"),
      ("n_chars", integral, "integral"))
    check(dir, "embeddings",
      ("vec_id", integral, "integral"),
      ("embedding", {
        case ArrayType(FloatType | DoubleType, _) => true
        case _                                    => false
      }, "array<float|double>"),
      ("label", integral, "integral"))
  }

  test(s"[$sf] TPC-H-ish table schemas match query assumptions") {
    check(dir, "region",
      ("r_regionkey", integral, "integral"),
      ("r_name", _ == StringType, "string"))
    check(dir, "nation",
      ("n_nationkey", integral, "integral"),
      ("n_name", _ == StringType, "string"),
      ("n_regionkey", integral, "integral"))
    check(dir, "customer",
      ("c_custkey", integral, "integral"),
      ("c_name", _ == StringType, "string"),
      ("c_nationkey", integral, "integral"),
      ("c_acctbal", _ == DoubleType, "double"),
      ("c_mktsegment", _ == StringType, "string"))
    check(dir, "supplier",
      ("s_suppkey", integral, "integral"),
      ("s_name", _ == StringType, "string"),
      ("s_nationkey", integral, "integral"),
      ("s_acctbal", _ == DoubleType, "double"))
    check(dir, "part",
      ("p_partkey", integral, "integral"),
      ("p_name", _ == StringType, "string"),
      ("p_brand", _ == StringType, "string"),
      ("p_type", _ == StringType, "string"),
      ("p_size", integral, "integral"),
      ("p_retailprice", _ == DoubleType, "double"))
    check(dir, "orders",
      ("o_orderkey", integral, "integral"),
      ("o_custkey", integral, "integral"),
      ("o_orderstatus", _ == StringType, "string"),
      ("o_totalprice", _ == DoubleType, "double"),
      ("o_orderdate", timestampish, "timestamp-family"),
      ("o_orderpriority", _ == StringType, "string"))
    check(dir, "lineitem",
      ("l_orderkey", integral, "integral"),
      ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"),
      ("l_linenumber", integral, "integral"),
      ("l_quantity", _ == DoubleType, "double"),
      ("l_extendedprice", _ == DoubleType, "double"),
      ("l_discount", _ == DoubleType, "double"),
      ("l_tax", _ == DoubleType, "double"),
      ("l_returnflag", _ == StringType, "string"),
      ("l_linestatus", _ == StringType, "string"),
      ("l_shipdate", timestampish, "timestamp-family"))
  }
  }
}

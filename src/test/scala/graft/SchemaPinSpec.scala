package graft

import org.apache.spark.sql.types._

/** Pins the schema of every driver-generated table AS LOADED through
  * [[Tables]]. The driver regenerates `/root/testdata` between rounds
  * and has already changed a column's physical type once (`events.ts`:
  * INT64-nanos → `timestamp[us]`, which cost a round — see
  * [[TsEncodingDriftSpec]]). This spec converts the NEXT such drift,
  * on ANY column, into one failing test that names the exact column
  * and type — instead of a scatter of analysis errors across the
  * driver gate.
  *
  * `events.ts` is pinned to the SET of types the engine's
  * normalization contract admits (TIMESTAMP / TIMESTAMP_NTZ after
  * `Tables.normalizeTs` — the long-nanos encoding normalizes to
  * TIMESTAMP); everything else is pinned exactly. If this spec fails
  * after a regeneration: extend `Tables.normalizeTs` (time types) or
  * audit every consumer of the changed column, then re-pin here.
  */
class SchemaPinSpec extends SparkSpec {

  private def fieldsOf(name: String): Seq[(String, DataType)] = {
    val df = name match {
      case "events" => Tables.events(spark, sf001)
      case t => Tables.table(spark, sf001, t)
    }
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq
  }

  private val pinned: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  // date/time columns: the driver has shipped multiple encodings, so
  // pin to the admissible set, not one type
  private val timeTypes: Set[DataType] = Set(TimestampType, TimestampNTZType)

  test("non-temporal tables match the pinned schemas exactly") {
    for ((t, expected) <- pinned) {
      assert(fieldsOf(t) == expected,
        s"$t schema drifted: got ${fieldsOf(t)}, pinned $expected — " +
          "the driver regenerated testdata with a new encoding; " +
          "audit consumers, then re-pin")
    }
  }

  test("temporal tables: names/order exact, time columns in the admitted set") {
    def check(t: String, expected: Seq[(String, Either[DataType, Unit])]): Unit = {
      val got = fieldsOf(t)
      assert(got.map(_._1) == expected.map(_._1), s"$t column names drifted: $got")
      got.zip(expected).foreach {
        case ((n, dt), (_, Left(exact))) =>
          assert(dt == exact, s"$t.$n drifted to $dt (pinned $exact)")
        case ((n, dt), (_, Right(_))) =>
          assert(timeTypes(dt),
            s"$t.$n drifted to $dt — not an admitted time type; " +
              "extend Tables.normalizeTs and TsEncodingDriftSpec first")
      }
    }
    check("orders", Seq("o_orderkey" -> Left(LongType),
      "o_custkey" -> Left(LongType), "o_orderstatus" -> Left(StringType),
      "o_totalprice" -> Left(DoubleType), "o_orderdate" -> Right(()),
      "o_orderpriority" -> Left(StringType)))
    check("lineitem", Seq("l_orderkey" -> Left(LongType),
      "l_partkey" -> Left(LongType), "l_suppkey" -> Left(LongType),
      "l_linenumber" -> Left(IntegerType), "l_quantity" -> Left(DoubleType),
      "l_extendedprice" -> Left(DoubleType), "l_discount" -> Left(DoubleType),
      "l_tax" -> Left(DoubleType), "l_returnflag" -> Left(StringType),
      "l_linestatus" -> Left(StringType), "l_shipdate" -> Right(())))
    check("events", Seq("event_id" -> Left(LongType), "ts" -> Right(()),
      "user_id" -> Left(LongType), "event_type" -> Left(StringType),
      "value" -> Left(DoubleType), "props" -> Left(StringType)))
  }
}

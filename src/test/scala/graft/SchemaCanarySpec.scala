package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Schema-drift canary (round-5, VERDICT r4 item 9): the driver
  * regenerates `/root/testdata` between rounds and has already changed
  * a wire type once (`events.ts` INT64-nanos → TIMESTAMP_MICROS in r3),
  * which silently evaporated 44 correctness rows for two rounds — the
  * exception was swallowed per-query by Verify, so nothing went red.
  * This suite pins the POST-`Tables`-adapter schema of every table at
  * sf0.001: if the driver ships a new generation the adapter doesn't
  * normalize, this fails loudly at `sbt test` instead.
  */
class SchemaCanarySpec extends SparkSuite {

  private def expect(name: String, cols: (String, DataType)*): Unit = {
    val got = Tables(sc, sfDir, name).schema
      .map(f => f.name -> f.dataType)
    assert(got == cols.toSeq,
      s"$name schema drifted:\n  got : $got\n  want: ${cols.toSeq}")
  }

  test("every testdata table resolves to the declared post-adapter schema") {
    expect("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    expect("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    expect("customer", "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    expect("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    expect("part", "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    expect("orders", "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    expect("lineitem", "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    // events.ts MUST come out of the adapter as session-TZ TimestampType
    // whatever the wire type (INT64 nanos or TIMESTAMP micros) — this is
    // the exact line that regressed in r3
    expect("events", "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    expect("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    expect("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  }

  test("events.ts carries real instants (no epoch-zero collapse)") {
    import org.apache.spark.sql.functions._
    val mm = Tables(sc, sfDir, "events")
      .agg(min("ts").cast("long").as("mn"), max("ts").cast("long").as("mx"))
      .head()
    assert(mm.getLong(0) > 0L, "ts min is pre-1970 — adapter misread the wire type")
    assert(mm.getLong(1) > mm.getLong(0), "ts has no spread — adapter collapsed values")
  }
}

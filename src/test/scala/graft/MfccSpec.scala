package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** DCT invariants for the MFCC-style spectral feature extractor. */
class MfccSpec extends SparkSuite {

  test("mm_mfcc: k=0 coefficient is the frame-energy sum (cos(0)=1), 8 coefs per clip") {
    val s = sc
    val rows = Multimodal.mmMfcc(s, sfDir).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (_, rs) => assert(rs.length == 8) }
    // recompute c0 = sum of the 16 stub energies for a few docs
    val docs = perDoc.keys.toSeq.sorted.take(5)
    val c0 = rows.filter(r => r.getInt(1) == 0 && docs.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val energies = spark.range(0, 16).selectExpr("id AS fi")
      .crossJoin(spark.createDataFrame(docs.map(Tuple1(_))).toDF("doc_id"))
      .select(col("doc_id"),
        (graft.functions.PortableHash.hash64(
          concat(col("doc_id").cast("string"), lit(":"), col("fi").cast("string")))
          % 1000L).as("e"))
      .groupBy("doc_id").agg(sum("e").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    docs.foreach { d =>
      assert(math.abs(c0(d) - energies(d)) < 1e-5,
        s"doc $d: c0=${c0(d)} vs energy sum ${energies(d)}")
    }
  }
}

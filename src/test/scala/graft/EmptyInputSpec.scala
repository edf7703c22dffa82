package graft

/** Empty-corpus robustness gate: a daily pipeline WILL see an empty
  * partition (no blobs for the day, a filtered-to-nothing source), and
  * an operator that NPEs or divides by zero on it takes the whole job
  * down. Every registered query must run to completion on a corpus of
  * empty-but-schema'd tables. This gate caught and keeps fixed: the
  * component loops' null Σlabel reads, the PCA iterate/deflate driver
  * lookups, and the KMV jaccard 0/0.
  */
class EmptyInputSpec extends SparkSuite {

  test("every registered query completes on an empty corpus") {
    val s = sc
    val dst = java.nio.file.Files.createTempDirectory("sf-empty").toString
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables(s, sfDir, t).limit(0).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(s, dst).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(90)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

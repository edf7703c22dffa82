package graft

import java.nio.file.Files
import graft.sources.FsUtil

/** Path-probe semantics: glob metacharacters in a user-supplied base
  * path must match literally (the old java.io.File probes treated them
  * literally; the Hadoop glob grammar would otherwise parse them as
  * pattern syntax — throwing on `[`, silently mis-matching on `{`).
  */
class FsUtilSpec extends SparkSuite {

  test("escapeGlob backslash-escapes every Hadoop glob metacharacter") {
    assert(FsUtil.escapeGlob("/plain/path") == "/plain/path")
    assert(FsUtil.escapeGlob("a[1]b") == "a\\[1\\]b")
    assert(FsUtil.escapeGlob("a{x,y}") == "a\\{x,y\\}")
    assert(FsUtil.escapeGlob("a*b?c") == "a\\*b\\?c")
    assert(FsUtil.escapeGlob("a\\b") == "a\\\\b")
  }

  test("globNonEmpty over a base dir containing [ and { metacharacters") {
    val root = Files.createTempDirectory("fsu").toString
    val weird = java.nio.file.Paths.get(root, "day[1]{a}")
    Files.createDirectories(weird)
    Files.writeString(weird.resolve("2021-02-09-0.csv"), "x\n")
    // unescaped: `[1]` is a character class — the pattern names a
    // different path, so the probe must NOT find the file this way
    val escaped = FsUtil.escapeGlob(weird.toString)
    assert(FsUtil.globNonEmpty(spark, escaped + "/2021-02-09*"))
    assert(!FsUtil.globNonEmpty(spark, escaped + "/2021-03-09*"))
    // the intentional suffix glob still works below an escaped prefix
    assert(FsUtil.globNonEmpty(spark, FsUtil.escapeGlob(root) + "/day*/*.csv"))
  }
}

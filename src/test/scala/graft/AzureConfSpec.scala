package graft

import java.nio.file.Files
import graft.sources.AzureConf

/** ABFS config wiring (the sandbox has no hadoop-azure jar and no
  * egress, so this pins the CONFIG seam: URI assembly, shared-key conf
  * shape, secrets resolution, and that `apply` lands the entries in the
  * session's Hadoop configuration — the exact objects every FsUtil
  * probe and Spark read resolves FileSystems from).
  */
class AzureConfSpec extends SparkSuite {

  test("abfssUrl assembles the ADLS Gen2 URI") {
    assert(AzureConf.abfssUrl("hfp-v2", "exampleacct") ==
      "abfss://hfp-v2@exampleacct.dfs.core.windows.net")
    assert(AzureConf.abfssUrl("hfp-v2", "exampleacct", "csv/StopEvent") ==
      "abfss://hfp-v2@exampleacct.dfs.core.windows.net/csv/StopEvent")
    assert(AzureConf.abfssUrl("c", "a", "/lead/slash") ==
      "abfss://c@a.dfs.core.windows.net/lead/slash")
  }

  test("fromEnv resolves account + key through the X1 secrets layer") {
    val secrets = Files.createTempDirectory("azsecrets")
    Files.writeString(secrets.resolve("AZURE_STORAGE_KEY3"), "k-from-file\n")
    val env = Map(
      "AZURE_STORAGE_ACCOUNT" -> "acct",
      "AZURE_STORAGE_KEY" -> "k-from-env")
    assert(AzureConf.fromEnv(env, secrets.toString) ==
      Map("fs.azure.account.key.acct.dfs.core.windows.net" -> "k-from-file"))
    // unconfigured -> empty (local runs need nothing)
    assert(AzureConf.fromEnv(Map.empty, secrets.toString).isEmpty)
    // account without key -> empty, never a half-configured auth
    assert(AzureConf.fromEnv(
      Map("AZURE_STORAGE_ACCOUNT" -> "acct"), secrets.toString).isEmpty)
  }

  test("apply writes the entries into the session Hadoop configuration") {
    val env = Map(
      "AZURE_STORAGE_ACCOUNT" -> "acctspec",
      "AZURE_STORAGE_KEY" -> "sk")
    val secrets = Files.createTempDirectory("azsecrets2")
    AzureConf(spark, env, secrets.toString)
    assert(spark.sparkContext.hadoopConfiguration
      .get("fs.azure.account.key.acctspec.dfs.core.windows.net") == "sk")
  }
}

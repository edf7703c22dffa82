package graft.sources

import org.apache.spark.sql.SparkSession

/** Azure Data Lake (ABFS) wiring for the HFP archive — the config seam
  * that turns the reference's blob-storage access (azureStorage.ts:
  * 1-45, connection-string auth from the secrets env) into Spark/Hadoop
  * configuration. Everything here is plain public hadoop-azure
  * configuration (the `fs.azure.account.key.<account>.dfs.core.windows
  * .net` shared-key property and the `abfss://container@account...`
  * URI scheme, per the Hadoop ABFS docs).
  *
  * The sandbox has no hadoop-azure jar and no egress, so this module is
  * deliberately CONFIG-ONLY and pure: it assembles URLs and conf
  * entries (unit-tested), and `apply` writes them into the session's
  * Hadoop configuration. On a real cluster the deployment additionally
  * puts `hadoop-azure` + `azure-storage` on the executor classpath;
  * after that, the load path needs no code change — every probe and
  * read already goes through the path's own FileSystem ([[FsUtil]],
  * [[HfpCsvSource]]), so `loadDay(spark, AzureConf.abfssUrl(...), ...)`
  * is the whole migration (HfpCsvSource.scala header documents the
  * path-string swap).
  */
object AzureConf {

  /** `abfss://container@account.dfs.core.windows.net/path` — the ADLS
    * Gen2 URI for a container path (the reference's container is the
    * `hfp-v2` archive, hfpStorage.ts:9).
    */
  def abfssUrl(container: String, account: String, path: String = ""): String = {
    val p = path.stripPrefix("/")
    s"abfss://$container@$account.dfs.core.windows.net" +
      (if (p.isEmpty) "" else s"/$p")
  }

  /** Shared-key auth conf for one storage account (the auth mode a
    * connection string carries). The key comes from the secrets-
    * resolved environment, never a literal.
    */
  def sharedKeyConf(account: String, accountKey: String): Map[String, String] =
    Map(s"fs.azure.account.key.$account.dfs.core.windows.net" -> accountKey)

  /** Assemble the conf from the secrets-resolved env (X1 —
    * [[SecretsConfig]]): AZURE_STORAGE_ACCOUNT names the account,
    * AZURE_STORAGE_KEY its shared key. Returns empty when the account
    * is not configured (local/parquet runs need nothing).
    */
  def fromEnv(env: Map[String, String] = sys.env,
      secretsPath: String = SecretsConfig.DefaultSecretsPath): Map[String, String] = {
    val e = SecretsConfig.resolve(env, secretsPath)
    (for {
      account <- e.get("AZURE_STORAGE_ACCOUNT")
      key <- e.get("AZURE_STORAGE_KEY")
    } yield sharedKeyConf(account, key)).getOrElse(Map.empty)
  }

  /** Write the account conf into the session's Hadoop configuration —
    * after this (plus hadoop-azure on the classpath), `abfss://` paths
    * resolve through the ABFS FileSystem in every FsUtil probe and
    * Spark read/write the engine performs.
    */
  def apply(spark: SparkSession,
      env: Map[String, String] = sys.env,
      secretsPath: String = SecretsConfig.DefaultSecretsPath): Unit =
    fromEnv(env, secretsPath).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}

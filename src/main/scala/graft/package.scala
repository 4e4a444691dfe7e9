package object graft {
  /** Driver contract: a named query is (session, sfDir) => result DataFrame. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}

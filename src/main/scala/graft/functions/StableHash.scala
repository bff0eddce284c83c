package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable stable hashing: a 60-bit non-negative BIGINT from the
  * md5 hex prefix of a string. Pure projection — no dictionary, no global
  * sort, no nondeterminism across retries — and computable identically in
  * any engine with `md5` (DuckDB:
  * `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`), which keeps
  * differential oracles hash-exact. Used for dedup shingle ids, sampling,
  * and salting.
  */
object StableHash {

  /** 60-bit hash (15 hex chars → always fits a signed BIGINT, positive). */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB rendition of [[md5Prefix60]] for oracle builders. */
  def md5Prefix60Sql(expr: String): String =
    s"CAST('0x' || substring(md5($expr), 1, 15) AS BIGINT)"
}

package minietl.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine portable hash contract: an md5-derived 60-bit positive
  * integer (first 15 hex chars of the digest). Any SQL engine replays it,
  * which is what makes the portable fingerprint/minhash/simhash variants
  * oracle-verifiable end-to-end.
  *
  * The Scala column and the SQL rendering MUST stay in lockstep; they are
  * defined here and nowhere else.
  */
object PortableHash {

  /** Spark column: 60-bit positive long from the md5 hex digest. */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("bigint")

  /** The identical computation as engine-neutral SQL over fragment `s`. */
  def sql(s: String): String =
    s"CAST(concat('0x', substring(md5($s), 1, 15)) AS BIGINT)"
}

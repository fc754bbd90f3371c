package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing primitives.
  *
  * Everything here is defined twice — as a Spark `Column` expression and
  * as a DuckDB SQL fragment — so dedup/similarity operators can be
  * verified value-for-value against the driver's DuckDB oracle. Spark's
  * native `hash()`/`xxhash64()` are murmur-based and NOT reproducible in
  * DuckDB, so the portable 32-bit hash is the first 8 hex chars of md5.
  */
object Hashing {

  /** 2^31-1, the classic minhash modulus. Products a*h stay < 2^63. */
  val MersennePrime: Long = 2147483647L

  /** Portable 32-bit hash of a string column (0 .. 2^32-1). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[h32]] over SQL expression `e`. */
  def h32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** Second independent portable 32-bit hash: md5 hex chars 9-16.
    * Together with [[h32]] this yields 64 portable hash bits per string
    * without ever materializing a value outside BIGINT range in either
    * engine (a single 16-hex-char cast would overflow signed 64-bit).
    */
  def h32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[h32b]] over SQL expression `e`. */
  def h32bSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 9, 8)) AS BIGINT)"

  /** Fixed (a, b) pairs for 16 minhash permutations h' = (a*h + b) mod P.
    * Hardcoded so Spark and the SQL oracle share them verbatim.
    */
  val perms: Seq[(Long, Long)] = Seq(
    (1610612741L, 999983L), (805306457L, 123457L), (402653189L, 777777L),
    (201326611L, 31337L), (100663319L, 271829L), (50331653L, 141421L),
    (25165843L, 173205L), (12582917L, 223607L), (6291469L, 244949L),
    (3145739L, 264575L), (1572869L, 282843L), (786433L, 299999L),
    (393241L, 316227L), (196613L, 331662L), (98317L, 346410L),
    (49157L, 360555L))
}

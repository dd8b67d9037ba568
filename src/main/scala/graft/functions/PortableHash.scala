package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Engine-portable string hashing for the similarity-dedup operators.
  *
  * The MinHash / SimHash pipelines are hash-seeded, so their outputs
  * can only be oracle-checked by an engine that computes the SAME base
  * hash. `xxhash64`/murmur are Spark-internal; this polynomial
  * character hash (Horner fold mod the Mersenne prime 2^31−1) is
  * chosen to be expressible in BOTH Spark SQL (`aggregate` over
  * `transform`) and ANSI-ish SQL with list lambdas (DuckDB
  * `list_reduce`/`list_transform`), bit-identically:
  *
  *   h(s) = fold(codes(s), 0, (acc, c) -> (acc·mult + c) mod P)
  *
  * where codes(s) are the character codepoints of the first `maxLen`
  * characters. All intermediates stay < 2^62, so 64-bit integer
  * arithmetic never overflows in either engine. Quality is far below
  * xxhash64 (it is a rolling hash), but MinHash/SimHash only need
  * uniformity modulo P over short text shingles, which it provides;
  * production callers keep the default xxhash64 path.
  *
  * Each Spark builder has a `...Sql` twin that renders the identical
  * computation for the DuckDB oracle — keep the pairs in lockstep.
  */
object PortableHash {

  /** Mersenne prime 2^31−1: products a·x with a,x < P stay < 2^62. */
  val P: Long = 2147483647L

  /** Default truncation: hashing is over the first 64 chars. Both
    * engines truncate identically, so this is part of the spec, not a
    * divergence risk.
    */
  val MaxLen: Int = 64

  /** Polynomial rolling hash of a string column, in [0, P). Empty
    * strings hash to 0 (the fold over zero characters).
    */
  def polyHash(c: Column, mult: Int = 31, maxLen: Int = MaxLen): Column = {
    // Spark sequence(1, 0) yields the DESCENDING [1, 0] (step defaults
    // to -1 when start > stop), so the empty string needs an explicit
    // guard to fold over no characters like the oracle's empty list.
    val codes = F.transform(
      F.sequence(lit(1), F.least(F.length(c), lit(maxLen))),
      i => F.ascii(c.substr(i, lit(1))).cast("long"))
    when(F.length(c) === 0, lit(0L))
      .otherwise(F.aggregate(codes, lit(0L),
        (acc, ch) => (acc * lit(mult.toLong) + ch) % lit(P)))
  }

  /** DuckDB rendering of [[polyHash]] over SQL expression `e`. */
  def polyHashSql(e: String, mult: Int = 31, maxLen: Int = MaxLen): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, least(length($e), $maxLen)), " +
      s"i -> unicode(substr($e, i, 1)))), " +
      s"(acc, c) -> (acc * $mult + c) % $P)"

  /** Integer hash (a·x + b) mod P for pseudo-random but engine-
    * portable orderings of integer ids (e.g. deterministic sampling).
    * x is first reduced mod P so the product stays < 2^62.
    */
  def intHash(c: Column): Column =
    (((c % P + P) % P) * lit(IntHashA) + lit(IntHashB)) % P

  /** DuckDB rendering of [[intHash]]. */
  def intHashSql(e: String): String =
    s"((((($e) % $P + $P) % $P) * $IntHashA + $IntHashB) % $P)"

  /** Fixed odd multiplier/offset for [[intHash]] (arbitrary, shared). */
  val IntHashA: Long = 1103515245L
  val IntHashB: Long = 12345L

  /** 62-bit hash: two independent 31-bit poly hashes packed as
    * h31a + h31b·2^31. Bits 62–63 are always 0 — callers using it to
    * vote on bit positions (SimHash) get deterministic zero bits
    * there, identically in both engines.
    */
  def hash62(c: Column): Column =
    polyHash(c, 31) + polyHash(c, 37) * lit(1L << 31)

  /** DuckDB rendering of [[hash62]]. */
  def hash62Sql(e: String): String =
    s"(${polyHashSql(e, 31)} + ${polyHashSql(e, 37)} * ${1L << 31})"
}

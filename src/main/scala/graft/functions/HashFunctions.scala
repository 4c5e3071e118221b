package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable stable hashes.
  *
  * Built on `md5` hex prefixes so the exact same integer hash is
  * reproducible in any SQL engine that ships md5 (DuckDB oracle:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`). Spark's own
  * `hash`/`xxhash64` would be faster but are not reproducible
  * outside Spark, which would make every hash-derived operator
  * untestable against an independent oracle.
  *
  * All hashes are kept strictly below 2^60 (15 hex chars) or 2^28
  * (7 hex chars) so downstream modular arithmetic
  * (`a*h + b mod p`) never overflows a signed 64-bit integer —
  * engines disagree on overflow behavior (Spark wraps, DuckDB
  * raises), so we stay in-range by construction.
  */
object HashFunctions {

  /** 2^31 - 1 (Mersenne prime) — modulus for minhash permutations. */
  val MinHashPrime: Long = 2147483647L

  /** 60-bit stable hash of the string column (≡ parsing the first 15
    * hex chars of md5, computed by the [[H60]] digest kernel — the
    * former `conv(substring(md5(c), 1, 15), 16, 10)` column pipeline
    * re-materialized hex strings per row and measured ~4× slower in
    * hash-heavy scans; values are bit-identical). */
  def h60(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      H60(org.apache.spark.sql.graftshim.ColumnShim.expression(c)))

  /** 28-bit stable hash — small enough that (a*h + b) with a,b < 2^31
    * stays below 2^63 for minhash permutations ([[H28]] kernel; ≡ the
    * first 7 hex chars of md5). */
  def h28(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      H28(org.apache.spark.sql.graftshim.ColumnShim.expression(c)))

  /** Deterministic coefficients for the i-th minhash permutation. */
  def permA(i: Int): Long = ((i * 2654435761L) % MinHashPrime) | 1L
  def permB(i: Int): Long = (i * 40503L * 65537L + 17L) % MinHashPrime

  /** i-th minhash permutation of a 28-bit hash column. */
  def minhashPerm(h: Column, i: Int): Column =
    pmod(lit(permA(i)) * h + lit(permB(i)), lit(MinHashPrime))
}

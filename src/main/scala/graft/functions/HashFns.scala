package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable (engine-agnostic) hashing built on md5, for operators whose
  * results must be reproducible by the DuckDB oracle (which lacks xxhash64).
  * Perf-critical paths keep the xxhash64 variants in [[VectorFns]]; these md5
  * forms are the correctness-checkable spellings of the same algorithms.
  * Everything here is a composition of codegen'd built-ins — no UDFs.
  */
object HashFns {

  /** Lowercase-hex md5 of a string column's UTF-8 bytes. */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** First `hexDigits` hex chars of md5 as a long — portable hash-to-int
    * (DuckDB: `('0x' || substr(md5(x), 1, n))::BIGINT`). */
  def md5Long(c: Column, hexDigits: Int = 8): Column =
    conv(substring(md5Hex(c), 1, hexDigits), 16, 10).cast("long")

  /** Hash-to-bucket in [0, buckets). */
  def md5Bucket(c: Column, buckets: Int): Column =
    pmod(md5Long(c, 4), lit(buckets.toLong))

  /** MinHash signature (array<string>, length k): for seed i, the
    * lexicographic minimum of md5(i + "|" + shingle) over the shingle set.
    * Hex strings compare identically in every engine (ASCII, lowercase). */
  def minHashSig(shingles: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shingles, s => md5Hex(concat(lit(seed + "|"), s))))
    }: _*)

  /** LSH band signatures: md5 over each of `bands` consecutive `rows`-sized
    * slices of the signature. Returns array<string> of length `bands`. */
  def bandSigs(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5Hex(concat_ws("", slice(sig, b * rows + 1, rows)))
    }: _*)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for dedup / fingerprinting
  * (SURVEY.md §2.12 X1-X2; driver north star "dedup").
  *
  * Everything here must hash-match a DuckDB oracle, so the primitives are
  * restricted to functions with bit-identical semantics in both engines:
  * `md5` (hex), `substr`, hex→int conversion, and signed-64 integer
  * arithmetic. Spark's `xxhash64`/`hash` are NOT portable across engines;
  * md5 is.
  *
  * Base hashes: a shingle/token string s yields two independent 60-bit
  * values from one md5 (hex chars 1-15 and 17-31). The classic
  * (x1 + i·x2) mod P family then gives k hash functions from ONE digest
  * per shingle — what makes a 16-function MinHash affordable at 100 TB.
  * All arithmetic stays in signed-64: operands are reduced mod P=2^31-1
  * before the multiply (max magnitude ≈ 2^35).
  *
  * Evaluation-cost note (the design constraint that shaped this file):
  * Spark's higher-order functions are CodegenFallback — no whole-stage
  * codegen CSE — and ProjectCollapse inlines a `withColumn` hash array
  * into every reference. So every signature here is computed as a SINGLE
  * fold whose input array appears exactly once in the expression tree
  * (array-accumulator aggregate), never as k independent passes.
  */
object TextHash {
  /** 2^31 - 1 (Mersenne prime) — hash-family modulus. */
  val P: Long = 2147483647L
  /** 1e9+7 — rolling-fingerprint modulus. */
  val FpP: Long = 1000000007L

  /** First 60 bits of md5(s) as a non-negative long. */
  def h1(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Second 60 bits of md5(s) (hex chars 17..31). */
  def h2(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 17, 15), 16, 10).cast("long")

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles of `text` (default n=3). Empty array
    * when the doc has fewer than n tokens (sequence() would otherwise
    * count DOWN and slice out of range). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** k-function MinHash signature over a shingle array: one fold, with a
    * k-slot array accumulator of running minima. Each shingle is md5'd
    * exactly ONCE (inner transform materializes the hex digests; the outer
    * transform only slices the strings); the k family members are integer
    * ops on the two 60-bit halves. */
  def minhashSignature(sh: Column, k: Int = 16): Column = {
    val digests = transform(sh, g => md5(g.cast("binary")))
    val pairs = transform(digests, m => struct(
      (conv(substring(m, 1, 15), 16, 10).cast("long") % P).as("a"),
      (conv(substring(m, 17, 15), 16, 10).cast("long") % P).as("b")))
    aggregate(pairs, array_repeat(lit(P), k),
      (acc, p) => zip_with(acc, sequence(lit(0L), lit((k - 1).toLong)),
        (m, i) => least(m, (p.getField("a") + i * p.getField("b")) % P)))
  }

  /** 48-bit SimHash over the token multiset (term-frequency weighted).
    * Bit j is 1 iff Σ_tokens(±1 by bit j of h1(token)) > 0; ties → 0.
    * 48 bits in 4 bands of 12 → banding recalls every pair with Hamming
    * distance ≤ 3 (pigeonhole). Built via expr() because only the SQL
    * form of shiftright/shiftleft accepts a column shift amount. */
  def simhash(textCol: String, bits: Int = 48): Column = {
    val hs = s"transform(split(lower($textCol), ' '), " +
      "t -> cast(conv(substring(md5(cast(t as binary)),1,15),16,10) as bigint))"
    val sums = s"aggregate($hs, " +
      s"array_repeat(cast(0 as bigint), $bits), " +
      s"(acc, h) -> zip_with(acc, sequence(cast(0 as bigint), cast(${bits - 1} as bigint)), " +
      "(a, j) -> a + (shiftright(h, cast(j as int)) % 2) * 2 - 1))"
    expr(s"aggregate(zip_with($sums, sequence(cast(0 as bigint), cast(${bits - 1} as bigint)), " +
      "(s, j) -> if(s > 0, shiftleft(cast(1 as bigint), cast(j as int)), cast(0 as bigint))), " +
      "cast(0 as bigint), (u, v) -> u + v)")
  }

  /** Rolling polynomial fingerprint over the token stream:
    * fold(acc=1; acc·31 + (h1(tok) mod FpP)) mod FpP — order-sensitive,
    * so permuted docs get different prints (unlike a token-set hash). */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1L),
      (acc, t) => (acc * lit(31L) + (h1(t) % FpP)) % FpP)

  // ---- SQL twins (DuckDB dialect) — same arithmetic, templated strings.
  // Oracle CTEs bind hash arrays as real columns, so they are evaluated
  // once per row there (DuckDB materializes projection columns).

  def h1Sql(e: String): String = s"(('0x' || substr(md5($e),1,15))::BIGINT)"
  def h2Sql(e: String): String = s"(('0x' || substr(md5($e),17,15))::BIGINT)"

  /** DuckDB: distinct word n-gram shingles of token-list expr `toks`. */
  def shinglesSql(toks: String, n: Int = 3): String =
    s"list_distinct([array_to_string(($toks)[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len($toks) - ${n - 2})])"

  /** DuckDB: k-function MinHash signature over shingle-list expr `sh`.
    * coalesce matches the Spark fold's init: an empty shingle set (doc
    * shorter than n tokens) yields an all-P signature, not NULLs. */
  def minhashSignatureSql(sh: String, k: Int = 16): String =
    s"[coalesce(list_min(list_transform($sh, g -> " +
      s"((${h1Sql("g")} % $P) + i * (${h2Sql("g")} % $P)) % $P)), $P) " +
      s"for i in range(0, $k)]"

  /** DuckDB: 48-bit SimHash over a bound token-hash-list column `hh`
    * (bind `hh = list_transform(toks, t -> h1)` in a prior CTE). */
  def simhashSqlExpr(hh: String, bits: Int = 48): String =
    s"list_sum([CASE WHEN list_sum(list_transform($hh, " +
      s"h -> ((h >> j) % 2) * 2 - 1)) > 0 " +
      s"THEN (1::BIGINT << j) ELSE 0::BIGINT END for j in range(0, $bits)])"

  /** DuckDB token-hash list for [[simhashSqlExpr]]. */
  def tokenHashesSql(toks: String): String =
    s"list_transform($toks, t -> ${h1Sql("t")})"

  /** DuckDB rolling fingerprint over token-list expr `toks`. */
  def rollingFingerprintSql(toks: String): String =
    s"list_reduce(list_concat([1::BIGINT], " +
      s"list_transform($toks, t -> ${h1Sql("t")} % $FpP)), " +
      s"(a, b) -> (a * 31 + b) % $FpP)"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.call_function

/** Engine-portable hashing/shingling primitives shared by the dedup and
  * text-analysis operator families (SURVEY §2.C/E).
  *
  * Everything here composes built-in `functions._` (whole-stage
  * codegen'd, no UDFs) and has a bit-identical DuckDB formulation for
  * the oracle:
  *   md5_60(x)  ⇔  ('0x' || substr(md5(x),1,15))::BIGINT
  * The 60-bit md5 prefix is the portable base hash; MinHash
  * permutations are affine maps over its low 30 bits so products stay
  * < 2^62 (no overflow under Spark 4 ANSI mode, no wraparound
  * divergence between engines).
  */
object Hashing {

  /** Modulus for minhash permutations (prime < 2^30). */
  val P: Long = 1073741789L

  /** Base-hash range: low 30 bits. */
  val M30: Long = 1073741824L

  /** 16 fixed affine permutation constants (a, b) — LCG-generated, seed
    * 123456789; literals mirrored in the DuckDB oracle SQL.
    */
  val Perms: Seq[(Long, Long)] = Seq(
    (231794731L, 53204542L), (684233693L, 850994577L), (560815387L, 707246327L),
    (323957641L, 1035569613L), (831148711L, 261418422L), (360587765L, 199357932L),
    (177149171L, 1016516591L), (23825185L, 436938117L), (101429247L, 1059748875L),
    (308566761L, 534615297L), (344256423L, 1040371175L), (697843093L, 218988640L),
    (402677811L, 774136230L), (696622849L, 509010780L), (458247587L, 104960770L),
    (472230701L, 104430069L))

  /** 60-bit portable content hash (first 15 hex chars of md5), via the
    * native Md5Prefix60 expression (semantics identical to
    * `conv(substring(md5(c),1,15),16,10)::long`; Tables registers it
    * per session).
    */
  def md5_60(c: Column): Column = call_function("graft_md5_60", c)

  /** Whitespace tokenization (single-space, mirroring string_split). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word 3-gram shingles; single-shingle fallback for tiny docs.
    * Spark `slice(toks, i+1, 3)` ⇔ DuckDB `t[i:i+2]` (both 1-based).
    *
    * This composed formulation is the REFERENCE SEMANTICS for the fused
    * native GramHashes expression (hot path); GramFusionSpec asserts
    * their equivalence through Spark evaluation on the corpus.
    */
  def shingles3(toks: Column, wholeText: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => array_join(slice(toks, i + lit(1), lit(3)), " ")))
      .otherwise(array(lower(wholeText)))

  /** One minhash permutation applied to the 60-bit base hash (folded to
    * 30 bits so a*h stays < 2^62).
    */
  def perm(h0: Column, i: Int): Column = {
    val (a, b) = Perms(i)
    (lit(a) * (h0 % M30) + lit(b)) % P
  }

  /** JVM-side md5_60, bit-identical to the Column form (first 15 hex
    * chars of md5, parsed base-16) — for typed streaming state code
    * that can't evaluate Columns; ExprPropertiesSpec pins the equality.
    */
  def md5_60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
}

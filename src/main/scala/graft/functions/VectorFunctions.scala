package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns,
  * built from Spark's codegen'd higher-order functions (no UDFs in the
  * hot path).
  *
  * Determinism note: `dotD` is a sequential left fold in double
  * precision — verified bit-identical to DuckDB's `list_sum` over the
  * same data, which is what makes cosine scores oracle-checkable.
  */
object VectorFunctions {

  /** Elementwise cast to double (float arithmetic differs per engine —
    * always lift to double first).
    */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product of two double arrays: sequential left fold, compiled
    * (custom DotProduct expression — the interpreted
    * `aggregate(zip_with(...))` HOF form it replaces evaluates its
    * lambda per element and dominated the pair-heavy similarity scans;
    * summation order is identical, so results are bit-equal).
    */
  def dotD(a: Column, b: Column): Column = TextExpressions.dot_product(a, b)

  def norm2(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity; operation order fixed as dot/(||a||*||b||). */
  def cosine(a: Column, b: Column): Column = dotD(a, b) / (norm2(a) * norm2(b))

  /** Sign-bit locality-sensitive bucket of `v` (double array) against a
    * fixed set of hyperplanes: bit i = [v · plane_i >= 0]. Planes are
    * baked into the expression — deterministic across runs and nodes.
    * (Custom LshSignBits expression: one traversal per row instead of
    * an interpreted zip_with/aggregate fold per plane.)
    */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    TextExpressions.lsh_sign_bits(v, planes)

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Deterministic Rademacher (±1) hyperplanes: entry (p, i) is +1 iff
    * the first md5 nibble of "pl:p:i" has its high bit set. ±1 entries
    * are a standard sign-LSH family (Achlioptas-style sparse/signed
    * projections), and — unlike Gaussian planes — the DuckDB oracle can
    * regenerate them with `substr(md5(...), 1, 1)`, and `v · plane`
    * reduces to a sum of ±v_i whose sequential double fold both engines
    * compute bit-identically. This is what lets the LSH BUCKETING
    * stages of dd05/sim02 be oracle-checked, not just their verifies.
    */
  def rademacherPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(nPlanes)(p => Seq.tabulate(dim) { i =>
      val hb = TextOps.md5Prefix(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"pl:$p:$i"), 1)
      if ((hb & 0x80L) != 0L) 1.0 else -1.0
    })
}

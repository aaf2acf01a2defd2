package graft.functions

import java.util.Locale

/** Deterministic random-hyperplane LSH structure shared by the similarity
  * operators: q56 (ANN probing) and q54 (near-dup pair mining) hash with the
  * SAME L=16 tables of r=4 sign bits, so one bucketing pass serves both.
  *
  * Two properties matter here:
  *
  *  1. **Codegen, not interpreted lambdas.** Signatures are computed with
  *     `graft_dot` (the codegen'd tight-loop dot product) against literal
  *     plane vectors — round 1 computed them with 64 interpreted
  *     `aggregate(zip_with(...))` folds per row, which dominated q56's
  *     runtime (VERDICT r1).
  *
  *  2. **Bit-exact cross-engine reproducibility.** Plane components are
  *     emitted as 17-significant-digit scientific-notation literals, which
  *     BOTH Spark and DuckDB parse directly as DOUBLE (plain decimal
  *     literals would go through DECIMAL in DuckDB, whose int128→double
  *     conversion can double-round — a 1-ULP trap near a sign boundary).
  *     Both engines then evaluate the same ascending-index double fold
  *     (graft_dot ↔ list_reduce), so bucket ids agree bit-for-bit and the
  *     LSH-filtered q54 can be oracle-checked EXACTLY.
  */
object Hyperplanes {
  val dim = 64
  val bits = 4
  val tables = 16

  /** Upper bound of the PARAMETERIZED plane budget (VERDICT r8 item 1).
    * The fixed 64-plane pool forced every high-bit posture to SHRINK L
    * (8×8 → 5×11 → 4×14), which is where the measured recall collapse
    * came from — recall ≈ 1−(1−p^b)^L needs L held (or grown) while b
    * steps with log₂(corpus). Grown 512 → 640 in round 11 for the
    * 32×17 sf10-decade recall posture (q167), then 640 → 1024 for the
    * 20-bit sf100-class family (q168) with headroom to 32×20+mp:
    * `scala.util.Random` generates row-sequentially, so every prefix —
    * including the PQ seed rows at [[pqPlaneStart]] — is bit-identical
    * across growths and no existing geometry/oracle/persisted codebook
    * ever changes when the budget grows.
    */
  val maxPlanes = 1024

  /** Rows [pqPlaneStart, pqPlaneStart + pqReservedRows) are RESERVED for
    * the PQ seed partition (only [448, 456) is used today; the block
    * leaves headroom without re-seeding): LSH geometries wide enough to
    * reach row 448 skip the whole block via [[lshPlaneRow]], so no LSH
    * table ever shares a plane with a PQ subspace — bucket families and
    * PQ cells stay statistically disentangled at every geometry.
    */
  val pqReservedRows = 64

  /** Pool row backing LSH plane index `idx` (= table·bitsPerTable + bit):
    * identity below the PQ block, +[[pqReservedRows]] above it. Every
    * geometry registered before round 11 lives entirely below row 448,
    * so this mapping changes nothing for them (DedupSpec pins their
    * buckets); it only routes the r11+ wide geometries around the block.
    * [[LshBucketsExpr]] and [[duckBucketsSql]] MUST agree on this mapping
    * or the oracle check breaks — both call this function.
    */
  def lshPlaneRow(idx: Int): Int =
    if (idx < pqPlaneStart) idx else idx + pqReservedRows

  /** Planes available to LSH geometries: the pool minus the PQ block. */
  val lshPlaneBudget: Int = maxPlanes - pqReservedRows

  /** Seed 7 — must stay stable: the q54 oracle and the q56 recall spec pin
    * results under these exact planes. `scala.util.Random` generates
    * row-sequentially, so [[planesAll]]'s first `tables * bits` rows are
    * bit-identical to the pre-round-9 64-plane pool — every existing
    * geometry's buckets (and oracle) are unchanged by the budget growth.
    */
  lazy val planesAll: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(maxPlanes, dim)(rnd.nextGaussian())
  }

  /** The legacy 64-plane pool (a prefix view of [[planesAll]]). */
  lazy val planes: Array[Array[Double]] = planesAll.take(tables * bits)

  /** Shortest-roundtrip-safe literal: 17 significant digits, E-notation so
    * both parsers produce a DOUBLE (never DECIMAL).
    */
  def fpLit(d: Double): String = String.format(Locale.ROOT, "%.16E", Double.box(d))

  private def planeArraySql(p: Array[Double], open: String, close: String): String =
    p.map(fpLit).mkString(open, ",", close)

  /** Spark SQL: array of the `tables` bucket ids (INT) for `emb`, an
    * array<double> column reference. Bit b of table t is the sign of
    * dot(emb, plane[t*bits+b]), weighted MSB-first — the same packing
    * round 1 used, so q56 buckets are unchanged.
    *
    * Since round 3 this emits the one-pass codegen'd
    * `graft_lsh_buckets` expression ([[graft.functions.LshBucketsExpr]]);
    * [[sparkBucketsLiteralExpr]] keeps the 64-subtree literal form it
    * replaced, and a DedupSpec test pins that both produce identical
    * buckets.
    */
  def sparkBucketsExpr(emb: String): String = s"graft_lsh_buckets($emb)"

  /** Same shared planes regrouped into 64/bits tables of `bits` sign bits
    * — the corpus-growth dial (see [[LshBucketsExpr]] scaladoc).
    */
  def sparkBucketsExpr(emb: String, bitsPerTable: Int): String =
    s"graft_lsh_buckets($emb, $bitsPerTable)"

  /** The HELD-L form (VERDICT r8 item 1): `numTables` tables of
    * `bitsPerTable` bits each, drawn from the first numTables·bits planes
    * of the parameterized pool — so stepping b with the corpus no longer
    * shrinks the table count (the round-8 measured recall collapse:
    * 8×8 → 5×11 → 4×14 kept 32 → 5 → 3 of the 144 sf0.1 true pairs).
    */
  def sparkBucketsExpr(emb: String, bitsPerTable: Int, numTables: Int): String =
    s"graft_lsh_buckets($emb, $bitsPerTable, $numTables)"

  /** Legacy table count of the fixed 64-plane pool: ⌊64/bits⌋. */
  def legacyTables(bitsPerTable: Int): Int = tables * bits / bitsPerTable

  /** The pre-round-3 formulation: one `graft_dot` against a literal plane
    * array per (table, bit). Retained as the independent reference
    * implementation for the equivalence spec.
    */
  def sparkBucketsLiteralExpr(emb: String): String = {
    val buckets = (0 until tables).map { tbl =>
      (0 until bits).map { b =>
        val p = planeArraySql(planes(tbl * bits + b), "array(", ")")
        s"(CASE WHEN graft_dot($emb, $p) > 0D THEN ${1 << (bits - 1 - b)} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }
    buckets.mkString("array(", ", ", ")")
  }

  /** Spark SQL: the single bucket id (INT) of table `tbl` for `emb` — 4
    * codegen'd dots instead of the full 64 of [[sparkBucketsExpr]]. Used by
    * the IVF coarse quantizer's initial partition (q58), which only needs
    * one sign-cell per vector.
    */
  def sparkCellExpr(emb: String, tbl: Int = 0): String =
    (0 until bits).map { b =>
      val p = planeArraySql(planes(tbl * bits + b), "array(", ")")
      s"(CASE WHEN graft_dot($emb, $p) > 0D THEN ${1 << (bits - 1 - b)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB replica of [[sparkCellExpr]] — identical fold, identical plane
    * literals, so cell ids agree bit-for-bit.
    */
  def duckCellSql(emb: String, tbl: Int = 0): String =
    (0 until bits).map { b =>
      val p = planeArraySql(planes(tbl * bits + b), "[", "]")
      s"""(CASE WHEN list_reduce(
           [CAST($emb[i] AS DOUBLE) * ($p)[i] FOR i IN generate_series(1, $dim)],
           (acc, v) -> acc + v) > 0 THEN ${1 << (bits - 1 - b)} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** N-bit generalization of [[sparkCellExpr]]: one cell id from the FIRST
    * `cellBits` planes of the shared pool (so cellBits = 4 produces exactly
    * sparkCellExpr's table-0 cells). This is the IVF coarse quantizer's
    * corpus-growth dial — cell count 2^cellBits must scale with n to keep
    * per-cell quadratic work bounded (the q54→q101 lesson applied to q107's
    * cluster-scoped mining).
    */
  def sparkCellExprN(emb: String, cellBits: Int): String =
    sparkCellExprRange(emb, 0, cellBits)

  /** DuckDB replica of [[sparkCellExprN]] — identical fold and literals. */
  def duckCellSqlN(emb: String, cellBits: Int): String =
    duckCellSqlRange(emb, 0, cellBits)

  /** [[sparkCellExprN]] from the `cellBits` planes starting at pool index
    * `start` — the hierarchical IVF quantizer's two independent seed
    * levels (super cells from planes [0, hi), sub cells from
    * [hi, hi + lo)) come from disjoint plane spans of the same seed-7
    * pool.
    */
  def sparkCellExprRange(emb: String, start: Int, cellBits: Int): String =
    (0 until cellBits).map { b =>
      val p = planeArraySql(planesAll(start + b), "array(", ")")
      s"(CASE WHEN graft_dot($emb, $p) > 0D THEN ${1 << (cellBits - 1 - b)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB replica of [[sparkCellExprRange]]. */
  def duckCellSqlRange(emb: String, start: Int, cellBits: Int): String =
    (0 until cellBits).map { b =>
      val p = planeArraySql(planesAll(start + b), "[", "]")
      s"""(CASE WHEN list_reduce(
           [CAST($emb[i] AS DOUBLE) * ($p)[i] FOR i IN generate_series(1, $dim)],
           (acc, v) -> acc + v) > 0 THEN ${1 << (cellBits - 1 - b)} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Product-quantization sub-planes (q154): plane rows
    * [pqPlaneStart, pqPlaneStart + pqBits) of the seed-7 pool, each SLICED
    * across the `pqM` subspaces — subplane(m, b) = row(pqPlaneStart + b)
    * components [m·subDim, (m+1)·subDim). Disjointness from every LSH
    * geometry is guaranteed by [[lshPlaneRow]] routing LSH plane indices
    * ≥ [[pqPlaneStart]] around the whole reserved
    * [pqPlaneStart, pqPlaneStart + pqReservedRows) block — not by LSH
    * geometries happening to be narrow (q167's 544 planes reach pool row
    * 607) — so the PQ seed partition shares the pool without entangling
    * any bucket family at any registered width.
    */
  val pqPlaneStart = 448
  val pqM = 8
  val pqBits = 4
  val pqSubDim: Int = dim / pqM

  private def pqSubPlane(m: Int, b: Int): Array[Double] =
    planesAll(pqPlaneStart + b).slice(m * pqSubDim, (m + 1) * pqSubDim)

  /** Spark SQL: the `bits`-bit seed cell of subspace `mCol` for `sub` (an
    * array<double> column of pqSubDim components). The plane is selected
    * from a 2-D literal indexed by the m COLUMN (0-based in Spark), so one
    * expression serves all 8 subspaces after the posexplode. `bits` is the
    * PQ codebook dial (q159 measures the 4 → 8 step); rows
    * [pqPlaneStart, pqPlaneStart + bits) stay prefix-stable, so the 4-bit
    * postures' cells are the high nibble of the 8-bit posture's cells.
    */
  def sparkSubCellExpr(sub: String, mCol: String): String =
    sparkSubCellExpr(sub, mCol, pqBits)

  def sparkSubCellExpr(sub: String, mCol: String, bits: Int): String =
    (0 until bits).map { b =>
      val rows = (0 until pqM)
        .map(m => planeArraySql(pqSubPlane(m, b), "array(", ")"))
        .mkString("array(", ",", ")")
      s"(CASE WHEN graft_dot($sub, $rows[$mCol]) > 0D THEN ${1 << (bits - 1 - b)} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB replica of [[sparkSubCellExpr]] — identical sliced-plane
    * literals (1-based list indexing, hence `mCol + 1`), identical fold.
    */
  def duckSubCellSql(sub: String, mCol: String): String =
    duckSubCellSql(sub, mCol, pqBits)

  def duckSubCellSql(sub: String, mCol: String, bits: Int): String =
    (0 until bits).map { b =>
      val rows = (0 until pqM)
        .map(m => planeArraySql(pqSubPlane(m, b), "[", "]"))
        .mkString("[", ",", "]")
      s"""(CASE WHEN list_reduce(
           [CAST($sub[i] AS DOUBLE) * (($rows)[$mCol + 1])[i] FOR i IN generate_series(1, $pqSubDim)],
           (acc, v) -> acc + v) > 0 THEN ${1 << (bits - 1 - b)} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** DuckDB SQL: the identical bucket-id list for `emb`, a FLOAT[] column
    * reference. list_reduce's fold (first element as init, ascending) is
    * bit-identical to graft_dot's 0.0-init ascending fold because
    * 0.0 + x == x exactly.
    */
  def duckBucketsSql(emb: String): String = duckBucketsSql(emb, bits)

  /** Same shared planes regrouped into 64/bitsPerTable tables — the DuckDB
    * replica of [[sparkBucketsExpr(emb:String,bitsPerTable:Int)*]]. Plane
    * index (t * bitsPerTable + b) and MSB-first weighting mirror
    * [[LshBucketsExpr]]'s flat-plane layout exactly, so bucket ids agree
    * bit-for-bit at ANY geometry (the r=8 posture of q101/q102 is
    * oracle-checked through this).
    */
  def duckBucketsSql(emb: String, bitsPerTable: Int): String = {
    // Floor division mirrors LshBucketsExpr: non-dividing geometries use
    // the first ⌊64/b⌋·b planes (the 11-bit sf10 posture = 5 tables × 11).
    require(bitsPerTable > 0 && tables * bits / bitsPerTable >= 1,
      s"bitsPerTable must fit in ${tables * bits} planes, got $bitsPerTable")
    duckBucketsSql(emb, bitsPerTable, legacyTables(bitsPerTable))
  }

  /** Held-L DuckDB replica — identical plane indexing
    * ([[lshPlaneRow]] of t · bitsPerTable + b into [[planesAll]]) and
    * MSB-first weighting as [[LshBucketsExpr]], so bucket ids agree
    * bit-for-bit at any (bits, tables) point of the parameterized budget.
    */
  def duckBucketsSql(emb: String, bitsPerTable: Int, numTables: Int): String = {
    require(bitsPerTable > 0 && numTables > 0 && bitsPerTable * numTables <= lshPlaneBudget,
      s"geometry $numTables x $bitsPerTable exceeds the $lshPlaneBudget-plane LSH budget")
    val buckets = (0 until numTables).map { tbl =>
      (0 until bitsPerTable).map { b =>
        val p = planeArraySql(planesAll(lshPlaneRow(tbl * bitsPerTable + b)), "[", "]")
        s"""(CASE WHEN list_reduce(
             [CAST($emb[i] AS DOUBLE) * ($p)[i] FOR i IN generate_series(1, $dim)],
             (acc, v) -> acc + v) > 0 THEN ${1 << (bitsPerTable - 1 - b)} ELSE 0 END)"""
      }.mkString("(", " + ", ")")
    }
    buckets.mkString("[", ", ", "]")
  }
}

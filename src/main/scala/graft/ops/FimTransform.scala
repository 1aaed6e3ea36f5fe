package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fill-in-the-middle (FIM) training transform — the PSM rearrangement of
 * Bavarian et al. 2022 ("Efficient Training of Language Models to Fill
 * in the Middle"): for a deterministic fraction of documents, cut the
 * text at two random points and emit `<PRE>prefix<SUF>suffix<MID>middle`
 * so the model learns infilling while the token mass is unchanged.
 *
 * Everything is a pure Column projection (whole-stage codegen, no UDF,
 * no state): selection and both cut points are md5 draws off the doc id
 * (no rand() — every engine and every retry reproduces the same split),
 * the fraction is an EXACT basis-point threshold (the compare
 * `h28 % 10000 < rateBp` is exact and deterministic; the draw itself is
 * uniform only to ~2^-28 — 2^28 mod 10000 != 0, a ~4e-5 relative
 * non-uniformity, the importanceSample convention), and the cuts land
 * uniformly in [0, len] of the NORMALIZED text (the engine-wide
 * canonical form, so the transform composes with every other text
 * operator). A NULL text is treated as the EMPTY document (normalized
 * form coalesced to '' — the bpe/words convention), so cuts, n_chars
 * and psm are always non-null. Unselected docs pass through with
 * `fim_applied` = false and cuts pinned at 0 — one schema for the whole
 * corpus, trivially filterable.
 *
 * Scale shape: stateless per-row projection — no shuffle, no join, no
 * window; runs at scan speed and streams under Structured Streaming
 * unchanged.
 */
object FimTransform {

  /** 28-bit md5 hash of a string column (engine-portable; the
    * TrainShuffle/Dedup discipline). */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /**
   * Output per doc: (idCol, fim_applied, n_chars, cut_lo, cut_hi, psm).
   * `psm` is the training string: the PSM rearrangement for selected
   * docs, the normalized text verbatim otherwise. `rateBp` selects in
   * exact basis points (0..10000).
   */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
      rateBp: Int = 5000, salt: String = "fim"): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000,
      s"fimSplit: rateBp must be 0..10000 basis points, got $rateBp")
    val norm =
      coalesce(graft.functions.TextFunctions.normText(col(textCol)), lit(""))
    val id = col(idCol).cast("string")
    val len = length(col("_fim_norm")).cast("long")
    val applied = h28(concat(id, lit(s":$salt:sel"))) % 10000L < rateBp
    val p1 = h28(concat(id, lit(s":$salt:p1"))) % (len + 1L)
    val p2 = h28(concat(id, lit(s":$salt:p2"))) % (len + 1L)
    df.withColumn("_fim_norm", norm)
      .withColumn("fim_applied", applied)
      .withColumn("cut_lo", when(col("fim_applied"), least(p1, p2))
        .otherwise(lit(0L)))
      .withColumn("cut_hi", when(col("fim_applied"), greatest(p1, p2))
        .otherwise(lit(0L)))
      .withColumn("psm",
        when(col("fim_applied"), concat(
          lit("<PRE>"),
          col("_fim_norm").substr(lit(1L), col("cut_lo")),
          lit("<SUF>"),
          col("_fim_norm").substr(col("cut_hi") + 1L, len - col("cut_hi")),
          lit("<MID>"),
          col("_fim_norm").substr(col("cut_lo") + 1L,
            col("cut_hi") - col("cut_lo"))))
          .otherwise(col("_fim_norm")))
      .select(col(idCol), col("fim_applied"),
        len.as("n_chars"), col("cut_lo"), col("cut_hi"), col("psm"))
  }
}

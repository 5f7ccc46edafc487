package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-gradient integer perceptron — the in-engine trainer for the
  * lightweight document classifiers curation pipelines lean on (the
  * fastText-style language/quality gate of CCNet-family pipelines),
  * here learning en-vs-rest from stopword-profile hit counts. All
  * arithmetic is EXACT LONGS: features are integer counts, labels ±1,
  * and each epoch's update is the batch rule w ← w + Σ_misclassified
  * y·x (a single map-side-combinable aggregate), so the training
  * trajectory — not just the final scores — is bit-identical in any
  * engine and under any partitioning. Epochs are fixed so the oracle
  * can unroll the same trajectory (the kmeans/BPE discipline).
  *
  * Scale shape: the feature build is a narrow codegen'd select; each
  * epoch is ONE aggregate producing a k-vector of deltas (collected —
  * the model is the broadcast-sized state, exactly like the k-means
  * codebook), and the weights re-enter the next epoch as plan
  * LITERALS, so the margin evaluation stays inside WholeStageCodegen
  * with no join. Final scoring is one more scan.
  *
  * Decision rule: predict en iff margin > 0 (zero margin counts as
  * misclassified during training AND predicts not-en — the convention
  * the oracle mirrors).
  *
  * On the DRIVER FIXTURE the lang labels are synthetic (every document
  * is the same word-soup distribution), so held-in accuracy hovers at
  * the class prior — the contract verifies the TRAINING TRAJECTORY
  * and scoring bits, not model quality; PerceptronSpec proves the same
  * trainer reaches 100% on a corpus whose labels actually follow the
  * features (the situation the real CCNet-style gate is trained in).
  */
object Perceptron {

  /** Feature columns (exact integer counts; x0 is the bias). One
    * definition shared by every epoch and the final scorer. */
  private def features(docs: DataFrame): DataFrame = {
    def hits(ws: Seq[String]): Column =
      size(filter(split(col("text"), " "), w => w.isInCollection(ws))).cast("long")
    val profiles = TextOps.langProfiles.map(_._2)
    val xs = lit(1L).as("x0") +:
      profiles.zipWithIndex.map { case (ws, i) => hits(ws).as(s"x${i + 1}") } :+
      (octet_length(col("text")) - length(col("text"))).cast("long")
        .as(s"x${profiles.size + 1}")
    docs.select(
      (col("doc_id") +:
        when(col("lang") === "en", 1L).otherwise(-1L).as("y") +:
        xs): _*)
  }

  /** Number of features including bias. */
  val NumFeatures: Int = TextOps.langProfiles.size + 2

  /** Train `epochs` batch updates, then score every document with the
    * final weights: (doc_id, y, margin, predicted_en, correct). */
  def train(docs: DataFrame, epochs: Int = 3): DataFrame =
    score(features(docs), weights(docs, epochs))

  /** The epoch loop alone — the final weight vector (model-sized, the
    * artifact a held-out eval or a serving gate consumes). */
  def weights(docs: DataFrame, epochs: Int = 3): Array[Long] = {
    val feats = features(docs).localCheckpoint(true)
    val k = NumFeatures
    var w = Array.fill(k)(0L)
    var e = 0
    while (e < epochs) {
      val margin = (0 until k).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      val deltas = feats
        .filter(col("y") * margin <= 0L)
        .agg(sum(col("y") * col("x0")).as("d0"),
          (1 until k).map(j => sum(col("y") * col(s"x$j")).as(s"d$j")): _*)
        .collect()(0)
      w = Array.tabulate(k)(j =>
        w(j) + (if (deltas.isNullAt(j)) 0L else deltas.getLong(j)))
      e += 1
    }
    feats.unpersist()
    w
  }

  private def score(feats: DataFrame, w: Array[Long]): DataFrame = {
    val k = NumFeatures
    val margin = (0 until k).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
    feats.select(col("doc_id"), col("y"), margin.as("margin"),
      (margin > 0L).as("predicted_en"),
      ((margin > 0L) === (col("y") === 1L)).as("correct"))
  }

  /** Held-out evaluation — weights from `trainDocs` only, confusion
    * counts + accuracy on `evalDocs`: the generalization readout a
    * curation gate ships before being applied to unseen data. All
    * counts exact longs; accuracy is one snapped division. */
  def evalHeldOut(trainDocs: DataFrame, evalDocs: DataFrame,
                  epochs: Int = 3): DataFrame = {
    val w = weights(trainDocs, epochs)
    score(features(evalDocs), w)
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("predicted_en") && col("y") === 1L, 1)).as("tp"),
        count(when(col("predicted_en") && col("y") === -1L, 1)).as("fp"),
        count(when(!col("predicted_en") && col("y") === -1L, 1)).as("tn"),
        count(when(!col("predicted_en") && col("y") === 1L, 1)).as("fn"))
      .select(col("n_docs"), col("tp"), col("fp"), col("tn"), col("fn"),
        when(col("n_docs") > 0, Det.snap((col("tp") + col("tn")).cast("double") /
          col("n_docs").cast("double"), 6)).as("accuracy"))
  }

  /** Held-out ranking quality: exact AUC of the margin scorer via the
    * Mann–Whitney rank-sum identity with midrank ties —
    * AUC = [#{(p,n): m_p > m_n} + ½·#{m_p = m_n}] / (n_pos·n_neg) —
    * computed ENTIRELY in integer arithmetic: margins are exact longs,
    * so grouping by margin value and accumulating
    * u2 = Σ_m cp(m)·(2·negBelow(m) + cn(m)) gives the 2×-scaled U
    * statistic exactly; AUC is ONE correctly-rounded division of
    * non-negative longs (the threshold-free companion to
    * [[evalHeldOut]]'s confusion counts — what a curation gate reads
    * before picking its operating point).
    *
    * Scale shape: one |distinct margins|-bounded aggregate, the
    * cumulative negative count via [[Ranks.runningSumByRange]] (two-
    * pass range-partitioned — no single-partition window), one 1-row
    * finishing aggregate. Envelope: u2 ≤ 2·n_pos·n_neg < 2⁶³ for up to
    * ~2·10⁹ docs per class (ANSI throws beyond, never wraps); both
    * cast operands are non-negative, so the direct int→double cast is
    * correctly rounded in both engines. */
  /** Test seam: held-out margins under train-split weights — the exact
    * frame [[aucHeldOut]] aggregates (PerceptronSpec cross-checks the
    * rank-sum identity against brute-force pairs on it). */
  private[graft] def scoreHeldOut(trainDocs: DataFrame, evalDocs: DataFrame,
                                  epochs: Int): DataFrame =
    score(features(evalDocs), weights(trainDocs, epochs))

  def aucHeldOut(trainDocs: DataFrame, evalDocs: DataFrame,
                 epochs: Int = 3): DataFrame = {
    val w = weights(trainDocs, epochs)
    val byM = score(features(evalDocs), w)
      .groupBy(col("margin"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("cp"),
        sum(when(col("y") === -1L, 1L).otherwise(0L)).as("cn"))
    Ranks.runningSumByRange(byM, Seq(col("margin")), "cn", "cum_n")
      .select(col("cp"), col("cn"),
        (col("cp") * (lit(2L) * (col("cum_n") - col("cn")) + col("cn")))
          .as("u2"))
      .agg(sum(col("cp")).as("n_pos"), sum(col("cn")).as("n_neg"),
        sum(col("u2")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          Det.snap(col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
          .as("auc"))
  }

  /** Precision/recall operating curve of the margin scorer — one row
    * per DISTINCT margin threshold t (predict positive iff margin ≥ t):
    * tp/fp from a descending-margin cumulative count, precision and
    * recall as snapped exact-integer ratios. The threshold sweep a gate
    * owner reads next to [[aucHeldOut]]'s single number when picking an
    * operating point. Same scale shape as the AUC: |distinct margins|-
    * bounded aggregate + the range-partitioned running sum (descending
    * order — [[Ranks.runningSumByRange]] takes the total order as
    * columns), one broadcast scalar for the positive total. */
  def prCurveHeldOut(trainDocs: DataFrame, evalDocs: DataFrame,
                     epochs: Int = 3): DataFrame = {
    val w = weights(trainDocs, epochs)
    val byM = score(features(evalDocs), w)
      .groupBy(col("margin"))
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("cp"),
        sum(when(col("y") === -1L, 1L).otherwise(0L)).as("cn"))
    val cum = Ranks.runningSumByRange(
      Ranks.runningSumByRange(byM,
        Seq(col("margin").desc), "cp", "tp"),
      Seq(col("margin").desc), "cn", "fp")
    val totals = byM.agg(sum(col("cp")).as("n_pos"))
    cum.crossJoin(broadcast(totals))
      .select(col("margin").as("threshold"), col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        Det.snap(col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        when(col("n_pos") > 0L,
          Det.snap(col("tp").cast("double") / col("n_pos").cast("double"), 6))
          .as("recall"))
  }

  /** Oracle twin of [[prCurveHeldOut]]: descending-margin window
    * cumulative counts (bit-identical to the two-pass range form) and
    * the same snapped ratios. */
  def prCurveHeldOutSql(epochs: Int): String = {
    val chain = weightChainSql(epochs)
    s"""$chain,
sc AS (
  SELECT fe.y, (${marginExprSql("w", "fe")}) AS margin
  FROM fe CROSS JOIN w$epochs w),
bym AS (
  SELECT margin,
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cn
  FROM sc GROUP BY 1),
cum AS (
  SELECT margin, cp, cn,
         CAST(sum(cp) OVER (ORDER BY margin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
         CAST(sum(cn) OVER (ORDER BY margin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
  FROM bym),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos FROM bym)
SELECT margin AS threshold, tp, fp, tot.n_pos - tp AS fn,
       ${graft.ops.Det.snapSql("CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)", 6)} AS precision,
       CASE WHEN tot.n_pos > 0 THEN
         ${graft.ops.Det.snapSql("CAST(tp AS DOUBLE) / CAST(tot.n_pos AS DOUBLE)", 6)}
       END AS recall
FROM cum CROSS JOIN tot"""
  }

  /** One feature CTE (doc_id, y, x0..xk) over `documents`; `where` is
    * the split filter ("" for the whole table). Shared by every oracle
    * twin so the feature expressions cannot diverge between them. */
  private def featCteSql(name: String, where: String): String = {
    val k = NumFeatures
    def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString("(", ", ", ")")
    val profileCols = TextOps.langProfiles.zipWithIndex.map { case ((_, ws), i) =>
      s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)})) AS BIGINT) AS x${i + 1}"
    }.mkString(",\n         ")
    val from = if (where.isEmpty) "FROM documents" else s"FROM documents $where"
    s"""$name AS MATERIALIZED (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
         CAST(1 AS BIGINT) AS x0,
         $profileCols,
         CAST(strlen(text) - length(text) AS BIGINT) AS x${k - 1}
  $from)"""
  }

  /** w0 + the unrolled epoch blocks d1/w1..d_epochs/w_epochs, training
    * on CTE `f`. Shared by every oracle twin. */
  private def epochBlocksSql(epochs: Int): String = {
    val k = NumFeatures
    val w0 = s"w0 AS (SELECT ${(0 until k).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")})"
    val blocks = (1 to epochs).map { e =>
      val p = e - 1
      s"""d$e AS (
  SELECT ${(0 until k).map(j => s"COALESCE(CAST(sum(f.y * f.x$j) AS BIGINT), 0) AS d$j").mkString(", ")}
  FROM f CROSS JOIN w$p w
  WHERE f.y * (${marginExprSql("w", "f")}) <= 0),
w$e AS (
  SELECT ${(0 until k).map(j => s"w.w$j + d.d$j AS w$j").mkString(", ")}
  FROM w$p w CROSS JOIN d$e d)"""
    }.mkString(",\n")
    s"$w0,\n$blocks"
  }

  /** Shared unrolled train-split weight chain (f/fe feature CTEs,
    * w0..w_epochs) used by the held-out eval twins. */
  private def weightChainSql(epochs: Int): String =
    s"""WITH ${featCteSql("f", "WHERE doc_id % 5 <> 0")},
${featCteSql("fe", "WHERE doc_id % 5 = 0")},
${epochBlocksSql(epochs)}"""

  private def marginExprSql(wAlias: String, fAlias: String): String =
    (0 until NumFeatures).map(j => s"$wAlias.w$j * $fAlias.x$j").mkString(" + ")

  /** Oracle twin: the same feature expressions over `documents`, the
    * epoch loop unrolled into weight CTEs (one row of w0..wk each),
    * deltas COALESCEd for the no-misclassification fixpoint. */
  def trainSql(epochs: Int): String = {
    val m = marginExprSql("w", "f")
    s"""WITH ${featCteSql("f", "")},
${epochBlocksSql(epochs)}
SELECT f.doc_id, f.y, ($m) AS margin,
       ($m) > 0 AS predicted_en,
       (($m) > 0) = (f.y = 1) AS correct
FROM f CROSS JOIN w$epochs w"""
  }

  /** Oracle twin of [[evalHeldOut]]: the trainSql chain with the f CTE
    * filtered to the train split, a second feature CTE over the held-out
    * split, and a one-row confusion aggregate. */
  def evalHeldOutSql(epochs: Int): String = {
    s"""${weightChainSql(epochs)},
sc AS (
  SELECT fe.y, (${marginExprSql("w", "fe")}) > 0 AS predicted_en
  FROM fe CROSS JOIN w$epochs w)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN predicted_en AND y = 1 THEN 1 END) AS BIGINT) AS tp,
       CAST(count(CASE WHEN predicted_en AND y = -1 THEN 1 END) AS BIGINT) AS fp,
       CAST(count(CASE WHEN NOT predicted_en AND y = -1 THEN 1 END) AS BIGINT) AS tn,
       CAST(count(CASE WHEN NOT predicted_en AND y = 1 THEN 1 END) AS BIGINT) AS fn,
       CASE WHEN count(*) > 0 THEN ${graft.ops.Det.snapSql("CAST(count(CASE WHEN predicted_en AND y = 1 THEN 1 END) + count(CASE WHEN NOT predicted_en AND y = -1 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} END AS accuracy
FROM sc"""
  }

  /** Oracle twin of [[aucHeldOut]]: the same unrolled weight chain,
    * margins grouped by exact value, the cumulative negative count as
    * a window running sum (bit-identical to the two-pass range form —
    * long addition is associative), and the identical 2×-scaled-U
    * division of non-negative exact integers. */
  def aucHeldOutSql(epochs: Int): String = {
    s"""${weightChainSql(epochs)},
sc AS (
  SELECT fe.y, (${marginExprSql("w", "fe")}) AS margin
  FROM fe CROSS JOIN w$epochs w),
bym AS (
  SELECT margin,
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cn
  FROM sc GROUP BY 1),
cum AS (
  SELECT cp, cn,
         CAST(sum(cn) OVER (ORDER BY margin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_n
  FROM bym)
SELECT CAST(sum(cp) AS BIGINT) AS n_pos, CAST(sum(cn) AS BIGINT) AS n_neg,
       CASE WHEN sum(cp) > 0 AND sum(cn) > 0 THEN
         ${graft.ops.Det.snapSql("CAST(sum(cp * (2 * (cum_n - cn) + cn)) AS DOUBLE) / CAST(2 * sum(cp) * sum(cn) AS DOUBLE)", 6)}
       END AS auc
FROM cum"""
  }

}

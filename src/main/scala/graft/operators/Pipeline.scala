package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed corpus-intake pipeline — the end-to-end shape a
  * training-data run actually executes, assembled from the library's
  * own stages rather than re-implemented: exact dedup (ll1's
  * hash-group semantics) → language ID (ta1's stage) → quality gate
  * (ta2's stage) → per-(language, verdict) intake ledger. The point
  * the oracle checks is COMPOSITION: each stage's output feeds the
  * next inside one Catalyst plan, so the optimizer sees the whole
  * pipeline (the dedup window and the final aggregate are the only
  * shuffles; lang + quality fuse into the same codegen'd stage).
  *
  * At 100 TB this is one pass over the corpus plus one md5-keyed
  * shuffle — the intake ledger (a few rows per language × verdict) is
  * what lands in the run report.
  */
object Pipeline {

  val defs: Map[String, Q] = Map(
    "cp1_corpus_intake" -> ((s, dir) => {
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val deduped = Tables.documents(s, dir)
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val staged = TextAnalysis.withQualityVerdict(
        TextAnalysis.withLangPrediction(
          deduped.withColumn("ws", split(col("text"), " "))))
      staged.groupBy(col("predicted"), col("verdict"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
    })
  )

  val oracles: Map[String, String] = Map(
    "cp1_corpus_intake" -> {
      import TextAnalysis.{stopwords, inList}
      val scoreSql = stopwords.map { case (l, ws) =>
        s"CAST(len(list_filter(ws, w -> w IN ${inList(ws)})) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val bestSql = "greatest(" + stopwords.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
      val predSql = "CASE " + stopwords.map { case (l, _) =>
        s"WHEN $bestSql > 0 AND s_$l = $bestSql THEN '$l'"
      }.mkString(" ") + " ELSE 'unknown' END"
      s"""WITH dd AS (
            SELECT doc_id, text FROM (
              SELECT doc_id, text,
                ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1),
          t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM dd),
          langed AS (SELECT doc_id, text, ws, $scoreSql FROM t),
          staged AS (
            SELECT doc_id, $predSql AS predicted,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len(list_filter(ws, w -> w IN ${inList(stopwords.head._2)})) AS BIGINT)
                AS stop_hits
            FROM langed),
          verdicts AS (
            SELECT doc_id, predicted, n_words,
              CASE WHEN n_words BETWEEN 20 AND 100
                    AND (n_chars - (n_words - 1)) / n_words < 8
                    AND stop_hits / n_words >= 0.02
                   THEN 'keep' ELSE 'flag' END AS verdict
            FROM staged)
          SELECT predicted, verdict, COUNT(*) AS n_docs,
            CAST(SUM(n_words) AS BIGINT) AS n_tokens,
            MIN(doc_id) AS first_doc
          FROM verdicts GROUP BY predicted, verdict"""
    }
  )
}

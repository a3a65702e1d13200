package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined-chunking dedup over the corpus — the aggregation layer
  * on top of [[graft.functions.CdcChunks]]: per document, how many CDC
  * chunks it has and how many of those chunk instances are SHARED with at
  * least one other document. Shift-invariant near-dup evidence: mirrored
  * pages with injected headers, crawl re-snapshots with edits, and
  * boilerplate-wrapped copies all light up as high shared-chunk fractions
  * even when every byte offset moved (see the CDC provenance note in
  * [[graft.functions.CdcChunks]]).
  *
  * Scale shape: the chunk-hash expression rides the corpus scan (no
  * shuffle, codegen); the only exchanges are the canonical dedup pattern —
  * one hash-partitioned aggregate over chunk hashes (map-side combined)
  * and one shuffle join back, both on the same key so AQE coalesces them,
  * then a doc-keyed aggregate. Chunk rows are ~len/16 per document, far
  * fewer than the posexplode-per-position relational form (16× fewer rows
  * than characters), and no per-document windows or sorts appear anywhere.
  */
object CdcDedup {

  /** Per-document CDC dedup stats.
    *
    * @return (doc_id, n_chunks, n_dup_chunks) — a chunk instance counts as
    *         dup iff its hash occurs in ≥ 2 distinct documents
    */
  def stats(df: DataFrame, idCol: String, textCol: String,
            w: Int = 8): DataFrame = {
    val chunks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.CdcOps.chunkHashes(col(textCol), w)).as("h"))
    // (h, doc) instance counts FIRST: the md5-heavy chunk scan feeds ONE
    // aggregate, and because both consumers below sit on the identical
    // aggregate subtree, its shuffle is computed once and REUSED (AQE
    // stage cache) — the naive chunks-join-share shape evaluates the
    // chunk expression twice (the aggregate subtree and the raw join side
    // never unify). Also shrinks the join to distinct (h, doc) pairs: a
    // document repeating a chunk ships it once, not per instance.
    val perDoc = chunks.groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
    // nd ≡ count(*): c ≥ 1 by construction. Summing over c instead keeps
    // the column CONSUMED, so pruning can't specialize this branch's
    // perDoc subtree away from the join branch's — identical canonical
    // plans are what make the shuffle stage reusable (verified in the
    // stage log: one 93k-row exchange write at sf0.1, not two).
    val share = perDoc.groupBy("h")
      .agg(sum(when(col("c") >= 1, 1L).otherwise(0L)).as("nd"))
    perDoc.join(share, "h")
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_chunks"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_dup_chunks"))
  }

  /** DuckDB twin of [[stats]]: the boundary rule is replayed verbatim —
    * `substr(md5(substr(text, i-w+1, w)), 1, 1) = '0'` over every window
    * end position — then chunks are rebuilt from the cut list and the same
    * two aggregates run. Engine-independent because the cut predicate is
    * md5 (identical in both engines) over code-point substrings (both
    * engines' `substr`/`length` semantics).
    */
  def statsSqlFor(table: String, idCol: String, textCol: String,
                  w: Int = 8): String =
    s"""WITH d AS (
       |  SELECT $idCol AS doc_id, $textCol AS text,
       |         CAST(length($textCol) AS BIGINT) AS n
       |  FROM $table),
       |cuts AS (
       |  SELECT doc_id, i
       |  FROM d, UNNEST(range($w, n + 1)) AS t(i)
       |  WHERE substr(md5(substr(text, CAST(i AS INT) - $w + 1, $w)), 1, 1) = '0'),
       |cl AS (
       |  SELECT d.doc_id, any_value(d.text) AS text, any_value(d.n) AS n,
       |         coalesce(list(c.i ORDER BY c.i) FILTER (WHERE c.i IS NOT NULL),
       |                  []) AS cs
       |  FROM d LEFT JOIN cuts c USING (doc_id)
       |  GROUP BY d.doc_id),
       |chunks AS (
       |  SELECT doc_id,
       |    md5(substr(text,
       |      CAST(CASE WHEN j = 1 THEN 0 ELSE cs[CAST(j AS INT) - 1] END AS INT) + 1,
       |      CAST((CASE WHEN j = CAST(len(cs) AS BIGINT) + 1 THEN n
       |            ELSE cs[CAST(j AS INT)] END)
       |        - (CASE WHEN j = 1 THEN 0
       |           ELSE cs[CAST(j AS INT) - 1] END) AS INT))) AS h
       |  FROM cl, UNNEST(range(1, CAST(len(cs) AS BIGINT) + 2)) AS t(j)
       |  WHERE (CASE WHEN j = CAST(len(cs) AS BIGINT) + 1 THEN n
       |         ELSE cs[CAST(j AS INT)] END)
       |      > (CASE WHEN j = 1 THEN 0 ELSE cs[CAST(j AS INT) - 1] END)),
       |share AS (SELECT h, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
       |SELECT c.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dup_chunks
       |FROM chunks c JOIN share s USING (h)
       |GROUP BY c.doc_id""".stripMargin
}

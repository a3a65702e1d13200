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

  /** Near-dup candidate pairs from shared CDC chunks — the actionable
    * output of the chunk table: document pairs sharing ≥ `minShared`
    * non-boilerplate chunks, with the shared count as evidence.
    *
    * Chunks present in more than `hotCap` documents are STOP-CHUNKS
    * (boilerplate: nav fragments, license headers, template text) and are
    * dropped before pairing — the same lossless-at-the-operating-point
    * capping discipline as the prefix-filter caps in [[Dedup]]: a hot
    * chunk's pairs are overwhelmingly false candidates, and any true
    * near-dup pair still shares plenty of cold chunks. The cap also BOUNDS
    * the join: ≤ C(hotCap, 2) pairs per chunk, so candidate volume is
    * O(cold chunks × hotCap²) — never the quadratic blowup an uncapped
    * self-join on a boilerplate chunk would produce at corpus scale.
    *
    * Fixture note: ScaleFixture's sf1.0+ lakes clone every document ~10×
    * per decade, so EVERY chunk crosses hotCap and the result is empty
    * there — by design, and DuckDB agrees (the oracle stays hash-equal).
    * A corpus whose every chunk is boilerplate-frequency has no signal a
    * bounded pair miner should emit; [[stats]] is the right lens at that
    * duplication level. At the driver gates the fixture yields 29 pairs
    * (sf0.01) / 233 (sf0.1), planted near-dups surfacing on top.
    *
    * @return (doc_a, doc_b, shared) with doc_a < doc_b, shared ≥ minShared
    */
  def pairs(df: DataFrame, idCol: String, textCol: String, w: Int = 8,
            hotCap: Int = 8, minShared: Int = 3): DataFrame = {
    val chunks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.CdcOps.chunkHashes(col(textCol), w)).as("h"))
    // same reuse-compatible diamond as stats(): nd consumes c so both
    // consumers of the perDoc shuffle share one canonical subtree
    val perDoc = chunks.groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
    val nd = perDoc.groupBy("h")
      .agg(sum(when(col("c") >= 1, 1L).otherwise(0L)).as("nd"))
    // `c >= 1` is vacuously true — it's there to keep c CONSUMED on this
    // branch too, or pruning specializes the probe-side perDoc subtree
    // (no count) away from nd's (count) and the chunk scan runs twice
    val cold = perDoc.join(nd, "h")
      .where(col("nd").between(2, hotCap) && col("c") >= 1)
      .select("h", "doc_id")
    // collect each cold chunk's doc list (≤ hotCap elements BY CONSTRUCTION
    // — the filter precedes the collect, so no boilerplate chunk can ever
    // materialize a big list) and expand C(n,2) pairs in-row: one exchange
    // and one chunk scan where a self-join on h would shuffle `cold` twice
    // and re-evaluate the md5 scan per side (the deduplicated self-join
    // branches stop canonicalizing equal, measured in the stage log).
    val ds = col("ds")
    val combos = flatten(transform(
      sequence(lit(0), size(ds) - 2),
      i => transform(
        slice(ds, i + lit(2), size(ds)),
        b => struct(element_at(ds, i + 1).as("doc_a"), b.as("doc_b")))))
    cold.groupBy("h")
      .agg(array_sort(collect_list("doc_id")).as("ds"))
      .where(size(ds) >= 2) // defensive: sequence(0,-1) would DESCEND
      .select(explode(combos).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** DuckDB twin of [[pairs]] — chunk CTE from [[statsSqlFor]], then the
    * capped pair join.
    */
  def pairsSqlFor(table: String, idCol: String, textCol: String,
                  w: Int = 8, hotCap: Int = 8, minShared: Int = 3): String =
    s"""${chunksCte(table, idCol, textCol, w)},
       |pd AS (SELECT h, doc_id, count(*) AS c FROM chunks GROUP BY h, doc_id),
       |nd AS (SELECT h, count(*) AS nd FROM pd GROUP BY h),
       |cold AS (SELECT pd.h, pd.doc_id FROM pd JOIN nd USING (h)
       |         WHERE nd.nd BETWEEN 2 AND $hotCap)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(count(*) AS BIGINT) AS shared
       |FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING count(*) >= $minShared""".stripMargin

  /** DuckDB twin of [[stats]]: the boundary rule is replayed verbatim —
    * `substr(md5(substr(text, i-w+1, w)), 1, 1) = '0'` over every window
    * end position — then chunks are rebuilt from the cut list and the same
    * two aggregates run. Engine-independent because the cut predicate is
    * md5 (identical in both engines) over code-point substrings (both
    * engines' `substr`/`length` semantics).
    */
  def statsSqlFor(table: String, idCol: String, textCol: String,
                  w: Int = 8): String =
    s"""${chunksCte(table, idCol, textCol, w)},
       |share AS (SELECT h, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
       |SELECT c.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dup_chunks
       |FROM chunks c JOIN share s USING (h)
       |GROUP BY c.doc_id""".stripMargin

  /** The shared chunk-table CTE: replays [[graft.functions.CdcChunks]]'s
    * cut rule position by position, then rebuilds each chunk substring
    * from the cut list.
    */
  private def chunksCte(table: String, idCol: String, textCol: String,
                        w: Int): String =
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
       |    substr(md5(substr(text,
       |      CAST(CASE WHEN j = 1 THEN 0 ELSE cs[CAST(j AS INT) - 1] END AS INT) + 1,
       |      CAST((CASE WHEN j = CAST(len(cs) AS BIGINT) + 1 THEN n
       |            ELSE cs[CAST(j AS INT)] END)
       |        - (CASE WHEN j = 1 THEN 0
       |           ELSE cs[CAST(j AS INT) - 1] END) AS INT))), 1, 16) AS h
       |  FROM cl, UNNEST(range(1, CAST(len(cs) AS BIGINT) + 2)) AS t(j)
       |  WHERE (CASE WHEN j = CAST(len(cs) AS BIGINT) + 1 THEN n
       |         ELSE cs[CAST(j AS INT)] END)
       |      > (CASE WHEN j = 1 THEN 0 ELSE cs[CAST(j AS INT) - 1] END))""".stripMargin
}

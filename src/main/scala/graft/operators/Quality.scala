package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Data-quality audit operators (SURVEY.md §2C extensions): the checks
  * a 100 TB pipeline runs before and after every load — referential
  * integrity between related tables and per-column completeness /
  * cardinality profiles. Everything is keyed joins and aggregations;
  * nothing is collected to the driver.
  */
object Quality {

  // -------------------------------------------------------------- dq01
  // Referential integrity: documents and embeddings are releases of the
  // same corpus keyed by id — count rows on each side, ids missing from
  // the other side (left-anti both directions), and id duplicates. One
  // row of audit results; each leg is a keyed join or aggregation.
  private val dq01 = QueryDef(
    "dq01_referential_integrity",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id").as("id"))
      val embs = Tables(s, dir).embeddings.select(col("vec_id").as("id"))
      val missingEmb = docs.join(embs, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("docs_without_embedding"))
      val orphanEmb = embs.join(docs, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("embeddings_without_doc"))
      val dupDocs = docs.groupBy("id").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).agg(count(lit(1)).as("duplicate_doc_ids"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(embs.agg(count(lit(1)).as("n_embeddings")))
        .crossJoin(missingEmb)
        .crossJoin(orphanEmb)
        .crossJoin(dupDocs)
    },
    Some("""SELECT
        (SELECT COUNT(*) FROM documents) AS n_docs,
        (SELECT COUNT(*) FROM embeddings) AS n_embeddings,
        (SELECT COUNT(*) FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
          AS docs_without_embedding,
        (SELECT COUNT(*) FROM embeddings e
          WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
          AS embeddings_without_doc,
        (SELECT COUNT(*) FROM (SELECT doc_id FROM documents
          GROUP BY doc_id HAVING COUNT(*) > 1)) AS duplicate_doc_ids"""),
  )

  // -------------------------------------------------------------- dq02
  // Column completeness/cardinality profile over orders: one row per
  // audited column with null count and exact distinct count. Each
  // column's distinct count is its own two-level aggregation (distinct
  // then count — never a multi-distinct Expand), unioned into the
  // profile table; all passes read the same narrow scan.
  private val dq02 = QueryDef(
    "dq02_column_profile",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
      cols.map { c =>
        o.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"))
          .crossJoin(o.select(c).distinct().agg(count(lit(1)).as("n_distinct")))
          .select(lit(c).as("column_name"), col("n_rows"),
            col("n_null").cast("bigint").as("n_null"), col("n_distinct"))
      }.reduce(_.unionByName(_)).orderBy("column_name")
    },
    Some("""WITH p AS (
        SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders)) AS n_distinct
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
          CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderstatus FROM orders))
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
          CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderpriority FROM orders))
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', COUNT(*),
          CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderdate FROM orders))
        FROM orders)
      SELECT column_name, n_rows, n_null, n_distinct FROM p ORDER BY column_name"""),
  )

  val defs: Seq[QueryDef] = Seq(dq01, dq02)
}

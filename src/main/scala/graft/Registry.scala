package graft

import graft.operators.{AsOf, Corpus, CurationPipeline, Dedup, Drift, Fuzzy, Graph, Ingestion, Layout, Multimodal, Quality, RangeJoin, Relational, Retrieval, Similarity, Skew, SketchWarehouse, Sketches, StateCatalog, StreamingParity, Text, Tokenizer, VectorIndex}

/** Single source of truth for every declared query (SURVEY.md §2).
  * SparkEntry / Verify / Bench all derive from this list.
  */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Text.defs ++ Dedup.defs ++ Similarity.defs ++ Multimodal.defs ++
      AsOf.defs ++ Ingestion.defs ++ Corpus.defs ++ Skew.defs ++ Quality.defs ++
      RangeJoin.defs ++ StreamingParity.defs ++ CurationPipeline.defs ++
      Fuzzy.defs ++ Layout.defs ++ Tokenizer.defs ++ Graph.defs ++ Sketches.defs ++
      Drift.defs ++ VectorIndex.defs ++ Retrieval.defs ++ SketchWarehouse.defs ++
      StateCatalog.defs

  def byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap

  def headline: Seq[QueryDef] = all.filter(_.headline)
}

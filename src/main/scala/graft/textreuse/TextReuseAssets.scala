package graft.textreuse

import org.apache.spark.sql.functions.col

import graft.cluster.Clustering
import graft.core.AssetDag
import graft.defrag.Defrag
import graft.ids.Ids

/** The reference's full textreuse asset dependency graph, registered
  * declaratively on an [[AssetDag]] — the engine-side twin of the
  * Dagster `deps=[...]` wiring (reference:
  * etl_textreuse/assets/README.md:262-280, the mermaid graph):
  *
  * {{{
  * raw_textreuses → textreuse_ids → textreuses → orig_pieces
  *   → orig_textreuses / piece_id_mappings
  *   → defrag_textreuses / defrag_pieces
  *   → adjacency_list → clusters → clustered_defrag_pieces
  * }}}
  *
  * `raw_textreuses` itself is the graph's SOURCE: callers either
  * register it as a no-dep asset (e.g. built via
  * graft.ingest.Ingest.readZippedJsonl) or pre-materialize it in
  * the catalog as an external table — both satisfy the dependency, the
  * way the reference's `zip_file` AssetSpec anchors its graph
  * (raw_textreuses.py:71-79).
  *
  * With this registered, `dag.materialize()` rebuilds exactly the stale
  * suffix of the pipeline: re-dropping the raw input recomputes
  * everything; re-materializing `orig_pieces` alone recomputes only its
  * cone (mappings, defrag tables, adjacency, clusters) and leaves
  * `textreuse_ids`/`textreuses` untouched — the affordable-rerun
  * property a 100 TB pipeline needs.
  */
object TextReuseAssets {

  /** Register the nine derived assets. `clusterMaxIter`/`clusterSeed`
    * parameterize the Chinese Whispers run exactly as the reference's
    * hardcoded `iter` variable does (chinese_label_propagation.py,
    * README.md "clusters" warning).
    */
  def register(dag: AssetDag, clusterSeed: Long = 42L,
      clusterMaxIter: Int = 10): AssetDag = {
    dag.asset("textreuse_ids", Seq("raw_textreuses")) { in =>
      TextReuse.textreuseIds(in("raw_textreuses"))
    }
    dag.asset("textreuses", Seq("raw_textreuses", "textreuse_ids")) { in =>
      TextReuse.textreuses(in("raw_textreuses"), in("textreuse_ids"))
    }
    dag.asset("orig_pieces", Seq("textreuses")) { in =>
      TextReuse.origPieces(in("textreuses"))
    }
    dag.asset("orig_textreuses", Seq("textreuses", "orig_pieces")) { in =>
      TextReuse.origTextreuses(in("textreuses"), in("orig_pieces"))
    }
    dag.asset("piece_id_mappings", Seq("orig_pieces")) { in =>
      Defrag.pieceIdMappings(in("orig_pieces"))
    }
    dag.asset("defrag_textreuses", Seq("orig_textreuses", "piece_id_mappings")) { in =>
      Defrag.defragTextreuses(in("orig_textreuses"), in("piece_id_mappings"))
    }
    dag.asset("defrag_pieces", Seq("orig_pieces", "piece_id_mappings")) { in =>
      Defrag.defragPieces(in("orig_pieces"), in("piece_id_mappings"))
    }
    dag.asset("adjacency_list", Seq("defrag_textreuses")) { in =>
      Clustering.adjacencyList(in("defrag_textreuses"))
    }
    dag.asset("clusters", Seq("adjacency_list")) { in =>
      Clustering.propagate(in("adjacency_list"), seed = clusterSeed,
        maxIter = clusterMaxIter)
    }
    // the reference derives the final piece ↔ cluster mapping as its own
    // asset from the clustering output (downstream_clusters.py:15-29);
    // here propagate already emits (piece_id, cluster_id), so the asset
    // pins the published schema (and re-densifies cluster ids, like the
    // reference's monotonically-increasing cluster_id remap)
    dag.asset("clustered_defrag_pieces", Seq("clusters")) { in =>
      val c = in("clusters").select("piece_id", "cluster_id")
      val dict = Ids.dictionary(c.select(col("cluster_id").as("raw_cluster")),
        "raw_cluster", "dense_cluster")
      c.join(dict, c("cluster_id") === dict("raw_cluster"))
        .select(col("piece_id"), col("dense_cluster").as("cluster_id"))
    }
    dag
  }
}

"""rdf_extraction_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of cwrc/RDF-extraction
(triple extraction → entity linking → canonicalization → graph
materialization) over Parquet tables of multi-turn transcripts, built on
``ray.data.Dataset`` pipelines:

- ``groupby(conv_id)`` + stable ``sort(turn_idx)`` assembles ordered
  conversations on streaming Arrow batches,
- ``map_batches`` stages run rule/pattern-based mention detection and
  predicate templating (vectorized),
- an actor-pool stage holds the alias dictionaries / gazetteer / vocab
  maps for entity linking and canonicalization (deterministic URI
  minting),
- a final hash-partitioned dedup materializes (subj, pred, obj) triples
  to partitioned Parquet with per-partition lineage manifests.

Nothing here is a port: the reference's sequential per-file loop and
module-global mutable state (see SURVEY.md §3-4) are replaced by
Dataset transforms, actor pools, and group-local state.
"""

__version__ = "0.1.0"

"""entity_resolution__ray — a Ray-Data-native entity-resolution / record-linkage engine.

A from-scratch reimplementation of the capabilities of the reference repo
``Sofija17/Entity-Resolution-`` (a single-process pandas/CSV pipeline), re-expressed
as streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

    docs (doc_id, spans)                      # interleaved text+media documents
      → normalize (span flatten, accent strip, tokenize)
      → blocking (token + q-gram MinHash keys, salted groupby shuffles)
      → candidate pairs (canonical, deduped, undirected-collapse keep-max)
      → pairwise features (8 string-similarity kernels, actor pool)
      → pairwise classifier (numpy logistic regression, OOF-F1 threshold)
      → constraints (probability threshold, geo mismatch, token overlap)
      → transitive closure (distributed min-label-propagation connected components)
      → entity clusters (node_id, cluster_id, cluster_size)

plus the large-scale training-data operators a 100 TB pipeline needs: exact and
near deduplication (MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis (language-ID, quality, token counts,
fingerprints) and multimodal column plumbing.

No stage materializes the full dataset on the driver; every wide operation is an
explicit keyed shuffle with documented partitioning, and stage outputs are
partitioned Parquet checkpoints with per-partition lineage manifests.
"""

__version__ = "0.1.0"

"""frontier_engine — a PySpark-native URL-frontier + fetch-scheduler engine.

Re-expresses the semantics of the reference crawler
(Grab-bootcamp-Group5/Food-price-crawler, read-only at /root/reference) as
distributed dataflow over Spark DataFrames:

- ``canon``      URL canonicalization + hashing (xxhash64, JVM-side)
- ``extract``    byte-exact HTML→text + out-link extraction (shared by the
                 engine's pandas UDFs and the pure-Python oracle)
- ``seen``       two-tier URL-seen set: partitioned blocked-Bloom bitmap
                 shards + exact sorted-parquet backstop
- ``frontier``   per-host politeness token-bucket + priority drain
                 (two-phase skew-salted JVM windows)
- ``snapshot``   Iceberg-style snapshot/manifest layer (atomic commit,
                 time travel, per-partition lineage)
- ``crawl``      the epoch driver gluing the above into the crawl loop
- ``oracle``     single-process reference-semantics crawler used by the
                 equivalence tests
- ``transforms`` the reference's scalar-function library re-expressed as
                 Spark column expressions / vectorized pandas UDFs
- ``textops``    large-scale training-data ops: dedup (exact/MinHash/
                 SimHash), language-ID, quality scoring, fingerprinting
- ``ann``        similarity search over embedding columns
- ``index``      token-ngram inverted index (partitioned layout + pruned
                 term lookup)
- ``infer``      batched model inference (mapInPandas, per-worker model
                 singleton)
- ``multimodal`` binary media columns: decode/resize/frame-sample plumbing
- ``streaming``  Structured Streaming ingest surface
- ``geo``        haversine, GeoJSON, geo-hierarchy flatten/nest
"""

__version__ = "0.1.0"

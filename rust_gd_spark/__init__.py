"""rust_gd_spark — PySpark-native Generalized-Deduplication analytics engine.

A from-scratch PySpark implementation of the capabilities of the reference
``junkurihara/rust-gd`` (a Rust Generalized Deduplication library), widened
into a web-scale near-duplicate detection + clustering stack:

* ``rust_gd_spark.gd``        — faithful GD kernel (GF(2^8), Hamming, RS,
  LRU basis dictionary, byte/bit chunk codecs), numpy-vectorized, validated
  against the reference's golden vectors, plus Spark wrappers.
* ``rust_gd_spark.operators`` — scalable dedup operators: MinHash/LSH,
  SimHash, winnowing substring dedup, connected components, exact dedup,
  text stats, embedding similarity.
* ``rust_gd_spark.pipeline``  — the end-to-end transcript dedup pipeline.
* ``rust_gd_spark.fixtures``  — deterministic synthetic transcript corpus.
"""

__version__ = "0.1.0"

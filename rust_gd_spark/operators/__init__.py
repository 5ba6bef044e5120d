"""DataFrame-native dedup / similarity operators.

Each module is one operator family from SURVEY.md §2 Part B:

* ``minhash``    — shingling, MinHash signatures, LSH banding, candidate
                   self-join, exact-Jaccard verification (GEN of the
                   reference's dictionary probe, `src/dict.rs:38-63`).
* ``simhash``    — 64-bit SimHash fingerprints + Hamming-ball banding for
                   near-exact spans (GEN of the reference's
                   noise-in-deviation-positions test, `src/lib.rs:163-175`).
* ``substring``  — winnowing fingerprints for long verbatim substring
                   detection (GEN of the suffix-array plan, SURVEY.md §7 S3).
* ``components`` — large-star/small-star connected components over candidate
                   edges (clustering stage).
* ``embedding``  — cosine top-k / near-dup over embedding columns
                   (brute-force baseline + LSH-bucketed scale path).
* ``exactdup``   — exact duplicate grouping via content hash.
* ``decontam``   — test-set decontamination: exact n-gram containment +
                   fuzzy MinHash whole-document Jaccard vs a benchmark set.
* ``softdedup``  — soft dedup: inverse-cluster-size sampling weights
                   (keep everything, downweight duplicates).
* ``ngrams``     — corpus n-gram audit (top-k grams by document frequency).
* ``suffixarray``— per-conversation suffix-array repetition stats.
* ``boilerplate``— cross-document recurring-line removal.
* ``repetition`` — Gopher-style within-document repetition gates.
* ``sampling``   — deterministic stratified sampling + mixture planning.
* ``packing``    — context-window sequence packing plans.
* ``lm``         — unigram-LM cross-entropy scoring (CCNet-style
                   perplexity quality gate).
* ``dsir``       — DSIR hashed-bigram importance weights toward a
                   target distribution (data selection / resampling).
* ``tfidf``      — per-document TF-IDF top-k keywords.
* ``chunking``   — sliding-window token chunking.
* ``snapshot``   — corpus snapshot diff on the exact-dup content key.
* ``asof``       — backward-inclusive as-of join.
* ``bloom``      — sharded-Bloom cross-corpus membership prefilter.
* ``cdc``        — content-defined chunking + chunk-store dedup.
* ``rangejoin``  — bounded time-range (band) join via bucketized
                   equi-join.
"""

"""Large-scale training-data pipeline operators (beyond the reference).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
near-dup), similarity search (brute-force and bucketed ANN), text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing — all designed partition-parallel for
100 TB: no driver collects, no O(n²) stages without a candidate-pruning
join, built-in expressions in the hot path.
"""

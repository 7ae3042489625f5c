"""[EXT] Large-scale training-data pipeline operators (SURVEY.md §2.13).

Not in the reference's surface — these are the north-star extensions:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (token stats, quality, language-ID, fingerprints), and
multimodal binary-column plumbing.
"""

"""Spark operator implementations.

rules.py     native Column expressions (whole-stage codegen, no Python)
stages.py    Arrow-batched UDF stages: decode / langid / perplexity / scrub
dedup.py     exact, MinHash-LSH, SimHash, n-gram Jaccard dedup operators
similarity.py brute-force + LSH-bucketed cosine top-k over embeddings
multimodal.py binary-payload plumbing (decode/feature-extract UDF shapes)
"""

"""Large-scale training-data pipeline operators.

First-class components alongside the extraction engine: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language-ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

Everything is expressed with native ``pyspark.sql.functions`` / SQL lambda
expressions (JVM-side, whole-stage-codegen'd); the only Python kernel is the
clearly-stubbed multimodal decode.  Each operator has a DuckDB-translatable
formulation so the correctness driver can value-hash-verify it.
"""

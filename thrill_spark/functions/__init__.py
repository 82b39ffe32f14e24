"""Function library + LLM-data-pipeline operators.

Thrill ships no scalar function corpus (SURVEY §2.12) — its UDF surface
is C++ lambdas. Here the corpus is pyspark.sql.functions plus these
domain modules: text analysis, dedup (exact/minhash/simhash/jaccard),
embedding similarity, multimodal column plumbing.
"""

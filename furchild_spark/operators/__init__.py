"""Scale-oriented operators beyond the reference surface.

The reference (a dbt-on-Snowflake ELT project) has no corpus-dedup,
similarity-search, or multimodal operators; these are the LLM-training-data
pipeline extensions, built Spark-first:

- ``asof``       : generic as-of / nearest-timestamp join (the reference's
                   only non-equi join, fct_orders.sql:115-141, generalized).
- ``text``       : tokenization, normalization, text-quality stats,
                   language-ID heuristic, document fingerprinting.
- ``dedup``      : exact (hash-groupBy), MinHash+LSH banded near-dup,
                   SimHash, bucketed n-gram Jaccard — never O(n²) global.
- ``similarity`` : brute-force cosine top-k (baseline) and random-hyperplane
                   LSH bucketing (the 100 TB scale path).
- ``multimodal`` : opaque-binary column plumbing with Arrow-batched
                   ``mapInPandas`` decode stubs.

Everything except the explicitly-marked multimodal decode stubs is pure
Catalyst builtins (no Python UDFs), so plans stay whole-stage-codegen'd.
"""

from . import asof, dedup, multimodal, similarity, text  # noqa: F401

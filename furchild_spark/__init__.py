"""furchild_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `rchauhan89/furchild` dbt
project (a Snowflake ELT pipeline), rebuilt Spark-first.

Layout
------
- ``engine``     : SparkSession factory, model registry / DAG runner,
                   materializers (table / view / incremental merge).
- ``functions``  : Snowflake-semantics shim library (pure Column helpers —
                   no Python UDFs anywhere; everything stays JVM-side).
- ``models``     : the furchild pipeline re-expressed as DataFrame model
                   functions (staging + marts), one function per reference
                   dbt model.
- ``operators``  : scale-oriented extensions: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard), similarity search, text
                   analysis, as-of join, multimodal column plumbing.
- ``sources``    : parquet source resolvers (TPC-H-ish testdata + bronze).
- ``streaming``  : Structured Streaming surface (incremental pipeline
                   analogs: dedup-keep-latest, freshness monitoring).
"""

__version__ = "0.1.0"

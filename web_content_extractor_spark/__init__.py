"""web_content_extractor_spark — a PySpark-native main-content extraction engine.

A from-scratch rebuild of the capabilities of
github:david3xu/web-content-extractor (reference snapshot at
/root/reference) as a distributed, declarative Spark pipeline:

    scan(docs: doc_id, spans[])  --   parquet / Iceberg
      -> mapInPandas(tokenize)   --   Arrow-batched stdlib-HTML tokenizer
      -> native classify         --   when/rlike Column chain (Catalyst)
      -> native assemble         --   sort_array + transform (no shuffle)
      -> write spans + metrics

Everything downstream of the tokenizer is pure Column algebra so the
whole per-document pipeline is shuffle-free and embarrassingly
parallel: throughput scales linearly with executors.
"""

__version__ = "0.1.0"

from web_content_extractor_spark.session import get_spark  # noqa: F401

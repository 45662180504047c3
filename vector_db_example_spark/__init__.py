"""vector_db_example_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference app ``pipi2023/vector_db_example`` (a Milvus-backed RAG QA
system; see SURVEY.md): vector collections, exact + IVF-style approximate
L2 top-k similarity search, multi-strategy retrieval (vector / keyword /
chunk), text preprocessing, batched embedding ingestion, collection
DDL/stats — plus large-scale LLM-data-pipeline operators (deduplication,
similarity joins, multimodal columns, text analysis).

Everything is expressed with the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning and join planning; Python UDFs are used
only where built-in operators genuinely cannot express the semantics (the
embedding model surface), and then only as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

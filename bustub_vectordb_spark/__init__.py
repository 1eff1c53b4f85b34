"""bustub_vectordb_spark — a PySpark-native analytics + vector engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (BusTub-based vector DB, see SURVEY.md), re-expressed
Spark-first: declarative DataFrame plans optimized by Catalyst, batch ANN
index construction as DataFrame jobs, and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout:
  session     — tuned SparkSession builder
  catalog     — table registry + VECTOR(n) type discipline (ref: src/catalog/)
  functions   — scalar/vector/text expression builders (ref: src/execution/expressions/)
  operators   — relational operators beyond raw DataFrame calls (ref: src/execution/)
  index       — IVFFlat / HNSW batch build + probe, index selection rule
                (ref: src/storage/index/, src/optimizer/vector_index_scan.cpp)
  dedup       — exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
  similarity  — brute-force and IVF-accelerated similarity search
  multimodal  — binary media columns: schema + Arrow-batched decode plumbing
  streaming   — event-time windowed aggregation (batch + Structured Streaming)
"""

__version__ = "0.1.0"

"""Spark-side operators.

- pipeline   — the flagship transcripts→extracted pipeline (pandas UDF)
- resume     — committed-keys anti-join resume + lineage + metrics
- dedup      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- similarity — cosine top-k + random-hyperplane LSH over embeddings
- textstats  — quality scoring, language-ID, fingerprints, token stats
- temporal   — as-of join and range join (scalable decompositions)
- multimodal — binary-payload columns + mapInPandas metadata plumbing
- relational — join/agg/window/setop coverage queries (SURVEY.md §2.6)
"""

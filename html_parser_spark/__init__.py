"""PySpark-native main-content extraction engine.

Re-expresses the capabilities of the reference WHATWG-HTML tokenizer
(KorieDrakeChaney/html-parser) as a Spark-first pipeline over transcript
tables: quirk-exact tokenization + boilerplate-stripping extraction inside
Arrow-batched pandas UDFs, plus the dedup / similarity / text-analysis
operators a large-scale training-data pipeline needs.
"""

__version__ = "0.1.0"

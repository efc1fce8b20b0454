"""Pure-Python row functions (no Spark imports): tokenizer, extractor,
entities, text statistics.  Everything here is executor-side code invoked
from Arrow-batched pandas UDFs in html_parser_spark.operators."""

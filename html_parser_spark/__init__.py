"""PySpark-native main-content extraction engine.

Re-expresses the capabilities of the reference WHATWG-HTML tokenizer
(KorieDrakeChaney/html-parser) as a Spark-first pipeline over transcript
tables: quirk-exact tokenization + boilerplate-stripping extraction inside
Arrow-batched pandas UDFs, plus the dedup / similarity / text-analysis
operators a large-scale training-data pipeline needs.
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level conveniences (kept lazy so importing the package
    never drags Spark in for pure-Python consumers of the tokenizer)."""
    lazy = {
        "tokenize": ("html_parser_spark.functions.tokenizer", "tokenize"),
        "extract": ("html_parser_spark.functions.extract", "extract"),
        "parse_html": ("html_parser_spark.functions.treebuilder", "parse_html"),
        "dom_extract": ("html_parser_spark.functions.domextract", "dom_extract"),
        "extract_pdf_text": ("html_parser_spark.functions.pdftext", "extract_pdf_text"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)

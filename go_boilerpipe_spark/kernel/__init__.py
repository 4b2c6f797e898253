"""Pure-Python extraction kernel (zero Spark dependencies).

Runs inside the Arrow-batched extraction UDF; unit-testable against the
reference golden corpus without a SparkSession.
"""

from .document import extract_article, extract_debug, go_escape_string, parse_document  # noqa: F401

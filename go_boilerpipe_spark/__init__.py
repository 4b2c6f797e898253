"""go_boilerpipe_spark: PySpark-native boilerplate-removal analytics engine.

A from-scratch reimplementation of the capabilities of jlubawy/go-boilerpipe
(reference at /root/reference, read-only) designed for Spark execution at
Common-Crawl scale. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

"""kneaddata_spark — a PySpark-native quality-filter engine.

Brand-new implementation (NOT a port) of the query/data-processing
capabilities of biobakery/kneaddata (reference read-only at
/root/reference), re-expressed Spark-first over an audio-clip +
transcript table per BASELINE.json, plus the relational operator
surface catalogued in SURVEY.md §2.
"""

__version__ = "0.1.0"

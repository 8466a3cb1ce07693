"""mapreduce_wordcounter_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``ajitm722/MapReduce-WordCounter`` (a Go, single-process
MapReduce word counter — see SURVEY.md), extended with the relational,
text-analysis, deduplication, similarity-search, multimodal and
streaming operators a large-scale training-data pipeline needs.

Design stance (SURVEY.md §7): the DataFrame/SQL API is the only user
surface; Catalyst/Tungsten do the physical planning; Pandas UDFs are
used only where built-in operators cannot express the semantics.
"""

from mapreduce_wordcounter_spark.session import get_spark
from mapreduce_wordcounter_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]
